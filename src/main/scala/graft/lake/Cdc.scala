package graft.lake

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — change-data-capture between two versions of a table
  * (two [[IcebergLite]] snapshots, two ingest days, a table before/after a
  * backfill): which rows were added, removed, or changed.
  *
  * The incremental-pipeline complement to [[graft.text.Dedup
  * .dedupIncremental]]: incremental dedup decides what NEW data to admit;
  * the snapshot diff tells downstream consumers what a table transition
  * actually did — the audit record a resumable 100 TB pipeline keeps per
  * checkpoint.
  *
  * Shape (the 100 TB story): each side reduces to `(key, digest)` in a
  * pure projection (no wide rows through the shuffle), then ONE full-outer
  * sort-merge join on the key decides the status per row. No window, no
  * groupBy, no driver state; AQE handles skewed keys like any equi join.
  *
  * Digest: md5 over the compare columns joined with a unit separator,
  * nulls encoded as a sentinel distinct from any cast value ([[rowDigest]])
  * — the same cross-engine md5 doctrine the curation keeper uses, so the
  * diff itself is oracle-checkable in any SQL engine.
  */
object Cdc {

  /** Cross-engine row digest of `cols` (order matters): md5 of the
    * unit-separator join with nulls as `chr(0)`. Collision-safe against
    * value-boundary ambiguity because chr(31) cannot appear in a numeric
    * cast and separates every field.
    */
  def rowDigest(cols: Seq[Column]): Column =
    md5(concat_ws("\u001f",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

  /** Diff two table versions on `keyCols` identity, comparing
    * `compareCols` content. Returns one row per key present in either
    * side: `keyCols..., status` with status in
    * `added` (new only) / `removed` (old only) / `changed` (both, digest
    * differs); unchanged rows are dropped unless `includeUnchanged`.
    *
    * Duplicate keys within a side violate the snapshot contract and make
    * `changed` ill-defined — dedup first (the IcebergLite sink already
    * guarantees key uniqueness per snapshot).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      compareCols: Seq[String],
      includeUnchanged: Boolean = false): DataFrame = {
    require(keyCols.nonEmpty, "keyCols must not be empty")
    require(compareCols.nonEmpty, "compareCols must not be empty")
    // null-SAFE key equality: a null-keyed row present identically on both
    // sides is one unchanged row, not a spurious removed+added pair. The
    // digests are never null (md5 of coalesced fields), so side presence
    // is exactly digest nullness after the full outer join — no flag
    // columns through the shuffle.
    val o = oldDf.select(keyCols.map(c => col(c).as(s"__ok_$c")) :+
      rowDigest(compareCols.map(col)).as("__od"): _*)
    val n = newDf.select(keyCols.map(c => col(c).as(s"__nk_$c")) :+
      rowDigest(compareCols.map(col)).as("__nd"): _*)
    val cond = keyCols.map(c => col(s"__ok_$c") <=> col(s"__nk_$c"))
      .reduce(_ && _)
    val joined = o.join(n, cond, "full_outer")
      .withColumn("status",
        when(col("__od").isNull, "added")
          .when(col("__nd").isNull, "removed")
          .when(col("__od") =!= col("__nd"), "changed")
          .otherwise("unchanged"))
    (if (includeUnchanged) joined
     else joined.where(col("status") =!= "unchanged"))
      .select(keyCols.map(c =>
        coalesce(col(s"__ok_$c"), col(s"__nk_$c")).as(c)) :+ col("status"): _*)
  }
}
