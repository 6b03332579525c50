package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.text.TextHash

/** Count–min sketch: fixed-size approximate frequency counting for skew
  * diagnostics (Cormode & Muthukrishnan 2005).
  *
  * The engine's own salting/skew helpers ([[graft.temporal.Skew]], the
  * AQE-skew as-of variants) need to KNOW which keys are heavy before they
  * can act; at 10^12 turns an exact `groupBy(key).count` materializes a
  * group per conversation — the CMS answers "is this key over threshold?"
  * from a `depth × width` table of counters that is CONSTANT-size in the
  * data: the shuffle carries at most `depth·width` partial counters per map
  * task regardless of row count or key cardinality.
  *
  * Estimates are deterministic and cross-engine reproducible: row `d`'s
  * counter index is `polyHash(key || ":cms" || d) mod width` — the same
  * mod-2^32 polynomial fold the dedup suite verifies in DuckDB — so the
  * sketch, the point estimates, and the heavy-hitter verdicts are all
  * oracle-checkable cell-exactly. Classic CMS guarantee: estimates never
  * undercount (`est >= exact`, SketchSpec pins it), and overcount by more
  * than `2n/width` with probability at most `2^-depth` under pairwise-
  * independent hashing.
  */
object Sketch {

  /** Counter index of `key` in sketch row `d` (0-based), `width` columns. */
  def cell(key: Column, d: Int, width: Int): Column =
    pmod(TextHash.polyHash(concat(key, lit(s":cms$d"))), lit(width.toLong))

  /** Build the sketch: one row per non-empty counter, `(d, cell, cnt)`.
    *
    * One explode (× depth) + one aggregation; map-side combine bounds the
    * shuffle at `depth·width` partials per task, so sketching 100 TB
    * shuffles kilobytes.
    */
  def countMin(df: DataFrame, key: Column, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    df.select(posexplode(
        array((0 until depth).map(d => cell(key, d, width)): _*))
        .as(Seq("d", "cell")))
      .groupBy(col("d"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each row of `keys`: the minimum of its
    * `depth` counters (absent counter = 0). The sketch is broadcast — at
    * most `depth·width` rows — so estimation is a map-side join however
    * large the key set.
    *
    * @param hashKey the string expression that was sketched (must reference
    *                `keys` columns and match the `countMin` key expression)
    */
  def estimate(
      sketch: DataFrame,
      keys: DataFrame,
      hashKey: Column,
      depth: Int,
      width: Int): DataFrame = {
    val sk = sketch.select(
      col("d").as("__d"), col("cell").as("__cell"), col("cnt").as("__cnt"))
    keys
      .select(col("*"), posexplode(
        array((0 until depth).map(d => cell(hashKey, d, width)): _*))
        .as(Seq("__d", "__cell")))
      .join(broadcast(sk), Seq("__d", "__cell"), "left")
      .groupBy(keys.columns.map(col): _*)
      .agg(min(coalesce(col("__cnt"), lit(0L))).as("est"))
  }

  /** Sketch + estimate + threshold in one call: the skew-diagnostic shape.
    * `keys` defaults to the distinct keys of `df` itself (fine when a later
    * exact pass is the alternative being avoided is per-ROW, not per-key;
    * pass an explicit candidate frame to stay sublinear in key cardinality).
    */
  def heavyHitters(
      df: DataFrame,
      key: Column,
      depth: Int,
      width: Int,
      threshold: Long): DataFrame = {
    val sk = countMin(df, key.cast("string"), depth, width)
    val keys = df.select(key.as("key")).distinct()
    estimate(sk, keys, col("key").cast("string"), depth, width)
      .withColumn("heavy", col("est") >= threshold)
  }
}
