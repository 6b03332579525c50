package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Transcripts
import graft.lake.IcebergLite
import graft.temporal.{AsOf, Backfill, Descriptors, Sessionize}

/** The north-star workload: the SURVEY §7.2 minimum slice run end-to-end at
  * benchmark scale — backward as-of join of feature snapshots to every turn,
  * lag/rolling descriptors, gap sessionization, per-conversation backfill,
  * written to an Iceberg-lite table with lineage + metrics.
  *
  * Input is synthesized deterministically (pure hash of indices), so the
  * exact same rows exist at any parallelism level — the requirement for the
  * N vs 4N scaling-efficiency evidence.
  */
object Flagship {

  /** Synthesize + persist the benchmark input once (idempotent). */
  def ensureData(spark: SparkSession, base: String, nConvs: Long): (String, String) = {
    val tPath = s"$base/transcripts_$nConvs"
    val sPath = s"$base/snapshots_$nConvs"
    // BOTH writes must have completed: a run killed between them would leave
    // transcripts/_SUCCESS satisfied with snapshots missing/partial
    def done(p: String) = new java.io.File(p + "/_SUCCESS").exists()
    if (!done(tPath) || !done(sPath)) {
      val t = Transcripts.synthesize(spark, nConvs)
      t.write.mode("overwrite").parquet(tPath)
      Transcripts.snapshots(spark.read.parquet(tPath))
        .write.mode("overwrite").parquet(sPath)
    }
    (tPath, sPath)
  }

  /** The feature pipeline (no action).
    *
    * Shuffle-volume discipline — every byte of every row rides the as-of
    * union shuffle AND the shared window sort, so the wide columns are
    * slimmed BEFORE it and restored after the last window:
    *
    *  - `text` (the corpus) is reduced to `text_len` at the scan — at
    *    100 TB this is the difference between shuffling feature rows and
    *    shuffling the corpus;
    *  - `conv_id` ("c%010d") is parsed to a long: 24 → 8 row bytes, and the
    *    sort's 8-byte prefix comparator becomes decisive — as strings every
    *    conv_id shares the "c0000000" prefix, so the radix/prefix fast path
    *    never separates keys and each comparison falls back to a full UTF8
    *    memcmp;
    *  - `role`/`tool` are dictionary-encoded to their 1-based index
    *    (avg ~18 bytes → 8; UnsafeRow gives every numeric field a flat
    *    8-byte slot, strings cost 8 + padded payload).
    *
    * Decoding (`format_string` / `element_at`) is an exact inverse, applied
    * per output row after the final window — the output is value-identical
    * to the unencoded plan. This pipeline assumes the Transcripts contract:
    * conv_id formatted c%010d, role/tool drawn from `Transcripts.roles` /
    * `Transcripts.tools` (unknown values fail loudly at decode under ANSI).
    */
  def pipeline(t: DataFrame, snaps: DataFrame): DataFrame = {
    val rolesArr = array(Transcripts.roles.map(lit): _*)
    val toolsArr = array(Transcripts.tools.map(lit): _*)
    val toolRole = Transcripts.roles.indexOf("tool") + 1
    val narrow = t
      .withColumn("text_len", length(col("text")).cast("double"))
      .withColumn("__conv", substring(col("conv_id"), 2, 19).cast("long"))
      .withColumn("__role", array_position(rolesArr, col("role")).cast("byte"))
      .withColumn("__tool", array_position(toolsArr, col("tool")).cast("byte"))
      .drop("text", "conv_id", "role", "tool")
    val snapsN = snaps
      .withColumn("__conv", substring(col("conv_id"), 2, 19).cast("long"))
      .drop("conv_id")
    // keepOrder + leftTie=turn_idx: every window below orders by the as-of
    // join's own sort keys, so the whole pipeline runs on ONE sort
    val joined = AsOf.asofJoin(
      narrow, snapsN,
      key = "__conv", leftTs = "ts", rightTs = "snapshot_ts",
      tiebreak = "snap_turn_idx", payload = Seq("f_vec"),
      leftTie = Some("turn_idx"), keepOrder = true)
    val ord = AsOf.orderCols
    val sessioned = Sessionize.byGap(joined, "__conv", "ts", ord, 1800L)
    val filled = Backfill.lastNonNull(sessioned, "__conv", ord, Seq("__tool"))
    Descriptors.pack(
      filled, "__conv", ord,
      col("text_len"), lags = Seq(1, 2),
      rollingRows = 10, rollingPred = col("__role") === lit(toolRole))
      // NOT format_string: FormatString routes through java.util.Formatter
      // per row (format parsing + allocations); lpad/concat is a plain byte
      // copy. (%010d pads to AT LEAST 10 while lpad truncates — the
      // conditional keeps >10^10 ids exact.)
      .withColumn("conv_id", {
        val s = col("__conv").cast("string")
        concat(lit("c"), when(length(s) < 10, lpad(s, 10, "0")).otherwise(s))
      })
      // the isNotNull guards are load-bearing: Spark 4.1.2's element_at
      // treats a NULL index as -1 (returns the LAST element, not null) once
      // the column has been through the shuffle — caught by TemporalSpec's
      // round-trip test (null tool decoded as "browse")
      .withColumn("role", when(col("__role").isNotNull,
        element_at(rolesArr, col("__role").cast("int"))))
      .withColumn("tool", when(col("__tool").isNotNull,
        element_at(toolsArr, col("__tool").cast("int"))))
      .withColumn("tool_filled", when(col("__tool_filled").isNotNull,
        element_at(toolsArr, col("__tool_filled").cast("int"))))
      .drop("__conv", "__role", "__tool", "__tool_filled")
      .drop(ord: _*)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("ts"), col("text_len"), col("f_vec"), col("session_idx"),
        col("tool_filled"), col("lag_1"), col("lag_2"),
        col("rolling_cnt_10"), col("rolling_sum_10"))
  }

  /** Run the full job including the Iceberg-lite write; returns (rows,
    * elapsedMs, turns/sec).
    */
  def run(spark: SparkSession, tPath: String, sPath: String, outRoot: String,
      nBuckets: Int = 32): (Long, Long, Double) = {
    val t0 = System.currentTimeMillis()
    val out = pipeline(spark.read.parquet(tPath), spark.read.parquet(sPath))
    // bucket via Spark's own murmur3 hash: when shuffle.partitions ==
    // nBuckets the rows arrive at the writer ALREADY grouped by bucket
    // (HashPartitioning uses the same pmod(hash, n)), so the dynamic
    // partitionBy write emits one file per task instead of tasks×buckets.
    val snap = IcebergLite.writeTable(
      out, outRoot, hash(col("conv_id")), nBuckets,
      s"flagship asof+window pipeline over $tPath")
    val rows = snap.partitions.values.map(_.rows).sum
    val ms = System.currentTimeMillis() - t0
    val tps = rows * 1000.0 / math.max(ms, 1)
    IcebergLite.appendMetrics(outRoot,
      s"""{"job":"flagship","rows":$rows,"durationMs":$ms,"turnsPerSec":${tps.toLong}}""")
    (rows, ms, tps)
  }
}
