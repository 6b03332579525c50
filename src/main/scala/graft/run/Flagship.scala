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
    * Shuffle-volume discipline: the raw `text` column is by far the widest
    * field and the downstream features only need its LENGTH — so `text_len`
    * is computed at the scan and `text` is dropped BEFORE the as-of union
    * shuffle. At 100 TB this is the difference between shuffling feature
    * rows and shuffling the corpus.
    */
  def pipeline(t: DataFrame, snaps: DataFrame): DataFrame = {
    val narrow = t.withColumn("text_len", length(col("text")).cast("double"))
      .drop("text")
    // keepOrder + leftTie=turn_idx: every window below orders by the as-of
    // join's own sort keys, so the whole pipeline runs on ONE sort
    val joined = AsOf.asofJoin(
      narrow, snaps,
      key = "conv_id", leftTs = "ts", rightTs = "snapshot_ts",
      tiebreak = "snap_turn_idx", payload = Seq("f_vec"),
      leftTie = Some("turn_idx"), keepOrder = true)
    val ord = AsOf.orderCols
    val sessioned = Sessionize.byGap(joined, "conv_id", "ts", ord, 1800L)
    val filled = Backfill.lastNonNull(sessioned, "conv_id", ord, Seq("tool"))
    Descriptors.pack(
      filled, "conv_id", ord,
      col("text_len"), lags = Seq(1, 2),
      rollingRows = 10, rollingPred = col("role") === "tool")
      .drop(ord: _*)
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
