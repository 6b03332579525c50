package graft.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ingest-rate anomaly detection — flag time buckets whose event volume
  * spikes against their own trailing history (a crawler gone rogue, a
  * duplicated feed, a log-replay accident: the incidents a 100 TB/day
  * ingest notices FIRST as a rate anomaly, long before content gates).
  *
  * Per (source, bucket): a rolling z-score of the bucket's count against
  * the previous `window` observed buckets. The trailing frame EXCLUDES the
  * current bucket, so a spike cannot suppress itself by inflating its own
  * baseline.
  *
  * Shape (the 100 TB story): one partial-agg groupBy collapses events to
  * per-bucket counts (the only pass over the raw data), then the window
  * runs over the tiny (source, bucket) table. ROWS frames over observed
  * buckets: gaps in the series are skipped, not zero-filled — pre-densify
  * upstream if absence itself should alarm.
  *
  * Determinism doctrine: the window aggregates are LONG sums (count, sum,
  * sum of squares) — exact integers, immune to the engines' different
  * sliding-window summation orders (segment tree vs running pairs); mean /
  * std / z derive from those exact sums in one binary64 expression with
  * identical op order in the oracle SQL.
  */
object Anomaly {

  /** @param bucket   `date_trunc` unit: "day", "hour", ...
    * @param window   trailing history length in observed buckets
    * @param minHist  minimum observed history before scoring (else z null)
    * @param zThreshold spike flag cut (sample-std z-score)
    */
  def rateSpikes(
      df: DataFrame,
      tsCol: String,
      groupCol: String,
      bucket: String = "day",
      window: Int = 7,
      minHist: Int = 3,
      zThreshold: Double = 3.0): DataFrame = {
    require(window >= 2 && minHist >= 2 && minHist <= window,
      s"need 2 <= minHist <= window, got minHist=$minHist window=$window")
    val counts = df
      .groupBy(col(groupCol),
        date_trunc(bucket, col(tsCol)).as("bucket_ts"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("bucket_ts"))
      .rowsBetween(-window, -1)
    // sum of squares in DECIMAL, not LONG: cnt*cnt overflows int64 past
    // ~3.04e9 events/bucket — a plausible hot source at ingest scale (ANSI
    // would throw; non-ANSI would wrap varN negative and silently null z
    // exactly where spikes matter). Decimal sums stay exact and order-free.
    val cntDec = col("cnt").cast("decimal(19,0)")
    val withHist = counts
      .withColumn("__n", count(col("cnt")).over(w))
      .withColumn("__s", sum(col("cnt")).over(w))
      .withColumn("__sq", sum(cntDec * cntDec).over(w))
    val n = col("__n").cast("double")
    val s = col("__s").cast("double")
    val sq = col("__sq").cast("double")
    // sample variance from exact integer sums: (n*sq - s^2) / (n*(n-1))
    val varN = n * sq - s * s
    val z = (col("cnt").cast("double") - s / n) /
      sqrt(varN / (n * (n - 1.0)))
    withHist
      .withColumn("z",
        when(col("__n") >= minHist && varN > 0.0, round(z, 6)))
      .withColumn("spike", coalesce(col("z") >= zThreshold, lit(false)))
      .select(col(groupCol), col("bucket_ts"), col("cnt"), col("z"),
        col("spike"))
  }
}
