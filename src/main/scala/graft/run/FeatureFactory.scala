package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Transcripts
import graft.lake.{CheckpointedJob, IcebergLite}

/** Production-shaped entry point (spark-submit main): the point-in-time
  * feature factory run **checkpointed per Iceberg partition**.
  *
  * Input and output are Iceberg-lite tables bucketed by
  * `pmod(hash(conv_id), nBuckets)` — conversations never straddle buckets,
  * so each bucket is an independent unit of work. Each bucket job reads ONLY
  * its partition directory (partition pruning by path), runs the full
  * as-of + window pipeline, writes its output partition, and commits a
  * manifest entry + metrics line. A killed run resumes at the first
  * uncommitted bucket and recomputes nothing (LakeSpec proves the
  * kill/resume contract; FactorySpec proves output equivalence with the
  * single-job plan).
  *
  * Usage: FeatureFactory <workRoot> [nConvs] [nBuckets]
  */
object FeatureFactory {

  /** Bucket both input tables as Iceberg-lite (idempotent). */
  def ensureBucketedInput(
      spark: SparkSession, workRoot: String, nConvs: Long, nBuckets: Int
  ): (String, String) = {
    val tRoot = s"$workRoot/transcripts"
    val sRoot = s"$workRoot/snapshots"
    if (IcebergLite.readSnapshot(tRoot).isEmpty) {
      val t = Transcripts.synthesize(spark, nConvs)
      IcebergLite.writeTable(t, tRoot, hash(col("conv_id")), nBuckets,
        s"synthesize nConvs=$nConvs")
      IcebergLite.writeTable(
        Transcripts.snapshots(IcebergLite.readTable(spark, tRoot)),
        sRoot, hash(col("conv_id")), nBuckets, "snapshots from transcripts")
    }
    (tRoot, sRoot)
  }

  /** Run (or resume) the factory; returns buckets processed this run. */
  def run(
      spark: SparkSession, tRoot: String, sRoot: String, outRoot: String,
      nBuckets: Int,
      failAtBucket: Option[Int] = None // test hook: simulate a kill
  ): Int = {
    val job = new CheckpointedJob(outRoot, "feature_factory")
    var processed = 0
    for (b <- 0 until nBuckets) {
      val did = job.runBucket(b) {
        if (failAtBucket.contains(b))
          throw new RuntimeException(s"simulated kill at bucket $b")
        val t = spark.read.parquet(s"$tRoot/data/bucket=$b")
        val s = spark.read.parquet(s"$sRoot/data/bucket=$b")
        val out = Flagship.pipeline(t, s)
        out.write.mode("overwrite").parquet(s"$outRoot/data/bucket=$b")
        IcebergLite.footerCounts(s"$outRoot/data").getOrElse(b, 0L)
      }
      if (did) processed += 1
    }
    processed
  }

  def main(args: Array[String]): Unit = {
    val workRoot = if (args.nonEmpty) args(0) else "/root/repo/target/factory"
    val nConvs = if (args.length > 1) args(1).toLong else 10000L
    val nBuckets = if (args.length > 2) args(2).toInt else 16
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val (tRoot, sRoot) = ensureBucketedInput(spark, workRoot, nConvs, nBuckets)
    val t0 = System.currentTimeMillis()
    val processed = run(spark, tRoot, sRoot, s"$workRoot/features", nBuckets)
    val snap = IcebergLite.readSnapshot(s"$workRoot/features").get
    val rows = snap.partitions.values.map(_.rows).sum
    val sec = (System.currentTimeMillis() - t0) / 1000.0
    println(s"""{"job":"feature_factory","buckets_done_this_run":$processed,""" +
      s""""total_buckets":${snap.partitions.size},"rows":$rows,""" +
      s""""sec":$sec,"version":${snap.version}}""")
    spark.stop()
  }
}
