package graft.run

import org.apache.spark.sql.functions._

/** Dev profiler: break the flagship into phases and time each at the
  * current SPARK_GRAFT_CPUS level.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val base = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/target/bench")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "400000").toLong
    val spark = graft.core.GraftSession.local(cpus)
    val (tPath, sPath) = Flagship.ensureData(spark, base, nConvs)

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.currentTimeMillis()
      f
      println(f"[profile cpus=$cpus] $name: ${(System.currentTimeMillis() - t0) / 1000.0}%.2f s")
    }

    val t = spark.read.parquet(tPath)
    val s = spark.read.parquet(sPath)
    time("scan only")(t.write.format("noop").mode("overwrite").save())
    val pipe = Flagship.pipeline(t, s)
    time("pipeline->noop (1st, incl codegen)")(
      pipe.write.format("noop").mode("overwrite").save())
    time("pipeline->noop (2nd, warm)")(
      pipe.write.format("noop").mode("overwrite").save())
    time("pipeline->parquet flat")(
      pipe.write.mode("overwrite").parquet(s"$base/prof_flat"))
    time("pipeline->parquet partitionBy bucket")(
      pipe.withColumn("bucket", pmod(xxhash64(col("conv_id")), lit(32)))
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$base/prof_part"))
    time("count read-back")(
      println("  rows=" + spark.read.parquet(s"$base/prof_part")
        .groupBy(col("bucket")).count().collect().map(_.getLong(1)).sum))
    spark.stop()
  }
}
