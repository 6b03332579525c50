package graft.run

/** Dev experiment: time queries under ad-hoc conf overrides
  * ("k=v,k=v" in arg 2) to attribute fixed overhead (AQE stage jobs,
  * partition counts) before touching GraftSession defaults.
  * Usage: R06Conf <q1,q2,...> <confs|-> [repeats]
  */
object R06Conf {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val confs = if (args(1) == "-") Nil
      else args(1).split(",").map { kv =>
        val Array(k, v) = kv.split("=", 2); (k, v)
      }.toSeq
    val repeats = if (args.length > 2) args(2).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val b = graft.core.GraftSession.builder(s"local[$cpus]", 4 * cpus)
    val spark = confs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.ensureCheckpointDir(spark)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try force(fn(spark, sfDir)) catch { case t: Throwable =>
        System.err.println(s"[r06conf] $name warm: ${t.getMessage}") }
      graft.text.Dedup.releaseCache()
      val dts = (1 to repeats).map { _ =>
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir)) catch { case _: Throwable => }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.text.Dedup.releaseCache()
        dt
      }
      println(f"[r06conf] $name min=${dts.min}%.3f all=${dts.map(d => f"$d%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
