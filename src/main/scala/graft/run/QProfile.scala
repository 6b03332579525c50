package graft.run

/** Dev tool: run one SparkEntry query repeatedly and print timings + plan.
  * Usage: QProfile <queryName> [sfDir] [repeats]
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val fn = graft.SparkEntry.queries(name)
    for (i <- 1 to repeats) {
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"[qprofile] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (sys.env.contains("SPARK_GRAFT_EXPLAIN"))
      fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
