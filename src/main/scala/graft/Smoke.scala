package graft

/** t1-style smoke: run the flagship entry and print its row count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = false)
    println(s"[smoke] entry rows=${df.count()}")
    spark.stop()
  }
}
