package graft.run

/** Round-6 optimization harness: time a set of SparkEntry queries with the
  * EXACT bench methodology (noop sink, untimed warm pass, min-of-N timed
  * repeats, Dedup cache released between repeats) and optionally dump each
  * query's `explain("formatted")` to a file for the plan-diff record.
  *
  * Usage: R06Profile <out.json> <planDir|-> <q1,q2,...|all> [repeats]
  * Separate from the FROZEN `Bench` main — this is the guide §1.4 isolation
  * harness, not the driver contract.
  */
object R06Profile {
  def main(args: Array[String]): Unit = {
    val outPath = args(0)
    val planDir = args(1)
    val names =
      if (args(2) == "all") graft.SparkEntry.queries.keys.toSeq.sorted
      else args(2).split(",").toSeq
    val repeats = if (args.length > 3) args(3).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = names.map { name =>
      val fn = graft.SparkEntry.queries(name)
      spark.sparkContext.setJobDescription(s"r06profile: $name warm")
      try force(fn(spark, sfDir)) catch { case t: Throwable =>
        System.err.println(s"[r06] $name warm: ${t.getMessage}") }
      graft.text.Dedup.releaseCache()
      val dts = (1 to repeats).map { i =>
        spark.sparkContext.setJobDescription(s"r06profile: $name run $i")
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir)) catch { case t: Throwable =>
          System.err.println(s"[r06] $name run $i: ${t.getMessage}") }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.text.Dedup.releaseCache()
        dt
      }
      if (planDir != "-") {
        val plan = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        graft.text.Dedup.releaseCache()
        val dir = java.nio.file.Paths.get(planDir)
        java.nio.file.Files.createDirectories(dir)
        java.nio.file.Files.write(dir.resolve(s"$name.txt"),
          plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
      println(f"[r06] $name min=${dts.min}%.3f all=${dts.map(d => f"$d%.3f").mkString(",")}")
      name -> dts
    }
    val json = results.map { case (n, dts) =>
      "\"" + n + "\":" + dts.map(d => f"$d%.3f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
