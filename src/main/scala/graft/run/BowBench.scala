package graft.run

import org.apache.spark.sql.functions._

/** Dev tool: interleaved native-vs-declarative hashedBow timing in ONE JVM
  * (back-to-back processes drift ±30% on this box — the ABBench protocol).
  * Usage: BowBench [sfDir] [dim] [repeats]
  */
object BowBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dim = if (args.length > 1) args(1).toInt else 256
    val repeats = if (args.length > 2) args(2).toInt else 3
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(tag: String, c: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      docs.select(c.as("v")).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[bowbench] $tag dim=$dim: $s%.2f s")
      s
    }
    for (_ <- 1 to repeats) {
      time("native     ", graft.text.TextHash.hashedBow(col("text"), dim))
      time("declarative", graft.text.TextHash.hashedBowDeclarative(col("text"), dim))
    }
    spark.stop()
  }
}
