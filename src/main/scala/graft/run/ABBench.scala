package graft.run

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Paired A/B for flagship pipeline variants: alternates the variants
  * run-by-run inside ONE JVM (shared JIT, page cache, host drift), so the
  * single-box noise that swamps back-to-back whole-process comparisons
  * cancels out. Reports per-variant runs + median of the steady-state runs
  * (all but the first pair, which pays JIT warm-up).
  *
  *   SPARK_GRAFT_BENCH_CONVS / _DIR / _REPEATS / SPARK_GRAFT_AB_CPUS
  */
object ABBench {

  private def session(cpus: Int): SparkSession = {
    val b = graft.core.GraftSession.builder(s"local[$cpus]", 4 * cpus)
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
    val tmpfs = new java.io.File("/dev/shm")
    val withDirs =
      if (tmpfs.isDirectory && tmpfs.canWrite)
        b.config("spark.local.dir", "/dev/shm/spark-local")
      else b
    val s = withDirs.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val benchBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_DIR", "/root/repo/target/bench")
    val nConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "80000").toLong
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "5").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_AB_CPUS", "8").toInt

    var spark = session(cpus)
    val (tPath, sPath) = Flagship.ensureData(spark, benchBase, nConvs)
    spark.stop()

    val variants: Seq[(String, (DataFrame, DataFrame) => DataFrame)] = Seq(
      "slim" -> Flagship.pipeline,
      "convOnly" -> ((t, s) => Flagship.pipelineImpl(t, s,
        encodeConv = true, encodeDict = false)),
      "dictOnly" -> ((t, s) => Flagship.pipelineImpl(t, s,
        encodeConv = false, encodeDict = true)),
      "unencoded" -> Flagship.pipelineUnencoded)
    val results = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 1 to repeats; (name, fn) <- variants) {
      spark = session(cpus)
      val out = s"$benchBase/ab_out_${name}_$r"
      val (_, _, tps) = Flagship.run(spark, tPath, sPath, out, pipe = fn)
      scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      spark.stop()
      results(name) = results(name) :+ tps
      println(s"""{"variant":"$name","run":$r,"tps":${tps.toLong}}""")
    }
    variants.foreach { case (name, _) =>
      // at repeats=1 there is no steady-state run to drop into — fall back
      // to the single (JIT-cold) run rather than indexing an empty vector
      val steady = {
        val s = results(name).drop(1).sorted
        if (s.nonEmpty) s else results(name).sorted
      }
      val med = steady(steady.size / 2)
      println(s"""{"variant":"$name","runs":[${results(name).map(_.toLong).mkString(",")}],""" +
        s""""steady_median":${med.toLong},"best":${results(name).max.toLong}}""")
    }
  }
}
