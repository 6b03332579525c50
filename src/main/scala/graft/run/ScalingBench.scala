package graft.run

import org.apache.spark.sql.SparkSession

/** Scaling-efficiency evidence for the north rule: run the IDENTICAL
  * flagship job on the IDENTICAL input at two parallelism levels (local[8]
  * vs local[32] — the sandbox stand-in for N vs 4N executors) and report
  * turns/sec at both plus efficiency = T32 / (4·T8).
  *
  * Prints one JSON line; results are recorded in BASELINE.md §4.
  */
object ScalingBench {

  /** Bench session: like GraftSession.local plus single-box-only knobs —
    * shuffle compression off (pure CPU overhead when shuffle files live on
    * tmpfs; on a real cluster the network makes compression a win and it
    * stays on) and local dirs on tmpfs when available (removes the shared
    * virtio disk from the measurement; a real 4N-executor cluster brings 4N
    * disks, which is the scaling the rule targets).
    */
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
    val repeats = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPEATS", "2").toInt
    val lo = sys.env.getOrElse("SPARK_GRAFT_SCALE_LO", "8").toInt
    val hi = sys.env.getOrElse("SPARK_GRAFT_SCALE_HI", "32").toInt

    // generate input once (at hi parallelism; rows are parallelism-invariant)
    var spark = session(hi)
    val (tPath, sPath) = Flagship.ensureData(spark, benchBase, nConvs)
    spark.stop()

    // Interleave the two levels round-robin so JIT warm-up, page-cache and
    // host drift hit both equally; outputs are deleted between repeats;
    // best (steady-state) run per level is reported.
    val results = scala.collection.mutable.Map[Int, Vector[(Long, Double)]]()
      .withDefaultValue(Vector.empty)
    // SPARK_GRAFT_SCALE_PIPE=compute swaps in the compute-heavy pipeline
    // (per-row SimHash at the scan) — the CPU-bound control for the
    // shared-memory-bus adjudication of the 8→32 level pair
    val pipe: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
      if (sys.env.get("SPARK_GRAFT_SCALE_PIPE").contains("compute"))
        Flagship.pipelineCompute
      else Flagship.pipeline
    for (r <- 1 to repeats; cpus <- Seq(lo, hi)) {
      spark = session(cpus)
      val out = s"$benchBase/scale_out_c${cpus}_$r"
      val (rows, _, tps) = Flagship.run(spark, tPath, sPath, out, pipe = pipe)
      scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      spark.stop()
      results(cpus) = results(cpus) :+ (rows, tps)
    }
    Seq(lo, hi).foreach { c =>
      println(s"""{"level":$c,"runs_tps":[${results(c).map(_._2.toLong).mkString(",")}]}""")
    }
    val (rowsLo, tpsLo) = (results(lo).head._1, results(lo).map(_._2).max)
    val (rowsHi, tpsHi) = (results(hi).head._1, results(hi).map(_._2).max)
    require(rowsLo == rowsHi, s"row drift across parallelism: $rowsLo vs $rowsHi")
    val eff = tpsHi / (tpsLo * (hi.toDouble / lo))
    println(
      s"""{"metric":"scaling efficiency local[$lo] -> local[$hi]",""" +
        s""""rows":$rowsLo,"turns_per_sec_$lo":${tpsLo.toLong},""" +
        s""""turns_per_sec_$hi":${tpsHi.toLong},""" +
        s""""efficiency":${f"$eff%.3f"},"target":0.8}""")
  }
}
