package graft.run

import org.apache.spark.sql.functions._

/** Symbolic search at the reference's demonstrated PRODUCTION shape —
  * pop=1000, gen=10, height≤2 (Instances/Instance1_bandgap/find2.py:84-90)
  * — over a deterministic LCG feature frame. Prints one JSON line with
  * per-generation wall times, candidate counts and novel-compile counts so
  * BASELINE.md §5 can record the render-memo's plan-cache economics at the
  * real population size (Scoring.maxBatchChunk pagination included).
  *
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_GP_ROWS (default 200k),
  * SPARK_GRAFT_GP_POP / _GENS / _HEIGHT to override the reference shape.
  */
object GpProdBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_GP_ROWS", "200000").toLong
    val pop = sys.env.getOrElse("SPARK_GRAFT_GP_POP", "1000").toInt
    val gens = sys.env.getOrElse("SPARK_GRAFT_GP_GENS", "10").toInt
    val height = sys.env.getOrElse("SPARK_GRAFT_GP_HEIGHT", "2").toInt
    val spark = graft.core.GraftSession.local(cpus)
    import graft.expr._

    // six LCG features (distinct multipliers), y = x0^2 + 5*x1 + 0.3*x4
    def lcg(mult: Long, inc: Long) =
      (pmod(col("id") * mult + inc, lit(1048576L)).cast("double") / 1048576.0)
    val d = spark.range(0, rows).toDF("id")
      .withColumn("x0", lcg(1103515245L, 12345L))
      .withColumn("x1", lcg(69069L, 1L))
      .withColumn("x2", lcg(214013L, 2531011L))
      .withColumn("x3", lcg(22695477L, 1L))
      .withColumn("x4", lcg(134775813L, 1L))
      .withColumn("x5", lcg(1664525L, 1013904223L))
      .withColumn("y", col("x0") * col("x0") + lit(5.0) * col("x1")
        + lit(0.3) * col("x4"))
    val reg = Registry(terminals = (0 to 5).map(i =>
      s"x$i" -> (col(s"x$i"), Dim.dless)).toMap)

    val t0 = System.nanoTime()
    val res = graft.search.SymbolicSearch.fit(d, reg, col("y"),
      graft.search.SymbolicSearch.Config(
        popSize = pop, nGen = gens, maxHeight = height,
        plateau = gens + 1, reTree = 2, seed = 42L))
    val totalSec = (System.nanoTime() - t0) / 1e9

    val lb = res.logbook
    val genMs = lb.map(_.millis)
    val cands = lb.map(_.candidates).sum
    val novel = lb.map(_.compiledNovel).sum
    val hitRate = if (cands > 0) 1.0 - novel.toDouble / cands else 0.0
    println(
      s"""{"metric":"gp production shape","pop":$pop,"gens":${res.generations},""" +
        s""""height":$height,"rows":$rows,"total_sec":${f"$totalSec%.2f"},""" +
        s""""sec_per_gen":${f"${totalSec / math.max(res.generations, 1)}%.2f"},""" +
        s""""gen_millis":[${genMs.mkString(",")}],""" +
        s""""candidates":$cands,"compiled_novel":$novel,""" +
        s""""memo_hit_rate":${f"$hitRate%.4f"},""" +
        s""""best_r2":${f"${res.best.score}%.6f"},""" +
        s""""best_expr":"${res.best.expr.render}","cpus":$cpus}""")
    spark.stop()
  }
}
