package graft.run

import org.apache.spark.sql.functions._

/** Production-scale connected-components evidence: run [[graft.text.Dedup
  * .resolveClusters]] on a synthetic LONG-CHAIN graph — the worst case for
  * min-label propagation (diameter = edge count; a random dup graph has
  * tiny diameter) — and record rounds / driver-finish / wall time.
  *
  * The O(log n) claim under test: one neighbor-min + one pointer jump per
  * round at least doubles the distance each node's label has travelled, so
  * a chain of E edges must converge in ≤ log₂(E) + 1 rounds (the driver
  * finish can only LOWER that). The run fails loudly if the bound breaks.
  *
  * Usage: CcBench [edges] (default 10^7)
  */
object CcBench {
  def main(args: Array[String]): Unit = {
    val edgesN = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    graft.core.GraftSession.ensureCheckpointDir(spark)
    // one chain: 0-1-2-...-E (single component, min id 0)
    val pairs = spark.range(edgesN)
      .select(col("id").as("id_a"), (col("id") + 1L).as("id_b"))
    val t0 = System.nanoTime()
    val out = graft.text.Dedup.resolveClusters(pairs, maxRounds = 40)
    val agg = out.agg(
      count(lit(1)).as("nodes"),
      count_distinct(col("cluster_id")).as("n_clusters"),
      max(col("cluster_id")).as("max_label")).head()
    val wall = (System.nanoTime() - t0) / 1e9
    val rounds = graft.text.Dedup.lastCcRounds
    val finished = graft.text.Dedup.lastCcDriverFinished
    val bound = (math.log(edgesN.toDouble) / math.log(2.0)).ceil.toInt + 1
    println(f"""[ccbench] {"edges":$edgesN,"nodes":${agg.getLong(0)},""" +
      f""""n_clusters":${agg.getLong(1)},"rounds":$rounds,""" +
      f""""driver_finish":$finished,"wall_sec":$wall%.1f,"log2_bound":$bound}""")
    assert(agg.getLong(1) == 1L && agg.getLong(2) == 0L,
      s"chain must collapse to ONE cluster labeled 0, got $agg")
    assert(agg.getLong(0) == edgesN + 1, s"node count wrong: $agg")
    assert(rounds <= bound,
      s"convergence bound broken: $rounds rounds > log2($edgesN)+1 = $bound")
    spark.stop()
  }
}
