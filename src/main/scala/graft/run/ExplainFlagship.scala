package graft.run

/** Dev tool: print the flagship physical plan (shuffle/sort audit). */
object ExplainFlagship {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(8)
    val t = graft.core.Transcripts.synthesize(spark, 100)
    val s = graft.core.Transcripts.snapshots(t)
    val plan = Flagship.pipeline(t, s)
    plan.explain("formatted")
    val pstr = plan.queryExecution.executedPlan.toString
    println("== Sort nodes: " + "(?i)\\bsort\\b".r.findAllIn(pstr).size +
      ", Exchange nodes: " + "Exchange".r.findAllIn(pstr).size)
    spark.stop()
  }
}
