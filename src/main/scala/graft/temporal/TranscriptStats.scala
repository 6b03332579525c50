package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level dialogue-structure statistics: the role-transition matrix
  * `P(next role | previous role)` over all conversations — the
  * fingerprint that separates clean assistant data (user→assistant→user…)
  * from scraper artifacts (assistant→assistant retry storms, tool loops)
  * and catches distribution drift between transcript sources before
  * training does. [[TranscriptAudit]] flags defects per conversation; this
  * is the corpus-wide summary the audit thresholds are tuned against.
  *
  * Shape (the 100 TB story): one hash exchange on the conversation key
  * feeds the lag window; the (prev, next) pair counts are a partial-agg
  * groupBy, and the row-normalization window runs over the aggregated
  * role×role table (at most |roles|² rows). Determinism: counts are exact
  * longs; each probability is one long division rounded to 6dp.
  */
object TranscriptStats {

  /** @return (prev_role, next_role, n_transitions, p) where `p` is
    *         row-normalized `n / Σ_next n`, rounded to 6dp. Transitions
    *         with a null role on either side are kept as the literal
    *         "<null>" state — absent-role turns are a real structural
    *         signal, not noise to drop.
    */
  def roleTransitions(
      turns: DataFrame,
      convCol: String,
      orderCols: Seq[String],
      roleCol: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val wOrd = Window.partitionBy(col(convCol))
      .orderBy(orderCols.map(col): _*)
    val role = coalesce(col(roleCol), lit("<null>"))
    val pairs = turns
      .withColumn("__prev", lag(role, 1).over(wOrd))
      .where(col("__prev").isNotNull)
      .select(col("__prev").as("prev_role"), role.as("next_role"))
    val counts = pairs.groupBy(col("prev_role"), col("next_role"))
      .agg(count(lit(1)).as("n_transitions"))
    val wPrev = Window.partitionBy(col("prev_role"))
    counts.withColumn("p",
      round(col("n_transitions").cast("double") /
        sum(col("n_transitions")).over(wPrev).cast("double"), 6))
  }
}
