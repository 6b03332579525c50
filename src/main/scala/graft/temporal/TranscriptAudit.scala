package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Conversation structural-integrity audit — the transcript-specific
  * curation gate. Documents have content gates (quality, repetition,
  * entropy); multi-turn TRANSCRIPTS additionally need STRUCTURE gates
  * before they become training data: consecutive same-role turns (merge
  * or drop), empty turns, timestamp ties (ordering ambiguity a replay
  * can't resolve), and degenerate spans. Reference analog: featurebox's
  * `BaseFeaturizer` on_errors row screening
  * (featurebox/featurizers/basefeaturizer.py) — lifted from per-row
  * error flags to per-conversation sequence diagnostics.
  *
  * Output per conversation: `n_turns`, `n_role_repeats` (turns whose role
  * equals the previous turn's), `n_empty_text`, `n_ts_ties` (turns sharing
  * the previous turn's timestamp), `span_us` (last−first timestamp, exact
  * integer µs), `first_role`, `last_role`. Callers threshold these to
  * build keep-lists (e.g. drop conversations with role repeats or ties).
  *
  * Shape (the 100 TB story): ONE hash partition by conversation + ONE sort
  * feed the lag/row_number window, and the following per-conversation
  * aggregation reuses that same hash distribution — no second shuffle.
  * All sequence state is O(1) per row (lag-1 only); mega-conversations
  * stream through.
  */
object TranscriptAudit {

  /** @param turns     one row per turn
    * @param convCol   conversation key column name
    * @param orderCols total-order columns within a conversation (the last
    *                  ones breaking ties deterministically)
    * @param roleCol   speaker/role column
    * @param tsCol     event-time column (cast to timestamp internally —
    *                  parquet TIMESTAMP_NTZ is fine under a UTC session)
    * @param textCol   turn content (null or empty counts as an empty turn)
    */
  def audit(
      turns: DataFrame,
      convCol: String,
      orderCols: Seq[String],
      roleCol: String,
      tsCol: String,
      textCol: Column): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val w = Window.partitionBy(col(convCol)).orderBy(orderCols.map(col): _*)
    val flag = (c: Column) => when(c, 1L).otherwise(0L) // null-safe: null→0

    turns
      .withColumn("__pr", lag(col(roleCol), 1).over(w))
      .withColumn("__pts", lag(col(tsCol), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      .groupBy(col(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        sum(flag(col(roleCol) === col("__pr"))).as("n_role_repeats"),
        sum(flag(textCol.isNull || length(textCol) === 0)).as("n_empty_text"),
        sum(flag(col(tsCol) === col("__pts"))).as("n_ts_ties"),
        (unix_micros(max(col(tsCol)).cast("timestamp")) -
          unix_micros(min(col(tsCol)).cast("timestamp"))).as("span_us"),
        min_by(col(roleCol), col("__rn")).as("first_role"),
        max_by(col(roleCol), col("__rn")).as("last_role"))
  }
}
