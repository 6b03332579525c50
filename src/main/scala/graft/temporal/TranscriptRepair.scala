package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript repair — canonicalize a raw turn table into the shape SFT
  * training expects, fixing the three defects real agent logs carry:
  *
  *   1. consecutive same-role turns (retry storms, streamed chunks logged as
  *      separate rows) → MERGED into one turn, texts joined with a newline
  *      in exact order, merge count kept for the audit trail;
  *   2. a leading prefix before the first `anchorRole` turn (system boot
  *      noise, orphan tool results from a truncated predecessor) → DROPPED —
  *      a training example must open with the anchor (user) turn;
  *   3. sparse/jittery turn ids → REINDEXED densely 0..n-1 per conversation.
  *
  * Conversations containing no `anchorRole` turn at all are dropped whole —
  * they cannot open correctly. [[TranscriptAudit]] DETECTS these defects
  * (role repeats, structure flags); this operator is the paired FIX.
  *
  * Shape (the 100 TB story): ONE shuffle total. The hash exchange on
  * `convCol` feeds the lag/segment window; the (conv, segment) groupBy and
  * both follow-up windows reuse that distribution (partitioning on a prefix
  * of the grouping keys satisfies the clustered requirement), so merging,
  * anchor-trimming and reindexing all ride the same exchange. Per-group
  * state is O(merged turn), not O(conversation).
  */
object TranscriptRepair {

  /** @param orderCols total-order columns (unique, non-null prefix) within a
    *                  conversation
    * @param anchorRole role that must open every repaired conversation
    */
  def repair(
      turns: DataFrame,
      convCol: String,
      orderCols: Seq[String],
      roleCol: String,
      textCol: Column,
      anchorRole: String): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val wOrd = Window.partitionBy(col(convCol))
      .orderBy(orderCols.map(col): _*)
    val wConv = Window.partitionBy(col(convCol))

    // null-safe comparison (the oracle's IS DISTINCT FROM): a null-role
    // turn (mid-write crash) must OPEN its own segment, not silently merge
    // its text into the preceding turn of a different role
    val chg = when(lag(col(roleCol), 1).over(wOrd) <=> col(roleCol), 0L)
      .otherwise(1L)
    val packed = struct(orderCols.map(col) :+
      coalesce(textCol, lit("")).as("__t"): _*)

    turns
      .withColumn("__seg", sum(chg).over(wOrd))
      .groupBy(col(convCol), col("__seg"))
      .agg(
        min(col(roleCol)).as(roleCol), // constant within a segment
        count(lit(1)).as("n_merged"),
        array_join(transform(array_sort(collect_list(packed)),
          x => x("__t")), "\n").as("text"))
      .withColumn("__anchor",
        min(when(col(roleCol) === anchorRole, col("__seg"))).over(wConv))
      .where(col("__seg") >= col("__anchor")) // null anchor filters the conv
      .withColumn("turn_idx",
        row_number().over(wConv.orderBy(col("__seg"))) - 1)
      .select(col(convCol), col("turn_idx"), col(roleCol), col("text"),
        col("n_merged"))
  }
}
