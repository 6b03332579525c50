package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Preference-pair mining for DPO/RLHF training data.
  *
  * Given scored candidate responses grouped by prompt, emit
  * (chosen, rejected) pairs: the group's best response versus each
  * lower-scored response whose gap clears `margin`, hardest negatives
  * (smallest qualifying gap) first, capped at `maxPairsPerGroup`.
  * Reference analog: featurebox's rank-then-select loops
  * (featurebox/selection/backforward.py's tolerance-gap acceptance) —
  * re-expressed as pure window algebra over the response table.
  *
  * Determinism: the total order is (score DESC, id ASC), so the chosen
  * response, the pairing order and the cap cut are all reproducible at any
  * parallelism and verifiable cell-exactly in any ANSI SQL engine. Output
  * scores are COPIED column values (no arithmetic), so cross-engine
  * comparison is byte-exact with no rounding contract.
  *
  * Shape (the 100 TB story): no join and no pair explosion — ONE hash
  * partition by prompt + ONE sort serve all three window expressions
  * (running first_value for the champion, row_number, running qualifying
  * count for the cap). Because the gap grows monotonically down the sort
  * order, "qualifying" rows form a contiguous suffix, so the per-group cap
  * is a running sum over the same running frame — every frame is
  * UNBOUNDED PRECEDING..CURRENT ROW, per-group window state is O(1), and
  * mega-prompt groups (best-of-10k sampling) stream through without
  * buffering.
  */
object Preference {

  /** Mine capped, margin-separated preference pairs per group.
    *
    * @param responses        one row per candidate response
    * @param groupCol         prompt / conversation key column name
    * @param idCol            response id column name (unique within group)
    * @param scoreCol         reward / quality score (rows with null score
    *                         are dropped — they can be neither side)
    * @param margin           minimum chosen−rejected score gap (> 0, so a
    *                         score tie can never pair a row against itself)
    * @param maxPairsPerGroup per-group cap, highest-scored qualifying
    *                         (hardest) negatives kept first
    */
  def minePairs(
      responses: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: Column,
      margin: Double,
      maxPairsPerGroup: Int): DataFrame = {
    require(margin > 0, s"margin must be > 0, got $margin")
    require(maxPairsPerGroup >= 1,
      s"maxPairsPerGroup must be >= 1, got $maxPairsPerGroup")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(scoreCol.desc, col(idCol).asc)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val ranked = responses
      .where(scoreCol.isNotNull)
      .withColumn("__cs", first(scoreCol).over(run))
      .withColumn("__cid", first(col(idCol)).over(run))
      .withColumn("__rn", row_number().over(w))
    // second pass over the SAME partitioning+ordering: Catalyst reuses the
    // exchange and the sort (PlanAuditSpec pins 1 Exchange + 1 Sort)
    val qual = (col("__rn") > 1) && (col("__cs") - scoreCol >= margin)
    ranked
      .withColumn("__qrk", sum(qual.cast("long")).over(run))
      .where(qual && col("__qrk") <= maxPairsPerGroup)
      .select(
        col(groupCol),
        col("__cid").as("chosen_id"),
        col("__cs").as("chosen_score"),
        col(idCol).as("rejected_id"),
        scoreCol.as("rejected_score"))
  }
}
