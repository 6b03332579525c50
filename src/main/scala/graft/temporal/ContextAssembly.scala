package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-example context assembly over transcript turns.
  *
  * For SFT / agent-trace training every turn becomes an example whose input
  * is the trailing conversation context that fits the model's token budget.
  * Reference analog: featurebox's fixed-k `Neighborizer` trailing windows
  * (featurebox/featurizers/batchfeature.py) — here the window bound is a
  * TOKEN budget, not a row count, which is what an LLM pipeline needs.
  *
  * Semantics per turn i: the context is the longest suffix of turns
  * `j..i` (bounded to the last `maxTurns` rows) whose total token count is
  * ≤ `tokenBudget`; the current turn is ALWAYS kept, even when it alone
  * exceeds the budget (the caller's truncation problem, not ours — dropping
  * the label row would silently lose the example).
  *
  * Shape (the 100 TB story): ONE hash partition by conversation + ONE sort
  * serves both window passes (running token cumsum, then the bounded
  * collect); per-row state is O(maxTurns) structs, independent of
  * conversation length, so mega-conversations cost memory O(maxTurns), not
  * O(len). The budget test needs no per-row fold: token counts are
  * non-negative, so `sum(j..i) = cum_i - cum_j + tok_j` is monotone in j
  * and a plain `filter` keeps exactly the contiguous suffix — no
  * accumulator HOF, no re-evaluated array lambdas (the q58 pitfall).
  *
  * Output: `n_ctx` (turns kept), `ctx_tokens` (their token total),
  * `n_mask` (kept turns carrying loss, per `maskCol`), `ctx_ids`
  * (comma-joined kept ids, oldest→current — string-typed so the strict
  * cross-engine gate compares it cell-exactly).
  */
object ContextAssembly {

  def assemble(
      turns: DataFrame,
      convCol: String,
      orderCols: Seq[String],
      idCol: String,
      tokCol: Column,
      maskCol: Column,
      tokenBudget: Long,
      maxTurns: Int): DataFrame = {
    require(maxTurns >= 1, s"maxTurns must be >= 1, got $maxTurns")
    val ord = orderCols.map(col)
    val base = Window.partitionBy(col(convCol)).orderBy(ord: _*)
    val wCum = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCtx = base.rowsBetween(-(maxTurns - 1).toLong, Window.currentRow)

    val withCum = turns
      .withColumn("__tok", tokCol.cast("long"))
      .withColumn("__m", maskCol.cast("long"))
      .withColumn("__cum", sum(col("__tok")).over(wCum))
    val kept = filter(
      collect_list(struct(col("__cum").as("cum"), col("__tok").as("tok"),
        col(idCol).as("id"), col("__m").as("m"))).over(wCtx),
      x => (col("__cum") - x("cum") + x("tok") <= tokenBudget) ||
        x("id") === col(idCol))

    withCum
      .withColumn("__kept", kept)
      .select(
        col(idCol), col(convCol),
        size(col("__kept")).cast("long").as("n_ctx"),
        aggregate(col("__kept"), lit(0L), (a, x) => a + x("tok")).as("ctx_tokens"),
        aggregate(col("__kept"), lit(0L), (a, x) => a + x("m")).as("n_mask"),
        array_join(transform(col("__kept"), x => x("id").cast("string")), ",")
          .as("ctx_ids"))
  }
}
