package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Chat-template rendering — the last-mile operator that turns a curated
  * turn table into model-ready SFT text, one rendered example per
  * conversation. Reference analog: the expression→string rendering in
  * featurebox's translate layer (featurebox/symbol/translate.py) — here the
  * "expression" is the conversation and the grammar is the chat template.
  *
  * Template: every turn renders as `<|role|>text<|end|>` (null text renders
  * empty — the audit gate counts those; rendering never drops the turn),
  * concatenated in exact (orderCols) order.
  *
  * Shape (the 100 TB story): ONE shuffle (the per-conversation groupBy,
  * map-side partial collect) and the total order is restored INSIDE each
  * group by `array_sort` on a struct whose leading fields are the order
  * columns — no separate sort pass, no window. Per-group memory is
  * O(conversation) — inherent to emitting the conversation as one string
  * (the same bound [[graft.text.Packing.packGreedy]] documents); the output
  * row IS the training example, so this is the one place buffering the
  * conversation is the point, not a defect.
  */
object ChatRender {

  /** @param orderCols total-order columns (unique prefix) within a
    *                  conversation; they become the leading struct fields
    *                  `array_sort` orders by, so they must be non-null.
    */
  def render(
      turns: DataFrame,
      convCol: String,
      orderCols: Seq[String],
      roleCol: String,
      textCol: Column): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must not be empty")
    val packed = struct(
      (orderCols.map(col) :+ col(roleCol).as("__r") :+ textCol.as("__t")): _*)
    turns
      .groupBy(col(convCol))
      .agg(
        count(lit(1)).as("n_turns"),
        array_join(
          transform(array_sort(collect_list(packed)),
            x => concat(lit("<|"), x("__r"), lit("|>"),
              coalesce(x("__t"), lit("")), lit("<|end|>"))),
          "").as("rendered"))
  }
}
