package graft.temporal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tool-call payload parsing for agent transcripts.
  *
  * Transcript turns carry tool arguments/results as JSON blobs (the
  * `events.props` shape). Training-data prep needs them typed: extract the
  * argument fields, flag turns whose payload does not parse (truncated
  * logs, mid-write crashes), and aggregate a per-conversation payload-health
  * audit that the curation gate can threshold on — the JSON twin of
  * [[TranscriptAudit]]'s structural checks.
  *
  * Shape (the 100 TB story): extraction is a PURE PROJECTION —
  * `get_json_object` evaluates per row with no shuffle and no UDF; the audit
  * is one hash aggregation with map-side partial buffers. Malformed payloads
  * never throw: extraction yields null (Spark's permissive JSON path), and
  * the audit counts them.
  */
object ToolCalls {

  /** Extract a top-level field from a JSON payload column as a typed value.
    * Null when the payload is malformed, the field is absent, or the value
    * does not cast — the three failure modes a 10^12-row parse must absorb
    * row-locally.
    */
  def argLong(payload: Column, field: String): Column =
    // try_cast, not cast: under ANSI mode a present-but-non-numeric value
    // must degrade to null like the other two failure modes, not throw
    get_json_object(payload, s"$$.$field").try_cast("long")

  /** Per-group JSON payload health audit: row count, malformed-or-missing
    * count, extracted-argument count / sum / max for one numeric field.
    *
    * @param df       one row per turn
    * @param groupCol conversation key column name
    * @param payload  JSON payload column
    * @param field    top-level numeric field to extract
    */
  def auditArgs(
      df: DataFrame,
      groupCol: String,
      payload: Column,
      field: String): DataFrame = {
    val arg = argLong(payload, field)
    df.select(col(groupCol), arg.as("__arg"))
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__arg").isNull.cast("long")).as("n_bad"),
        sum(col("__arg")).as("sum_arg"),
        max(col("__arg")).as("max_arg"))
  }
}
