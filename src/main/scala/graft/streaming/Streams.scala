package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming variants of the temporal operators, for pipelines
  * fed by live transcript streams. The reference is batch-only (SURVEY
  * §2.9); these are the streaming-native expressions of the same semantics:
  *
  *  - gap sessionization → `session_window` (the built-in implements
  *    exactly "merge events closer than gap" with watermark-driven state
  *    eviction — no custom state needed);
  *  - rolling/windowed counts → tumbling/sliding `window` aggregations;
  *  - watermarks bound state so a 10^12-turn stream never accumulates
  *    unbounded sessions.
  *
  * All functions accept batch OR streaming DataFrames (identical plans),
  * which is how they're unit-tested deterministically.
  */
object Streams {

  /** Per-key gap sessions: one row per (key, session) with count + span.
    * On a stream, requires a watermark on `ts` (use [[withWatermark]]).
    */
  def gapSessions(df: DataFrame, key: String, ts: String, gap: String): DataFrame =
    df.groupBy(col(key), session_window(col(ts), gap).as("session"))
      .agg(count(lit(1)).as("n_turns"),
        min(col(ts)).as("first_ts"), max(col(ts)).as("last_ts"))
      .select(col(key), col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("n_turns"),
        col("first_ts"), col("last_ts"))

  /** Sliding windowed event counts per key. */
  def windowedCounts(df: DataFrame, key: String, ts: String,
      window_ : String, slide: String): DataFrame =
    df.groupBy(col(key), window(col(ts), window_, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col(key), col("w.start").as("w_start"), col("w.end").as("w_end"), col("n"))

  def withWatermark(df: DataFrame, ts: String, delay: String): DataFrame =
    df.withWatermark(ts, delay)
}
