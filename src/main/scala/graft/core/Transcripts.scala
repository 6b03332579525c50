package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The transcript data model mandated by BASELINE.json `input_hint`:
  * an Iceberg-style table of multi-turn agent transcripts.
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp
)

/** Deterministic synthetic transcript generation + testdata-derived views.
  *
  * Generation discipline (FIXTURES.md): every column is a pure function of
  * `(conv, turn, seed)` via `xxhash64`, so the produced rows are identical at
  * any parallelism level / partitioning — the property that lets the same
  * table back both the `local[8]` and `local[32]` scaling runs and the
  * allclose parity oracle. Mirrors the reference's seeded generators
  * (featurebox/data/datasets.py:44-59) re-expressed as Spark columns; pure
  * built-in expressions keep the whole generator inside whole-stage codegen
  * and ANSI-safe (no raw Long arithmetic that could overflow).
  */
object Transcripts {

  /** Deterministic 64-bit hash of any columns (codegen'd, overflow-free). */
  def h(cols: Column*): Column = xxhash64(cols: _*)

  /** Non-negative bounded hash in [0, n). */
  def hmod(n: Int, cols: Column*): Column = pmod(h(cols: _*), lit(n.toLong))

  private val vocab = Seq(
    "alpha", "beta", "gamma", "delta", "query", "result", "token", "model",
    "search", "plan", "run", "check", "data", "join", "spark", "graph",
    "the", "a", "of", "and", "to", "in", "is", "for", "with", "on"
  )

  /** Role/tool dictionaries — public so the flagship pipeline can
    * dictionary-encode these columns around its shuffle (1-based indices,
    * matching `array_position`/`element_at`).
    */
  val roles = Seq("user", "assistant", "tool", "system")
  val tools = Seq("search", "exec", "browse")

  /** Synthesize `nConvs` conversations with heavy-tailed lengths.
    *
    * - conversation length: base 4 + hash%12 turns; every `megaEvery`-th
    *   conversation is a mega-conversation of `megaLen` turns (skew driver).
    * - `ts` strictly increasing with turn_idx inside a conversation; gaps are
    *   usually 20-320 s but every ~13th gap is > 30 min (sessionization
    *   driver).
    * - `tool` is null-heavy (backfill driver); `text` is a deterministic
    *   token sequence keyed by (conv, turn).
    *
    * The only non-closed-form column is the cumulative timestamp, computed
    * with a window cumsum over the total order (conv, turn_idx) — still
    * deterministic because the order is total.
    */
  def synthesize(
      spark: SparkSession,
      nConvs: Long,
      seed: Long = 42L,
      megaEvery: Int = 1024,
      megaLen: Int = 8192
  ): DataFrame = {
    val conv = spark.range(nConvs).toDF("conv")
    val sized = conv.withColumn(
      "len",
      when(pmod(col("conv"), lit(megaEvery.toLong)) === 0, lit(megaLen))
        .otherwise((hmod(12, col("conv"), lit(seed)) + lit(4)).cast("int"))
    )
    val turns = sized
      .select(col("conv"), explode(sequence(lit(0), col("len") - 1)).as("turn_idx"))
    def k(salt: Int, extra: Column*): Column =
      h(Seq(col("conv"), col("turn_idx"), lit(seed), lit(salt)) ++ extra: _*)
    val wordsArr = array(vocab.map(lit): _*)
    val rolesArr = array(roles.map(lit): _*)
    val toolsArr = array(tools.map(lit): _*)

    val gapSec =
      when(pmod(k(1), lit(13L)) === 0, lit(1800L) + pmod(k(2), lit(3600L)))
        .otherwise(lit(20L) + pmod(k(2), lit(300L)))

    val w = Window.partitionBy(col("conv")).orderBy(col("turn_idx"))
    val textLen = (pmod(k(3), lit(14L)) + 3).cast("int")
    val text = concat_ws(
      " ",
      transform(
        sequence(lit(0), textLen - 1),
        i => element_at(wordsArr, (hmod(vocab.size, k(4), i) + 1).cast("int"))
      )
    )

    turns
      .withColumn("conv_id", format_string("c%010d", col("conv")))
      .withColumn("role", element_at(rolesArr, (pmod(k(5), lit(4L)) + 1).cast("int")))
      .withColumn("text", text)
      .withColumn(
        "tool",
        when(pmod(k(6), lit(10L)) < 7, lit(null).cast("string"))
          .otherwise(element_at(toolsArr, (pmod(k(7), lit(3L)) + 1).cast("int")))
      )
      .withColumn("gap", gapSec)
      .withColumn(
        "ts_sec",
        lit(1700000000L) + col("conv") * 97L + sum(col("gap")).over(w)
      )
      .withColumn("ts", timestamp_seconds(col("ts_sec")))
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("role"), col("text"), col("tool"), col("ts"))
  }

  /** Feature-snapshot table (right side of the backward as-of join): one
    * snapshot roughly every 4th turn of each conversation, stamped at that
    * turn's ts, carrying a fixed-length deterministic feature vector.
    */
  def snapshots(transcripts: DataFrame, fDim: Int = 8): DataFrame =
    transcripts
      .where(pmod(col("turn_idx"), lit(4)) === 0)
      .select(
        col("conv_id"),
        col("turn_idx").as("snap_turn_idx"),
        col("ts").as("snapshot_ts"),
        transform(
          sequence(lit(0), lit(fDim - 1)),
          i => pmod(h(col("conv_id"), col("turn_idx"), i), lit(100000L))
            .cast("double") / 1000.0
        ).as("f_vec")
      )

  /** Transcript-shaped view over the driver's `events` testdata table, so
    * every temporal operator has a DuckDB-verifiable oracle: both engines
    * derive the identical view from the same parquet.
    *   conv_id  := user_id as string
    *   turn_idx := row_number over (user_id order by ts, event_id) - 1
    *   role     := event_type, text := props, tool := event_type when value>50
    */
  def fromEvents(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
      col("user_id").cast("string").as("conv_id"),
      (row_number().over(w) - 1).as("turn_idx"),
      col("event_type").as("role"),
      col("props").as("text"),
      when(col("value") > 50.0, col("event_type")).as("tool"),
      col("ts"),
      col("event_id"),
      col("value")
    )
  }
}
