package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.core.{Tables, Transcripts}
import graft.temporal.{AsOf, Backfill, Descriptors, Sessionize}
import graft.stats.WeightedStats

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] has (where SQL-expressible) a DuckDB oracle in
  * [[oracleSql]] with IDENTICAL output column names; double-valued outputs are
  * rounded the same way on both sides so cross-engine float summation order
  * cannot flip the driver's hash compare.
  */
object SparkEntry {

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")
  private def li(s: SparkSession, dir: String) = Tables.load(s, dir, "lineitem")

  /** Flagship: the SURVEY §7.2 minimum slice on synthesized transcripts —
    * backward as-of join of feature snapshots + lag + rolling tool-count +
    * sessionize + backfill. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val t = Transcripts.synthesize(spark, nConvs = 200, megaEvery = 64, megaLen = 512)
    val snaps = Transcripts.snapshots(t)
    val joined = AsOf.asofJoin(
      t, snaps,
      key = "conv_id", leftTs = "ts", rightTs = "snapshot_ts",
      tiebreak = "snap_turn_idx", payload = Seq("f_vec"))
    val sessioned = Sessionize.byGap(joined, "conv_id", "ts", Seq("ts", "turn_idx"), 1800L)
    val filled = Backfill.lastNonNull(sessioned, "conv_id", Seq("ts", "turn_idx"), Seq("tool"))
    Descriptors.pack(
      filled, "conv_id", Seq("ts", "turn_idx"),
      length(col("text")).cast("double"), lags = Seq(1, 2),
      rollingRows = 10, rollingPred = col("role") === "tool")
  }

  // ----- shared derived views (must stay in lockstep with the oracle SQL) --

  /** Snapshot side for the as-of query: purchase events deduped to one row
    * per (user_id, ts), keeping the value of the highest event_id.
    */
  private def purchaseSnapshots(e: DataFrame): DataFrame =
    e.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts").as("snap_ts"))
      .agg(max(col("event_id")).as("snap_event_id"),
        max_by(col("value"), col("event_id")).as("snap_value"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core -------------------------------------------------
    "q01_pricing_summary" -> ((s, dir) => {
      li(s, dir)
        .where(col("l_shipdate") <= lit("1997-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 4).as("sum_qty"),
          round(sum(col("l_extendedprice")), 4).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
    }),

    "q02_revenue_by_nation" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"), col("c_mktsegment"))
        .agg(round(sum(col("o_totalprice")), 4).as("revenue"),
          count(lit(1)).as("n_orders"))
    }),

    "q03_topk_orders" -> ((s, dir) => {
      Tables.load(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // ---- temporal engine -------------------------------------------------
    "q04_lag_lead" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir).select(
        col("event_id"), col("user_id"),
        lag(col("value"), 1).over(w).as("lag1"),
        lag(col("value"), 2).over(w).as("lag2"),
        lead(col("value"), 1).over(w).as("lead1"))
    }),

    "q05_rolling" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev(s, dir).select(
        col("event_id"), col("user_id"),
        sum(when(col("event_type") === "click", 1).otherwise(0))
          .over(w.rowsBetween(-9, 0)).as("clicks_10"),
        round(sum(col("value")).over(w.rowsBetween(-4, 0)), 4).as("val_5"))
    }),

    "q06_sessionize" -> ((s, dir) => {
      Sessionize.byGap(ev(s, dir), "user_id", "ts", Seq("ts", "event_id"), 1800L)
        .groupBy(col("user_id"), col("session_idx"))
        .agg(count(lit(1)).as("n_events"),
          round(sum(col("value")), 4).as("session_value"))
    }),

    "q07_backfill" -> ((s, dir) => {
      val t = Transcripts.fromEvents(ev(s, dir))
      Backfill.lastNonNull(t, "conv_id", Seq("ts", "event_id"), Seq("tool"))
        .select(col("event_id"), col("conv_id"), col("tool_filled"))
    }),

    "q08_asof_join" -> ((s, dir) => {
      val e = ev(s, dir)
      AsOf.asofJoin(
        e.select(col("event_id"), col("user_id"), col("ts")),
        purchaseSnapshots(e),
        key = "user_id", leftTs = "ts", rightTs = "snap_ts",
        tiebreak = "snap_event_id", payload = Seq("snap_value"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 4) AS sum_qty,
        |  round(sum(l_extendedprice), 4) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-09-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT n_name, c_mktsegment,
        |  round(sum(o_totalprice), 4) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment""".stripMargin,

    "q03_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q04_lag_lead" ->
      """SELECT event_id, user_id,
        |  lag(value, 1) OVER w AS lag1,
        |  lag(value, 2) OVER w AS lag2,
        |  lead(value, 1) OVER w AS lead1
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q05_rolling" ->
      """SELECT event_id, user_id,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS clicks_10,
        |  round(sum(value)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS val_5
        |FROM events""".stripMargin,

    "q06_sessionize" ->
      """WITH gapped AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, value,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM gapped
        |)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  round(sum(value), 4) AS session_value
        |FROM sess GROUP BY user_id, session_idx""".stripMargin,

    "q07_backfill" ->
      """WITH t AS (
        |  SELECT event_id, CAST(user_id AS VARCHAR) AS conv_id, ts,
        |    CASE WHEN value > 50.0 THEN event_type END AS tool
        |  FROM events
        |)
        |SELECT event_id, conv_id,
        |  last_value(tool IGNORE NULLS) OVER (
        |    PARTITION BY conv_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tool_filled
        |FROM t""".stripMargin,

    "q08_asof_join" ->
      """WITH snaps AS (
        |  SELECT user_id, ts AS snap_ts,
        |    max_by(value, event_id) AS snap_value
        |  FROM events WHERE event_type = 'purchase'
        |  GROUP BY user_id, ts
        |)
        |SELECT e.event_id, e.user_id, e.ts, s.snap_value
        |FROM events e
        |ASOF LEFT JOIN snaps s
        |  ON e.user_id = s.user_id AND e.ts >= s.snap_ts""".stripMargin
  )
}
