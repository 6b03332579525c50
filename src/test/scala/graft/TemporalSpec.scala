package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp

import graft.core.Transcripts
import graft.temporal.{AsOf, Backfill, Sessionize}

/** Temporal-engine semantics: brute-force oracle parity + the zero-leakage
  * property the north rule demands.
  */
class TemporalSpec extends GraftSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // Deterministic in-memory fixture: 3 keys, ts collisions, pre-first-snapshot
  // rows, equal-ts left/right pairs (pins the inclusive <= semantics).
  private lazy val leftRows = Seq(
    // (id, key, ts)
    (1L, "a", 100L), (2L, "a", 150L), (3L, "a", 200L), (4L, "a", 201L),
    (5L, "b", 50L), (6L, "b", 400L),
    (7L, "c", 10L) // key with no snapshots at all
  )
  private lazy val rightRows = Seq(
    // (key, ts, tiebreak, value)
    ("a", 150L, 1, 10.0), ("a", 150L, 2, 20.0), // same-ts: tiebreak 2 must win
    ("a", 199L, 1, 30.0),
    ("b", 60L, 1, 40.0), ("b", 400L, 1, 50.0) // equal-ts join must include
  )

  private lazy val left = leftRows
    .map { case (id, k, t) => (id, k, ts(t)) }
    .toDF("id", "key", "ts")
  private lazy val right = rightRows
    .map { case (k, t, tb, v) => (k, ts(t), tb, v) }
    .toDF("key", "snap_ts", "tb", "snap_value")

  /** Brute-force oracle: latest right row with ts <= left ts, max tiebreak. */
  private def bruteAsof(id: Long): Option[Double] = {
    val (_, k, lt) = leftRows.find(_._1 == id).get
    val cand = rightRows.filter(r => r._1 == k && r._2 <= lt)
    if (cand.isEmpty) None
    else Some(cand.maxBy(r => (r._2, r._3))._4)
  }

  test("asofJoin matches brute-force oracle incl. ties and tiebreak") {
    val out = AsOf
      .asofJoin(left, right, "key", "ts", "snap_ts", "tb", Seq("snap_value"))
      .select($"id", $"snap_value")
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out.keySet == leftRows.map(_._1).toSet)
    leftRows.foreach { case (id, _, _) =>
      assert(out(id) == bruteAsof(id), s"row $id")
    }
    // pin the named cases:
    assert(out(2L).contains(20.0)) // equal-ts inclusive, tiebreak 2 wins
    assert(out(1L).isEmpty)        // before first snapshot -> null, no leakage
    assert(out(6L).contains(50.0)) // equal-ts right row visible
    assert(out(7L).isEmpty)        // key with no snapshots
  }

  test("asofJoin zero temporal leakage on synthetic transcripts") {
    val t = Transcripts.synthesize(spark, 50, megaEvery = 16, megaLen = 200)
    val snaps = Transcripts.snapshots(t)
    val joined = AsOf.asofJoin(
      t, snaps.withColumn("snap_ts_copy", col("snapshot_ts")),
      "conv_id", "ts", "snapshot_ts", "snap_turn_idx",
      Seq("f_vec", "snap_ts_copy"))
    // every surfaced snapshot has snapshot_ts <= row ts
    val leaks = joined
      .where(col("snap_ts_copy").isNotNull && col("snap_ts_copy") > col("ts"))
      .count()
    assert(leaks == 0L)
    // and it is the LATEST admissible one: recompute via brute force join
    val brute = t.alias("l")
      .join(snaps.alias("r"),
        col("l.conv_id") === col("r.conv_id") &&
          col("r.snapshot_ts") <= col("l.ts"))
      .groupBy(col("l.conv_id").as("conv_id"), col("l.turn_idx").as("turn_idx"))
      .agg(max(struct(col("r.snapshot_ts"), col("r.snap_turn_idx"), col("r.f_vec")))
        .as("best"))
      .select(col("conv_id"), col("turn_idx"), col("best.f_vec").as("f_brute"))
    val cmp = joined
      .join(brute, Seq("conv_id", "turn_idx"), "left")
      .where(!(col("f_vec") <=> col("f_brute")))
    assert(cmp.count() == 0L)
  }

  test("skew-capped as-of join is row-identical to the plain as-of join") {
    val t = Transcripts.synthesize(spark, 60, megaEvery = 16, megaLen = 300)
    val snaps = Transcripts.snapshots(t)
    val plain = AsOf.asofJoin(t, snaps, "conv_id", "ts", "snapshot_ts",
      "snap_turn_idx", Seq("f_vec"))
    // small bucket (10 min) so mega-conversations split into many buckets
    val capped = AsOf.asofJoinSkewCapped(t, snaps, "conv_id", "ts",
      "snapshot_ts", "snap_turn_idx", Seq("f_vec"), bucketSeconds = 600L)
    assert(capped.count() == plain.count())
    val diff = plain.alias("p").join(capped.alias("c"),
        Seq("conv_id", "turn_idx"))
      .where(!(col("p.f_vec") <=> col("c.f_vec")))
    assert(diff.count() == 0L, "skew-capped as-of diverged from plain as-of")
    // and on the small explicit fixture too (ties, missing keys)
    val cappedSmall = AsOf.asofJoinSkewCapped(left, right, "key", "ts",
      "snap_ts", "tb", Seq("snap_value"), bucketSeconds = 60L)
      .select($"id", $"snap_value").collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap
    leftRows.foreach { case (id, _, _) =>
      assert(cappedSmall(id) == bruteAsof(id), s"row $id")
    }
  }

  test("sessionize: new session iff gap > threshold, ids monotone dense") {
    val rows = Seq(
      ("a", 1L, 0L), ("a", 2L, 100L), ("a", 3L, 2000L), // gap 1900 > 1800
      ("a", 4L, 3799L), ("a", 5L, 3800L), ("a", 6L, 5601L), // gap 1801 > 1800
      ("b", 7L, 0L)
    ).map { case (k, id, t) => (k, id, ts(t)) }.toDF("key", "id", "ts")
    val out = Sessionize
      .byGap(rows, "key", "ts", Seq("ts", "id"), 1800L)
      .select($"id", $"session_idx".cast("long"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      6L -> 2L, 7L -> 0L))
  }

  test("backfill: last preceding non-null, never a future value") {
    val rows = Seq(
      ("a", 1L, None), ("a", 2L, Some("x")), ("a", 3L, None),
      ("a", 4L, Some("y")), ("a", 5L, None),
      ("b", 6L, None)
    ).map { case (k, id, v) => (k, id, ts(id * 10), v) }
      .toDF("key", "id", "ts", "tool")
    val out = Backfill
      .lastNonNull(rows, "key", Seq("ts", "id"), Seq("tool"))
      .select($"id", $"tool_filled")
      .collect()
      .map(r => r.getLong(0) -> Option(r.getString(1)))
      .toMap
    assert(out == Map(1L -> None, 2L -> Some("x"), 3L -> Some("x"),
      4L -> Some("y"), 5L -> Some("y"), 6L -> None))
  }

  test("transcript generator is partition-count independent") {
    val a = Transcripts.synthesize(spark, 40).repartition(2)
      .orderBy("conv_id", "turn_idx").collect()
    val b = Transcripts.synthesize(spark, 40).repartition(16)
      .orderBy("conv_id", "turn_idx").collect()
    assert(a.length == b.length && a.length > 0)
    assert(a.sameElements(b))
    // per-turn text equality under stable (conv_id, turn_idx) ordering
    a.zip(b).foreach { case (x, y) =>
      assert(x.getAs[String]("text") == y.getAs[String]("text"))
    }
  }

  test("flagship dictionary-encoded pipeline is value-identical to unencoded") {
    // the slimmed pipeline (long conv keys, byte role/tool through the
    // shuffle) must decode back to EXACTLY the rows the plain string-keyed
    // composition produces — pins the encode/decode round-trip
    val t = Transcripts.synthesize(spark, 60, megaEvery = 16, megaLen = 64)
    val snaps = Transcripts.snapshots(t)
    val slim = graft.run.Flagship.pipeline(t, snaps)
    val ref = graft.run.Flagship.pipelineUnencoded(t, snaps)
      .select(slim.columns.map(col): _*)

    val key = Seq(col("conv_id"), col("turn_idx"))
    val a = slim.orderBy(key: _*).collect()
    val b = ref.orderBy(key: _*).collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"\n$x\n!=\n$y") }
  }
}
