package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.stats.Sketch
import graft.temporal.{AsOf, Intervals, ToolCalls}
import graft.text.TextHash

/** Specs for the SCD-2 interval join, count-min sketch, winnowing
  * fingerprints, and JSON tool-call audit operators.
  */
class IntervalSketchSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("intervalJoin on derived intervals ≡ asofJoin on the raw snapshots") {
    // snapshots: per-key version history; facts probe at scattered times
    val snaps = Seq(
      ("u1", ts("2026-01-01 00:00:00"), 10.0),
      ("u1", ts("2026-01-03 00:00:00"), 30.0),
      ("u1", ts("2026-01-05 00:00:00"), 50.0),
      ("u2", ts("2026-01-02 00:00:00"), 20.0)
    ).toDF("k", "snap_ts", "v")
    val facts = Seq(
      (1L, "u1", ts("2025-12-31 00:00:00")), // pre-history -> null
      (2L, "u1", ts("2026-01-01 00:00:00")), // inclusive start
      (3L, "u1", ts("2026-01-02 23:59:59")),
      (4L, "u1", ts("2026-01-03 00:00:00")), // exactly at version 2
      (5L, "u1", ts("2026-01-09 00:00:00")), // open-ended tail
      (6L, "u2", ts("2026-01-02 00:00:01")),
      (7L, "u3", ts("2026-01-02 00:00:00"))  // unknown key -> null
    ).toDF("fid", "k", "ts")

    val dim = Intervals.validityIntervals(snaps, "k", "snap_ts")
    val viaInterval = Intervals.intervalJoin(
        facts, dim, key = "k", factTs = "ts",
        startCol = "eff_start", endCol = "eff_end", payload = Seq("v"))
      .select(col("fid"), col("v"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap

    val viaAsof = AsOf.asofJoin(
        facts, snaps.withColumnRenamed("v", "av"), key = "k",
        leftTs = "ts", rightTs = "snap_ts", tiebreak = "av",
        payload = Seq("av"))
      .select(col("fid"), col("av"))
      .collect().map(r => r.getLong(0) ->
        Option(r.get(1)).map(_.asInstanceOf[Double])).toMap

    assert(viaInterval == viaAsof, "two point-in-time paths must agree")
    assert(viaInterval(1L).isEmpty && viaInterval(7L).isEmpty)
    assert(viaInterval(2L).contains(10.0), "validity start is inclusive")
    assert(viaInterval(4L).contains(30.0), "new version wins at its own ts")
    assert(viaInterval(5L).contains(50.0), "open-ended current version")
    // left join over disjoint intervals is row-preserving, never multiplying
    assert(Intervals.intervalJoin(facts, dim, "k", "ts",
      "eff_start", "eff_end", Seq("v")).count() == facts.count())
    assert(Intervals.intervalJoin(facts, dim, "k", "ts",
      "eff_start", "eff_end", Seq("v"), joinType = "inner").count() == 5)
  }

  test("countMin never undercounts; heavyHitters thresholds on estimates") {
    // zipf-ish: key k appears 2^(10-k) times -> exact counts are powers of 2
    val rows = (0 until 10).flatMap(k => Seq.fill(1 << (10 - k))(s"key$k"))
    val df = rows.toDF("k")
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }

    val est = Sketch.heavyHitters(df, col("k"), depth = 4, width = 64,
        threshold = 256L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(est.length == 10)
    est.foreach { case (k, e, heavy) =>
      assert(e >= exact(k), s"CMS undercounted $k: $e < ${exact(k)}")
      assert(heavy == (e >= 256L))
    }
    // the true heavies can never be missed (no undercount => no false neg)
    val heavies = est.filter(_._3).map(_._1).toSet
    exact.filter(_._2 >= 256L).keys.foreach(k =>
      assert(heavies.contains(k), s"true heavy hitter $k missed"))
    // sketch is constant-size: at most depth*width counters
    assert(Sketch.countMin(df, col("k"), 4, 64).count() <= 4L * 64L)
  }

  test("winnow: SWA guarantee, boundary rules, density") {
    val k = 8; val w = 4
    val shared = "the quick brown fox jumps over" // len 30 >= k+w-1 = 11
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"zzzz yyyy $shared"),
      (3L, "completely unrelated content here"),
      (4L, "short"),            // len < k  -> no fingerprints
      (5L, "ninechars")         // 9 chars -> 2 k-grams < w -> 1 fp (global min)
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextHash.winnow(col("text"), k, w).as("fp"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Long](1).toSet).toMap

    // guarantee: shared substring of length >= k+w-1 => shared fingerprint
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "docs sharing a 30-char substring must share a fingerprint")
    assert(fps(4L).isEmpty, "doc shorter than k selects nothing")
    assert(fps(5L).size == 1, "fewer than w k-grams -> one global-min fp")
    // the single fp IS the min of all k-gram hashes
    val allH = docs.where(col("doc_id") === 5L)
      .select(array_min(transform(
        sequence(lit(1), length(col("text")) - (k - 1)),
        i => TextHash.polyHash(col("text").substr(i, lit(k))))))
      .head().getLong(0)
    assert(fps(5L).head == allH)
    // density: selected set is a strict subsample of the k-gram hashes
    val full1 = docs.where(col("doc_id") === 1L)
      .select(explode(transform(
        sequence(lit(1), length(col("text")) - (k - 1)),
        i => TextHash.polyHash(col("text").substr(i, lit(k))))))
      .distinct().count()
    assert(fps(1L).size < full1, "winnowing must subsample the k-gram set")
  }

  test("hllDistinct: accuracy within the m=64 error band; parallelism-invariant") {
    // three groups of known cardinality; values deliberately collide across
    // groups (the sketch is per-group)
    val rows = (0 until 2000).map(i => ("big", s"v${i % 1700}")) ++
      (0 until 500).map(i => ("mid", s"v${i % 230}")) ++
      (0 until 40).map(i => ("small", s"v${i % 17}"))
    val df = rows.toDF("g", "k")
    def run(parts: Int): Map[String, Double] =
      graft.stats.Sketch.hllDistinct(df.repartition(parts), Seq("g"), col("k"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val est = run(4)
    // 1.04/sqrt(64) ~= 13% standard error; allow 3 sigma
    val exact = Map("big" -> 1700.0, "mid" -> 230.0, "small" -> 17.0)
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) <= 0.39 * n + 3,
        s"group $g: est ${est(g)} too far from $n")
    }
    assert(run(1) == est && run(13) == est,
      "HLL estimate must be bit-identical at any parallelism")
  }

  test("turn repair: merges runs, drops pre-anchor prefix, reindexes densely") {
    val t = Seq(
      // c1: boot noise, then user; assistant streamed as 3 rows; retry user
      ("c1", 1L, "system", "boot"),
      ("c1", 2L, "user", "hi"),
      ("c1", 3L, "assistant", "he"),
      ("c1", 4L, "assistant", "llo"),
      ("c1", 5L, "assistant", null),
      ("c1", 6L, "user", "q1"),
      ("c1", 7L, "user", "q1 again"),
      // c2: no user turn at all -> dropped whole
      ("c2", 1L, "system", "x"),
      ("c2", 2L, "assistant", "y")
    ).toDF("conv", "tid", "role", "txt")
    val out = graft.temporal.TranscriptRepair.repair(
        t, "conv", Seq("tid"), "role", col("txt"), anchorRole = "user")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.forall(_._1 == "c1"), "anchorless conversation must drop")
    val c1 = out.sortBy(_._2)
    assert(c1.map(x => (x._2, x._3, x._4, x._5)).toSeq == Seq(
      (0, "user", "hi", 1L),
      (1, "assistant", "he\nllo\n", 3L), // null text merges as empty
      (2, "user", "q1\nq1 again", 2L)))
  }

  test("auditArgs: malformed JSON and absent fields count as bad, never throw") {
    val df = Seq(
      ("c1", """{"k": 5, "other": "x"}"""),
      ("c1", """{"k": 7}"""),
      ("c1", """{"k": "not-a-number"}"""), // present but uncastable -> bad
      ("c1", """{"j": 1}"""),              // field absent -> bad
      ("c1", """{"k": 3"""),               // truncated JSON -> bad
      ("c2", """{"k": -2}""")
    ).toDF("conv", "props")
    val out = ToolCalls.auditArgs(df, "conv", col("props"), "k")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(out("c1") == ((5L, 3L, Some(12L), Some(7L))))
    assert(out("c2") == ((1L, 0L, Some(-2L), Some(-2L))))
  }

  test("rateSpikes: burst flags against trailing-only baseline; constant series never fires") {
    import graft.stats.Anomaly
    // source A: 10/day for 9 days with small jitter, then a 60-event burst;
    // source B: exactly 8/day (zero variance -> z null, never spikes)
    val rows =
      (1 to 10).flatMap { d =>
        val nA = if (d == 10) 60 else 10 + (d % 2) // jitter so var > 0
        Seq.fill(nA)(("A", ts(f"2026-02-$d%02d 05:00:00"))) ++
          Seq.fill(8)(("B", ts(f"2026-02-$d%02d 06:00:00")))
      }
    val out = Anomaly.rateSpikes(rows.toDF("src", "t"), "t", "src",
        bucket = "day", window = 7, minHist = 3, zThreshold = 3.0)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(10)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
          r.getBoolean(4)))).toMap

    val (cnt, z, spike) = out(("A", "2026-02-10"))
    assert(cnt == 60L && spike, s"burst must flag: z=$z")
    assert(z.get > 3.0)
    // driver replay: trailing 7 days (3..9) counts, sample std
    val hist = (3 to 9).map(d => (10 + (d % 2)).toDouble)
    val m = hist.sum / hist.size
    val sd = math.sqrt(hist.map(x => (x - m) * (x - m)).sum / (hist.size - 1))
    assert(math.abs(z.get - (60.0 - m) / sd) < 1e-4,
      s"z=${z.get} vs replay ${(60.0 - m) / sd}")
    // days 1-3 of A: insufficient history -> null z
    assert(out(("A", "2026-02-01"))._2.isEmpty)
    assert(out(("A", "2026-02-03"))._2.isEmpty) // frame has only 2 rows
    // constant series: zero variance -> null z, spike false everywhere
    (1 to 10).foreach { d =>
      val (c, zb, sb) = out(("B", f"2026-02-$d%02d"))
      assert(c == 8L && zb.isEmpty && !sb, s"B day $d: $zb $sb")
    }
    // normal A days never spike
    assert(!out(("A", "2026-02-09"))._3)
  }

  test("review fixes: null-role segments, HLL null keys, CDC null keys, payload guards") {
    import graft.lake.Cdc
    import graft.stats.{Anomaly, Sketch}
    import graft.temporal.{Intervals, TranscriptRepair}
    // null role opens its own segment — never merges into the prior turn
    val t = Seq(
      ("c", 1L, "user", "hi"),
      ("c", 2L, null.asInstanceOf[String], "crashed-write"),
      ("c", 3L, null.asInstanceOf[String], "crashed-write-2"),
      ("c", 4L, "user", "bye")
    ).toDF("conv", "tid", "role", "txt")
    val turns = TranscriptRepair.repair(t, "conv", Seq("tid"), "role",
        col("txt"), anchorRole = "user")
      .collect().map(r => (r.getInt(1), Option(r.getString(2)), r.getString(3)))
      .sortBy(_._1)
    assert(turns.toSeq == Seq(
      (0, Some("user"), "hi"),
      (1, None, "crashed-write\ncrashed-write-2"), // null run merges with itself
      (2, Some("user"), "bye")),
      s"got ${turns.toSeq}")

    // HLL: nulls are not a value (count-distinct semantics)
    val hd = Sketch.hllDistinct(
      Seq(("g", Option("a")), ("g", Option("b")), ("g", Option.empty[String]),
        ("h", Option.empty[String])).toDF("g", "k"),
      Seq("g"), col("k"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(!hd.contains("h"), "all-null group drops out like SQL GROUP BY")
    val hd2 = Sketch.hllDistinct(
      Seq(("g", "a"), ("g", "b")).toDF("g", "k"), Seq("g"), col("k"))
      .head().getDouble(1)
    assert(hd("g") == hd2, "null keys must not perturb the estimate")

    // CDC: identical null-keyed rows are unchanged, not removed+added
    val o = Seq((Option.empty[java.lang.Long], "x")).toDF("k", "v")
    assert(Cdc.diff(o, o, Seq("k"), Seq("v")).count() == 0)

    // interval join refuses ambiguous output columns
    val dim = Seq(("u", ts("2026-01-01 00:00:00"), 1.0))
      .toDF("k", "eff_start", "v")
      .withColumn("eff_end", lit(null).cast("timestamp"))
    val fact = Seq((1L, "u", ts("2026-01-02 00:00:00"), 9.9))
      .toDF("fid", "k", "ts", "v")
    intercept[IllegalArgumentException] {
      Intervals.intervalJoin(fact, dim, "k", "ts", "eff_start", "eff_end",
        payload = Seq("v")) // "v" exists on the fact side too
    }

    // anomaly sum-of-squares survives counts that overflow long squares
    // (3.1e9 events/bucket squared > Long.MaxValue) — decimal path stays
    // finite; here just assert big counts do not throw under ANSI
    val big = Anomaly.rateSpikes(
      Seq(("s", ts("2026-03-01 00:00:00"))).toDF("src", "t2"),
      "t2", "src")
    assert(big.count() == 1)
  }

  test("roleTransitions: exact counts, row-normalized rows sum to 1, null role is a state") {
    import graft.temporal.TranscriptStats
    val t = Seq(
      ("c1", 1L, "user"), ("c1", 2L, "assistant"), ("c1", 3L, "user"),
      ("c1", 4L, "assistant"), ("c1", 5L, "assistant"), // retry storm
      ("c2", 1L, "user"), ("c2", 2L, null.asInstanceOf[String]),
      ("c2", 3L, "assistant"),
      ("c3", 1L, "user") // single turn: no transition
    ).toDF("conv", "tid", "role")
    val out = TranscriptStats.roleTransitions(t, "conv", Seq("tid"), "role")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("user", "assistant")) == ((2L, 0.666667)))
    assert(out(("user", "<null>")) == ((1L, 0.333333)))
    assert(out(("assistant", "user")) == ((1L, 0.5)))
    assert(out(("assistant", "assistant")) == ((1L, 0.5)))
    assert(out(("<null>", "assistant")) == ((1L, 1.0)))
    assert(out.size == 5, s"unexpected transitions: ${out.keySet}")
    // per-prev rows normalize to 1
    out.keys.map(_._1).toSeq.distinct.foreach { prev =>
      val s = out.collect { case ((p, _), (_, pr)) if p == prev => pr }.sum
      assert(math.abs(s - 1.0) < 1e-9, s"$prev rows sum to $s")
    }
  }
}
