package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streams

class StreamingSpec extends GraftSuite {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  test("session_window sessionization matches the batch gap semantics") {
    val rows = Seq(
      ("a", ts(0)), ("a", ts(100)), ("a", ts(2000)), // gap > 1800 -> split
      ("b", ts(50))
    ).toDF("key", "ts")
    val out = Streams.gapSessions(rows, "key", "ts", "1800 seconds")
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_turns")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(out("a") == Seq(1L, 2L)) // sessions of 2 and 1 turns
    assert(out("b") == Seq(1L))
  }

  test("streaming execution: memory source -> session agg -> memory sink") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val sessions = Streams.gapSessions(
      Streams.withWatermark(input.toDF().toDF("key", "ts"), "ts", "0 seconds"),
      "key", "ts", "1800 seconds")
    // data must be added BEFORE start: AvailableNow snapshots the available
    // offsets at query start, so later addData may be silently skipped (a
    // race that shows up as an empty sink)
    input.addData(("a", ts(0)), ("a", ts(100)), ("a", ts(5000)), ("b", ts(10)))
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sess_out").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_turns")))
    assert(got.count(_._1 == "a") == 2) // two sessions for a
    assert(got.filter(_._1 == "a").map(_._2).sorted.sameElements(Array(1L, 2L)))
  }

  test("windowed counts (sliding) over event time") {
    val rows = Seq(("a", ts(0)), ("a", ts(30)), ("a", ts(90)))
      .toDF("key", "ts")
    val out = Streams.windowedCounts(rows, "key", "ts", "60 seconds", "60 seconds")
      .collect().map(_.getAs[Long]("n")).sorted
    assert(out.sameElements(Array(1L, 2L)))
  }

  test("streaming as-of enrich: stateful point-in-time join over two streams") {
    import graft.streaming.StreamingAsOf
    import graft.streaming.StreamingAsOf.{Enriched, StreamSnap, StreamTurn}
    implicit val sqlCtx = spark.sqlContext
    val turns = MemoryStream[StreamTurn]
    val snaps = MemoryStream[StreamSnap]
    val out = StreamingAsOf.enrich(turns.toDS(), snaps.toDS())
    // default trigger (not AvailableNow): the query must stay alive across
    // the two addData phases so state carries between micro-batches
    val q = out.writeStream
      .format("memory").queryName("asof_out")
      .outputMode("append")
      .start()
    // phase 1: snapshot v1 at t=100 lands in state
    snaps.addData(StreamSnap("c1", ts(100), 10L, Seq(1.0)))
    q.processAllAvailable()
    // phase 2: turns — t=50 predates v1 (event-time guard → null, even
    // though state already holds v1!), t=100 equal-ts inclusive, t=150 after
    turns.addData(
      StreamTurn("c1", 1, ts(50)), StreamTurn("c1", 2, ts(150)),
      StreamTurn("c1", 3, ts(100)))
    q.processAllAvailable()
    // phase 3: another turn still sees v1 (state carried across batches)
    turns.addData(StreamTurn("c1", 4, ts(180)))
    q.processAllAvailable()
    // phase 4: newer snapshot v2 at t=200, then a later turn sees v2
    snaps.addData(StreamSnap("c1", ts(200), 20L, Seq(2.0)))
    q.processAllAvailable()
    turns.addData(StreamTurn("c1", 5, ts(250)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("asof_out").as[Enriched].collect()
      .map(e => e.turn_idx -> Option(e.f_vec).map(_.head)).toMap
    assert(got(1L).isEmpty, "turn before any admissible snapshot must be null")
    assert(got(3L).contains(1.0), "equal-ts snapshot applies (inclusive bound)")
    assert(got(2L).contains(1.0))
    assert(got(4L).contains(1.0), "state carries v1 across micro-batches")
    assert(got(5L).contains(2.0), "newer snapshot supersedes")
  }

  test("streaming simhash dedup: drops in-horizon near-dups, evicts state past watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.dedupSimhashStream(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "100 seconds")
    val q = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .start()
    // batch 1: an exact near-dup pair (identical token multiset → identical
    // simhash) + one distinct doc
    input.addData(
      (1L, "alpha beta gamma", ts(0)),
      (2L, "alpha beta gamma", ts(10)),
      (3L, "omega psi chi", ts(20)))
    q.processAllAvailable()
    // batch 2: another dup inside the horizon (dropped) and a far-future doc
    // that advances the watermark to 10000-100 = 9900, evicting old sigs
    input.addData(
      (4L, "alpha beta gamma", ts(50)),
      (5L, "totally different words", ts(10000)))
    q.processAllAvailable()
    // batch 3: the same content again, with event time past the advanced
    // watermark and its original signature evicted -> SURVIVES (the bounded
    // -state trade documented on dedupSimhashStream)
    input.addData((6L, "alpha beta gamma", ts(9950)))
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("dedup_out").collect()
      .map(_.getAs[Long]("doc_id")).sorted
    // which of the two in-batch duplicates (1 or 2) survives is operator-
    // internal; the contract is: exactly one of them, and 4 is dropped
    assert(kept.length == 4, s"expected 4 survivors, got ${kept.mkString(",")}")
    assert(kept.count(Set(1L, 2L)) == 1, "exactly one of the batch-1 dups survives")
    assert(!kept.contains(4L), "in-horizon duplicate must be dropped")
    assert(Seq(3L, 5L, 6L).forall(kept.contains),
      s"distinct + post-eviction docs must survive, got ${kept.mkString(",")}")
  }

  test("incremental dedup parity: batch fold == streaming exact dedup over the same 3 batches") {
    import org.apache.spark.sql.functions._
    import graft.text.Dedup
    // the daily-ingest shapes now coexist: dedupIncremental (batch) and
    // dedupExactStream (live). Replaying the SAME 3-batch corpus through
    // both must admit the same ids inside the watermark horizon. Fixture
    // has no intra-batch dups (whose survivor choice is arrival-order
    // internal to the streaming op) and no near-dups at the 0.7 threshold,
    // so both criteria coincide on exact-content identity.
    val b1 = Seq((1L, "alpha beta gamma delta"), (2L, "omega psi chi phi"))
      .toDF("doc_id", "text")
    val b2 = Seq((4L, "alpha beta gamma delta"), // exact dup of corpus doc 1
      (5L, "nova quasar pulsar star")).toDF("doc_id", "text")
    val b3 = Seq((6L, "omega psi chi phi"), // exact dup of corpus doc 2
      (7L, "lorem ipsum dolor sit"),
      (8L, "nova quasar pulsar star")) // exact dup of batch-2 admission
      .toDF("doc_id", "text")
    val all = b1.unionByName(b2).unionByName(b3)
    val blk = lit(1)
    // batch fold: day 1 self-dedups; later days admit vs the growing corpus
    val a1 = Dedup.dedupDocs(b1, "doc_id", "text", blk)
      .as[Long].collect().toSet
    val c1 = all.where(col("doc_id").isin(a1.toSeq: _*))
    val a2 = a1 ++ Dedup.dedupIncremental(b2, c1, "doc_id", "text", blk)
      .as[Long].collect()
    val c2 = all.where(col("doc_id").isin(a2.toSeq: _*))
    val a3 = a2 ++ Dedup.dedupIncremental(b3, c2, "doc_id", "text", blk)
      .as[Long].collect()
    assert(a3 == Set(1L, 2L, 5L, 7L), s"batch fold admitted $a3")
    // streaming: same batches through dropDuplicatesWithinWatermark on the
    // content digest, horizon wider than the replay
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.dedupExactStream(
      input.toDF().toDF("doc_id", "text", "ts")
        .withColumn("__md5", md5(col("text"))),
      Seq("__md5"), "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("incpar_out")
      .outputMode("append").start()
    input.addData((1L, "alpha beta gamma delta", ts(10)),
      (2L, "omega psi chi phi", ts(20)))
    q.processAllAvailable()
    input.addData((4L, "alpha beta gamma delta", ts(110)),
      (5L, "nova quasar pulsar star", ts(120)))
    q.processAllAvailable()
    input.addData((6L, "omega psi chi phi", ts(210)),
      (7L, "lorem ipsum dolor sit", ts(220)),
      (8L, "nova quasar pulsar star", ts(230)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("incpar_out").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamed == a3,
      s"stream admitted $streamed, batch fold admitted $a3 — must agree in-horizon")
  }

  test("incremental dedup parity, NEAR path: streaming simhash dedup == batch near anti-join") {
    import org.apache.spark.sql.functions._
    import graft.text.Dedup
    // The near half of daily ingest: near-dups here are whitespace variants
    // — token-identical (so the 64-bit SimHash signatures are EQUAL and
    // the streaming signature-key dedup fires) AND shingle-Jaccard ≥ 0.7
    // (so dedupIncremental's near anti-join fires) while their md5 digests
    // DIFFER (the exact path cannot catch them). Contract within the
    // horizon: identical admitted sets; the documented residual delta is
    // keeper CHOICE (streaming keeps first arrival, batch keeps min id) —
    // fixture ids arrive in ascending order so the criteria coincide.
    val b1 = Seq((1L, "alpha beta gamma delta"), (2L, "omega psi chi phi"))
      .toDF("doc_id", "text")
    val b2 = Seq((4L, "alpha beta gamma delta "), // trailing space: near-dup of 1
      (5L, "nova quasar pulsar star")).toDF("doc_id", "text")
    val b3 = Seq((6L, " omega psi chi phi"), // leading space: near-dup of 2
      (7L, "lorem ipsum dolor sit"),
      (8L, "nova  quasar pulsar star")) // inner double space: near-dup of 5
      .toDF("doc_id", "text")
    val all = b1.unionByName(b2).unionByName(b3)
    val blk = lit(1)
    val a1 = Dedup.dedupDocs(b1, "doc_id", "text", blk).as[Long].collect().toSet
    val c1 = all.where(col("doc_id").isin(a1.toSeq: _*))
    val a2 = a1 ++ Dedup.dedupIncremental(b2, c1, "doc_id", "text", blk)
      .as[Long].collect()
    val c2 = all.where(col("doc_id").isin(a2.toSeq: _*))
    val a3 = a2 ++ Dedup.dedupIncremental(b3, c2, "doc_id", "text", blk)
      .as[Long].collect()
    assert(a3 == Set(1L, 2L, 5L, 7L), s"batch fold admitted $a3")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val out = Streams.dedupSimhashStream(
      input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", "1 hour")
    val q = out.writeStream.format("memory").queryName("nearpar_out")
      .outputMode("append").start()
    input.addData((1L, "alpha beta gamma delta", ts(10)),
      (2L, "omega psi chi phi", ts(20)))
    q.processAllAvailable()
    input.addData((4L, "alpha beta gamma delta ", ts(110)),
      (5L, "nova quasar pulsar star", ts(120)))
    q.processAllAvailable()
    input.addData((6L, " omega psi chi phi", ts(210)),
      (7L, "lorem ipsum dolor sit", ts(220)),
      (8L, "nova  quasar pulsar star", ts(230)))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("nearpar_out").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamed == a3,
      s"stream admitted $streamed, batch near fold admitted $a3 — must agree in-horizon")
  }

  test("curation parity: streaming gates+dedup+split == batch curate keep set") {
    import org.apache.spark.sql.functions._
    import graft.text.Curation
    val g = Curation.Gates(minTokens = 3, maxTokens = 100, dupN = 2,
      maxDupFraction = 0.5, minEntropy = 2.0, langs = Set("en"))
    val rows = Seq(
      (1L, "en", "alpha beta gamma delta"),   // passes every gate
      (2L, "en", "xx"),                       // fails length
      (3L, "de", "omega psi chi phi"),        // fails language
      (4L, "en", "aaaa aaaa aaaa aaaa aaaa"), // fails entropy + repetition
      (5L, "en", "alpha beta gamma delta"),   // exact dup of doc 1
      (6L, "en", "nova quasar pulsar star"))  // passes
    val batch = Curation.curate(rows.toDF("doc_id", "lang", "text"),
      "doc_id", "text", "lang", g)
    val batchKept = batch.where(col("keep")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(batchKept.keySet === Set(1L, 6L))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val out = Streams.curateStream(
      input.toDF().toDF("doc_id", "lang", "text", "ts"),
      "doc_id", "text", "lang", "ts", g, "1 hour")
    val q = out.writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    // id order = arrival order, so first-arrival == min-id on the dup pair
    input.addData(rows.take(3).map(r => (r._1, r._2, r._3, ts(r._1 * 10))))
    q.processAllAvailable()
    input.addData(rows.drop(3).map(r => (r._1, r._2, r._3, ts(r._1 * 10))))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curate_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(streamed === batchKept,
      s"stream admitted $streamed, batch kept $batchKept — gates and split must agree")
  }

  test("audit parity: close-on-idle streaming audit == batch TranscriptAudit") {
    import org.apache.spark.sql.functions._
    import graft.streaming.StreamingAudit
    import graft.streaming.StreamingAudit.{AuditRow, AuditTurn}
    import graft.temporal.TranscriptAudit
    // conv a spans two micro-batches (state must carry); conv b is a
    // single turn; both contain the gate's defect shapes (role repeat,
    // empty + null text, exact-ts tie)
    // (timestamps start away from epoch 0 — a row AT the initial watermark
    // is filtered as late, which would silently shrink conv a)
    val closed = Seq(
      AuditTurn("a", ts(100), 1L, "user", "hi"),
      AuditTurn("a", ts(105), 2L, "assistant", ""),
      AuditTurn("a", ts(105), 3L, "assistant", null),
      AuditTurn("a", ts(160), 4L, "user", "bye"),
      AuditTurn("b", ts(130), 5L, "tool", "x"))
    val batch = TranscriptAudit.audit(
      closed.toDF(), "conv_id", Seq("ts", "tie"), "role", "ts", col("text"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6),
        r.getString(7))).toMap

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[AuditTurn]
    val out = StreamingAudit.auditStream(input.toDS(), "0 seconds",
      java.time.Duration.ofSeconds(120))
    val q = out.writeStream.format("memory").queryName("audit_out")
      .outputMode("append").start()
    input.addData(closed.take(3))
    q.processAllAvailable()
    input.addData(closed.drop(3))
    q.processAllAvailable()
    // far-future turn of ANOTHER conv advances the watermark past
    // a/b's idle horizon (160+120 < 10000); the nudge batch lets the
    // timeout fire under the advanced watermark
    input.addData(Seq(AuditTurn("c", ts(10000), 6L, "user", "zzz")))
    q.processAllAvailable()
    input.addData(Seq(AuditTurn("c", ts(10001), 7L, "user", "zzz2")))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("audit_out").as[AuditRow].collect()
      .map(r => r.conv_id -> (r.n_turns, r.n_role_repeats, r.n_empty_text,
        r.n_ts_ties, r.span_us, r.first_role, r.last_role)).toMap
    assert(streamed.keySet == Set("a", "b"),
      s"idle convs close, live conv c stays open — got ${streamed.keySet}")
    for (k <- Seq("a", "b"))
      assert(streamed(k) == batch(k),
        s"conv $k: stream ${streamed(k)} != batch ${batch(k)}")
  }

  test("curation parity under pre-clean: markup-only duplicates dedup identically") {
    import org.apache.spark.sql.functions._
    import graft.text.Curation
    val g = Curation.Gates(minTokens = 3, stripMarkup = true, normalize = true)
    val rows = Seq(
      (1L, "en", "<p>alpha beta gamma delta</p>"),
      // markup-only variant of doc 1: a duplicate ONLY because the digest
      // runs on cleaned text — the raw-md5 bug this spec pins against
      (2L, "en", "<div class=\"x\">alpha   beta gamma delta</div>"),
      (3L, "en", "<script>var x;</script>nova quasar pulsar star"))
    val batch = Curation.curate(rows.toDF("doc_id", "lang", "text"),
      "doc_id", "text", "lang", g)
    val batchKept = batch.where(col("keep")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(batchKept.keySet === Set(1L, 3L))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, String, Timestamp)]
    val out = Streams.curateStream(
      input.toDF().toDF("doc_id", "lang", "text", "ts"),
      "doc_id", "text", "lang", "ts", g, "1 hour")
    val q = out.writeStream.format("memory").queryName("curate_clean_out")
      .outputMode("append").start()
    input.addData(rows.map(r => (r._1, r._2, r._3, ts(r._1 * 10))))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("curate_clean_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    assert(streamed === batchKept,
      s"stream admitted $streamed, batch kept $batchKept under pre-clean")
  }

  test("rate-anomaly parity: streaming z-scores == batch rateSpikes on the same events") {
    import graft.streaming.StreamingAnomaly
    import graft.streaming.StreamingAnomaly.RateEvent
    implicit val sqlCtx = spark.sqlContext

    // two sources, minute buckets: A steady-with-jitter then a burst;
    // B constant (never scores). Final lone event only advances the
    // watermark so every scored bucket seals.
    def mts(minute: Int, sec: Int = 0): Timestamp =
      Timestamp.valueOf(f"2026-04-01 10:$minute%02d:$sec%02d")
    val events =
      (0 until 10).flatMap { m =>
        val nA = if (m == 8) 40 else 5 + (m % 2)
        (0 until nA).map(k => RateEvent("A", mts(m, k % 60))) ++
          (0 until 4).map(k => RateEvent("B", mts(m, k)))
      } :+ RateEvent("Z", mts(30)) // watermark pusher

    // batch reference
    val batch = graft.stats.Anomaly.rateSpikes(
        events.toDF(), tsCol = "ts", groupCol = "src",
        bucket = "minute", window = 7, minHist = 3, zThreshold = 3.0)
      .collect().map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
      .filter(_._1 != "Z").sortBy(x => (x._1, x._2.getTime)).toSeq

    val input = MemoryStream[RateEvent]
    input.addData(events)
    val q = StreamingAnomaly.rateSpikesStream(input.toDS(),
        bucketMillis = 60000L, window = 7, minHist = 3,
        zThreshold = 3.0, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("rate_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("rate_out").collect()
      .map(r => (r.getString(0), r.getTimestamp(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getBoolean(4)))
      .filter(_._1 != "Z").sortBy(x => (x._1, x._2.getTime)).toSeq

    // the stream seals every bucket strictly older than the watermark; the
    // batch also scores the final (unsealed-in-stream) buckets — compare on
    // the sealed horizon
    val sealedKeys = stream.map(x => (x._1, x._2)).toSet
    val batchSealed = batch.filter(x => sealedKeys.contains((x._1, x._2)))
    assert(stream.nonEmpty, "stream must emit sealed buckets")
    assert(stream == batchSealed,
      s"stream\n${stream.mkString("\n")}\nbatch\n${batchSealed.mkString("\n")}")
    // the burst bucket is in the sealed set and flagged identically
    assert(stream.exists(x => x._3 == 40L && x._5), "burst must flag in-stream")
  }
}
