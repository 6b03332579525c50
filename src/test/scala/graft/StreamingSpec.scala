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
    val q = sessions.writeStream
      .format("memory").queryName("sess_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    input.addData(("a", ts(0)), ("a", ts(100)), ("a", ts(5000)), ("b", ts(10)))
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
}
