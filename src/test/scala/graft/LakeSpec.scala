package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.lake.{CheckpointedJob, IcebergLite}

class LakeSpec extends GraftSuite {
  import spark.implicits._

  test("iceberg-lite: write, snapshot versioning, row counts, read back") {
    val root = Files.createTempDirectory("lake").toString
    val df = (1 to 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val snap = IcebergLite.writeTable(df, root, xxhash64(col("id")), 8, "test write")
    assert(snap.version == 1)
    assert(snap.partitions.values.map(_.rows).sum == 100L)
    assert(snap.lineage == Seq("test write"))
    val back = IcebergLite.readTable(spark, root)
    assert(back.count() == 100L)
    assert(back.select("id").as[Long].collect().sorted.sameElements(1L to 100L))
    // second commit bumps version, merges partitions
    val snap2 = IcebergLite.commit(root,
      Seq(IcebergLite.PartitionMeta(99, 5, 10, 0L)), Seq("manual"))
    assert(snap2.version == 2 && snap2.partitions.contains(99))
    assert(IcebergLite.readSnapshot(root).get.partitions.size == 9)
  }

  test("checkpointed job: kill mid-run, resume processes only the rest") {
    val root = Files.createTempDirectory("ckpt").toString
    val processed = scala.collection.mutable.ArrayBuffer.empty[Int]
    def runAll(failAt: Option[Int]): Either[Throwable, Int] = {
      val job = new CheckpointedJob(root, "job1")
      try {
        var n = 0
        for (b <- 0 until 6) {
          if (job.runBucket(b) {
            if (failAt.contains(b)) throw new RuntimeException("killed")
            processed += b
            100L + b
          }) n += 1
        }
        Right(n)
      } catch { case t: Throwable => Left(t) }
    }
    // first run dies at bucket 3
    assert(runAll(Some(3)).isLeft)
    assert(processed.toSeq == Seq(0, 1, 2))
    assert(new CheckpointedJob(root, "job1").doneBuckets == Set(0, 1, 2))
    // resume: buckets 0-2 are NOT re-processed; 3-5 run
    val res = runAll(None)
    assert(res == Right(3))
    assert(processed.toSeq == Seq(0, 1, 2, 3, 4, 5)) // each exactly once
    val snap = IcebergLite.readSnapshot(root).get
    assert(snap.partitions.keySet == Set(0, 1, 2, 3, 4, 5))
    assert(snap.partitions(4).rows == 104L)
    // metrics JSONL has one line per processed bucket
    val metrics = Files.readAllLines(
      java.nio.file.Paths.get(root, "meta", "metrics.jsonl"))
    assert(metrics.size == 6)
    assert(metrics.get(0).contains("\"rowsPerSec\""))
  }

  test("Cdc.diff: add/remove/change/unchanged truth table incl. null transitions") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.lake.Cdc
    val oldV = Seq(
      (1L, Some("a"), Some(1.0)),   // unchanged
      (2L, Some("b"), Some(2.0)),   // changed value
      (3L, Some("c"), None),        // null -> value = changed
      (4L, Some("d"), Some(4.0)),   // removed
      (6L, None, Some(6.0))         // null stays null = unchanged
    ).toDF("k", "u", "v")
    val newV = Seq(
      (1L, Some("a"), Some(1.0)),
      (2L, Some("b"), Some(2.5)),
      (3L, Some("c"), Some(3.0)),
      (5L, Some("e"), Some(5.0)),   // added
      (6L, None, Some(6.0))
    ).toDF("k", "u", "v")
    val got = Cdc.diff(oldV, newV, Seq("k"), Seq("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "added"))
    val all = Cdc.diff(oldV, newV, Seq("k"), Seq("u", "v"),
      includeUnchanged = true)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(all(1L) == "unchanged" && all(6L) == "unchanged" && all.size == 6)
    // null sentinel is distinct from the empty string and from "null" text
    val o2 = Seq((1L, Some(""))).toDF("k", "v")
    val n2 = Seq((1L, Option.empty[String])).toDF("k", "v")
    assert(Cdc.diff(o2, n2, Seq("k"), Seq("v")).head().getString(1) == "changed")
  }
}
