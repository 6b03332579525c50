package graft.run

import org.apache.spark.sql.functions._

/** Round-5 verdict task #4: multi-day indexed-ingest evidence — the
  * 100 TB story's central claim ("corpus text prepped once EVER") run as
  * an actual 3-day loop against a persisted index:
  *
  *   day 0: corpus slice written as the dedup index (+ Bloom blobs);
  *   day N: batch N admitted via `dedupIncrementalBloomIndexed` (reads
  *          signatures + blobs, shingles ONLY the batch), its admitted
  *          rows appended to the index, blobs refreshed off the
  *          signature table;
  *   check: every day's admissions == a from-scratch `dedupIncremental`
  *          against the corpus-so-far (slice 0 + admitted days < N).
  *
  * Prints per-day wall times + the equivalence verdict; recorded in
  * BASELINE.md §8. The same 3-day equivalence is spec-pinned in
  * Round6Spec at sf0.001.
  */
object IngestLoop {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val root = if (args.length > 1) args(1)
      else "/dev/shm/graft-ingest-loop"
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.text.Dedup
    scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
    docs.count()
    def slice(d: Long) = docs.where(pmod(col("doc_id"), lit(4L)) === d)

    // day 0: the standing corpus becomes the index, prepped ONCE
    val t0 = System.nanoTime()
    Dedup.writeIndex(slice(0), "doc_id", "text", col("lang"), 3, root,
      nBuckets = 16, bloomFpp = Some(0.03))
    println(f"[ingest] day0 index build: ${(System.nanoTime() - t0) / 1e9}%.2f s")

    var admittedSoFar = Seq.empty[org.apache.spark.sql.DataFrame]
    for (day <- 1 to 3) {
      val batch = slice(day.toLong)
      val tD = System.nanoTime()
      // ids collected BEFORE the append: the append write to the index
      // path recaches/invalidates any plan still reading it, and the
      // admission decision must be fixed at ingest time anyway
      val viaIndex = Dedup.withCache {
        Dedup.dedupIncrementalBloomIndexed(batch, root,
          "doc_id", "text", col("lang"), 3, 0.7)
          .collect().map(_.getLong(0)).toSet
      }
      val admDocs = batch.where(col("doc_id").isin(viaIndex.toSeq: _*))
      Dedup.appendIndex(admDocs, "doc_id", "text", col("lang"), 3, root,
        nBuckets = 16, bloomFpp = Some(0.03))
      val wall = (System.nanoTime() - tD) / 1e9
      println(f"[ingest] day$day: admitted=${viaIndex.size} wall=${wall}%.2f s " +
        "(admit + append + blob refresh)")

      // equivalence: from-scratch admission against the corpus-so-far
      val corpusSoFar = admittedSoFar.foldLeft(slice(0))(_ unionByName _)
      val recomputed = Dedup.withCache {
        Dedup.dedupIncremental(batch, corpusSoFar,
          "doc_id", "text", col("lang"), 3, 0.7)
          .collect().map(_.getLong(0)).toSet
      }
      require(viaIndex == recomputed,
        s"day $day divergence: ${viaIndex.size} vs ${recomputed.size}")
      println(s"[ingest] day$day admissions == monolithic recompute " +
        s"(${viaIndex.size} ids)")
      admittedSoFar :+= admDocs
    }
    println("[ingest] 3-day indexed loop == monolithic recompute: OK")
    spark.stop()
  }
}
