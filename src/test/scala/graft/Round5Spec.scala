package graft

import org.apache.spark.sql.functions._

/** Round-5 additions: persisted ingest Bloom sketches, shared prefix
  * frames, and the edge-behavior fixes from the round-4 advisory.
  */
class Round5Spec extends GraftSuite {
  import spark.implicits._

  test("bloom-from-index: persisted sketches drive ingest; admissions == dedupIncremental") {
    import graft.text.Dedup
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
    val corpus = docs.where(pmod(col("doc_id"), lit(5L)) =!= 0)
    val batch = docs.where(pmod(col("doc_id"), lit(5L)) === 0)
    val root = "/tmp/dedup_index_bloom_spec"
    scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    // index build persists BOTH sketches as snapshot blobs
    Dedup.writeIndex(corpus, "doc_id", "text", col("lang"), 3, root,
      nBuckets = 8, bloomFpp = Some(0.03))
    assert(graft.lake.IcebergLite.getBlob(root, "bloom-digest").exists(_.nonEmpty))
    assert(graft.lake.IcebergLite.getBlob(root, "bloom-shingle").exists(_.nonEmpty))
    // ingest consumes them: zero bloom builds, zero corpus text access
    // (the index has no text column — pinned by Round4Spec), admitted set
    // identical to the from-scratch path
    val viaIndex = Dedup.withCache {
      Dedup.dedupIncrementalBloomIndexed(batch, root,
        "doc_id", "text", col("lang"), 3, 0.7).as[Long].collect().toSet
    }
    val recomputed = Dedup.withCache {
      Dedup.dedupIncremental(batch, corpus,
        "doc_id", "text", col("lang"), 3, 0.7).as[Long].collect().toSet
    }
    assert(viaIndex == recomputed,
      s"indexed-bloom admissions must equal recomputed: ${viaIndex.size} vs ${recomputed.size}")
  }

  test("dedupIncrementalBloomIndexed refuses an index written without sketches") {
    import graft.text.Dedup
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet").limit(50)
    val root = "/tmp/dedup_index_nobloom_spec"
    scala.reflect.io.Directory(new java.io.File(root)).deleteRecursively()
    Dedup.writeIndex(docs, "doc_id", "text", col("lang"), 3, root, nBuckets = 4)
    val e = intercept[IllegalStateException] {
      Dedup.dedupIncrementalBloomIndexed(docs, root, "doc_id", "text", col("lang"))
    }
    assert(e.getMessage.contains("bloom"))
  }

  test("winnow: null text selects nothing (empty array), matching the shorter-than-k rule") {
    val df = Seq((1L, "abcdefghij"), (2L, null.asInstanceOf[String]), (3L, "ab"))
      .toDF("id", "text")
    val out = df.select(col("id"),
      graft.text.TextHash.winnow(col("text"), k = 4, w = 3).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L).nonEmpty, "long doc must fingerprint")
    assert(out(2L) != null && out(2L).isEmpty, "null text must select nothing")
    assert(out(3L) != null && out(3L).isEmpty, "short text must select nothing")
  }
}
