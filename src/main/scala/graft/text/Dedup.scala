package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication suite for large-scale training-data pipelines.
  *
  * Scale design notes (the 100 TB shapes):
  *  - exact dedup: one hash-groupBy shuffle keyed on a digest, never on the
  *    full text (shuffle payload = digest + id, not documents);
  *  - minhash LSH: candidate generation never compares all pairs — docs
  *    shuffle once per band (b small), buckets join only within band keys;
  *    the quadratic step is confined to same-bucket groups, and a bucket-size
  *    cap bounds the worst case (degenerate mega-buckets are dropped —
  *    standard LSH practice);
  *  - simhash: signature is one int64 per doc; near-dup candidates via
  *    banded chunks of the signature, verified by hamming distance;
  *  - verification joins re-fetch only candidate-pair payloads by id.
  */
object Dedup {

  /** Exact dedup: keep the row with the smallest `idCol` per distinct
    * `textCol`. Digest-keyed shuffle; returns kept ids + group sizes.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Candidate near-dup pairs via MinHash + LSH banding, verified with the
    * exact n-gram Jaccard of the pair. Returns (id_a, id_b, jaccard) with
    * id_a < id_b and jaccard >= threshold.
    *
    * @param blockCap drop degenerate buckets with more than this many docs
    */
  def minhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numHashes: Int = 8,
      bands: Int = 4,
      threshold: Double = 0.35,
      blockCap: Int = 64
  ): DataFrame = {
    val rows = numHashes / bands
    val withSig = df.select(
      col(idCol).as("id"),
      TextHash.shingleHashes(col(textCol), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("bkeys", TextHash.bandKeys(
        TextHash.minhashSig(col("sh"), numHashes), bands, rows))
    val buckets = withSig
      .select(col("id"), col("sh"), explode(col("bkeys")).as("bkey"))
    // prune degenerate buckets before the quadratic step
    val capped = buckets
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkey"))))
      .where(col("bsize") <= blockCap)
      .drop("bsize")
    val a = capped.select(col("bkey"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = capped.select(col("bkey"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextHash.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .distinct()
  }

  /** SimHash near-dup pairs: 16-bit signatures, candidates = equal signature
    * halves (two 8-bit bands), verified by hamming <= maxHamming.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      blockCap: Int = 256
  ): DataFrame = {
    val bits = 16
    val sig = df.select(col(idCol).as("id"),
      TextHash.simhash(col(textCol), bits).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(array(
        concat(lit("lo:"), pmod(col("sig"), lit(256L))),
        concat(lit("hi:"), (col("sig") / 256L).cast("long"))
      )).as("bkey"))
    val capped = banded
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkey"))))
      .where(col("bsize") <= blockCap).drop("bsize")
    val a = capped.select(col("bkey"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = capped.select(col("bkey"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextHash.hamming(col("sig_a"), col("sig_b")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Blocked exact n-gram Jaccard pairs: block by a cheap key, compare within
    * blocks only. The fully-general quadratic comparison is intentionally
    * not offered — at scale you always block first.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      blockKey: org.apache.spark.sql.Column,
      shingleN: Int = 3,
      threshold: Double = 0.3
  ): DataFrame = {
    val prepped = df.select(col(idCol).as("id"), blockKey.as("blk"),
      TextHash.shingleHashes(col(textCol), shingleN).as("sh"))
    val a = prepped.select(col("blk"), col("id").as("id_a"), col("sh").as("sh_a"))
    val b = prepped.select(col("blk"), col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("blk"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextHash.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding cosine near-dup pairs within LSH sign-buckets (see Ann). */
  def embeddingPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int = 8,
      threshold: Double = 0.95,
      blockCap: Int = 1024
  ): DataFrame = {
    val v = graft.ann.Ann.toDouble(col(vecCol))
    val bucketed = df.select(col(idCol).as("id"), v.as("v"))
      .withColumn("bkey", graft.ann.Ann.signBucket(col("v"), planes))
    val capped = bucketed
      .withColumn("bsize", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("bkey"))))
      .where(col("bsize") <= blockCap).drop("bsize")
    val a = capped.select(col("bkey"), col("id").as("id_a"), col("v").as("v_a"))
    val b = capped.select(col("bkey"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        graft.ann.Ann.cosine(col("v_a"), col("v_b")).as("cosine"))
      .where(col("cosine") >= threshold)
      .distinct()
  }
}
