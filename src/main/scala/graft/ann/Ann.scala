package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, per the scale doctrine:
  *  - [[bruteTopK]]: exact cosine top-k. The join is blocked (queries ×
  *    corpus) — correct baseline, O(|Q|·|C|); use only when one side is
  *    small or as the verifier of the approximate path.
  *  - [[lshTopK]]: random-hyperplane sign buckets (deterministic LCG
  *    hyperplanes — reproducible anywhere, no RNG state), candidates only
  *    within matching buckets ± multi-probe, exact rerank inside buckets.
  *    At 100 TB the bucket join replaces the full cross product.
  *
  * All vector math is higher-order array functions (zip_with/aggregate) —
  * no UDFs, whole-stage codegen.
  */
object Ann {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product — same summation order as the SQL oracle. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * LCG over the flattened index, shifted to [-0.5, 0.5). Same closed form
    * generates the oracle SQL — no shared RNG state needed.
    */
  def planeComponent(plane: Int, dim: Column): Column = {
    val idx = lit(plane.toLong * 64L) + dim
    (pmod(idx * 1103515245L + 12345L, lit(1L << 31)).cast("double") /
      lit((1L << 31).toDouble)) - 0.5
  }

  /** Sign-bucket key: bit p = 1 iff dot(v, plane_p) > 0. */
  def signBucket(v: Column, planes: Int): Column =
    (0 until planes).map { p =>
      val d = aggregate(
        zip_with(v, sequence(lit(0), size(v) - 1),
          (x, i) => x * planeComponent(p, i.cast("long"))),
        lit(0.0), _ + _)
      when(d > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine top-k: for each query row, the k nearest corpus rows.
    * Ties broken by corpus id for full determinism; scores rounded before
    * ranking so cross-engine float noise cannot flip the order.
    */
  def bruteTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame, // (cid, vec)
      k: Int,
      roundTo: Int = 6
  ): DataFrame = {
    val q = queries.select(col("qid"), toDouble(col("vec")).as("qv"))
    val c = corpus.select(col("cid"), toDouble(col("vec")).as("cv"))
    val scored = q.crossJoin(c)
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), roundTo).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: candidates share a sign-bucket with the
    * query (plus optional multi-probe), exact cosine rerank within
    * candidates.
    *
    * @param probes number of 1-bit-flip probe buckets per query (0 = exact
    *               bucket only). Probing the `probes` nearest buckets
    *               recovers neighbors that fall across a single hyperplane —
    *               recall improves at the cost of `probes+1`× candidate
    *               fan-out, still never a cross product. Probe keys are
    *               distinct by construction (bkey ^ 2^p), so a candidate can
    *               match at most one probe — no dedup pass needed.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      planes: Int = 6,
      roundTo: Int = 6,
      probes: Int = 0
  ): DataFrame = {
    require(probes <= planes, "cannot probe more bits than planes")
    val q0 = queries.select(col("qid"), toDouble(col("vec")).as("qv"))
      .withColumn("bkey", signBucket(col("qv"), planes))
    val q =
      if (probes <= 0) q0
      else q0.select(col("qid"), col("qv"),
        explode(array((col("bkey") +: (0 until probes).map(p =>
          col("bkey").bitwiseXOR(lit(1L << p)))): _*)).as("bkey"))
    val c = corpus.select(col("cid"), toDouble(col("vec")).as("cv"))
      .withColumn("bkey", signBucket(col("cv"), planes))
    val scored = q.join(c, Seq("bkey"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), roundTo).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
