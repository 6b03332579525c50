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
    scored.withColumn("rank", row_number().over(w).cast("long"))
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
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }

  /** IVF (inverted-file) coarse quantizer: `nCentroids` centroids trained by
    * a fixed number of Lloyd iterations, seeded deterministically (initial
    * centroids = the corpus rows with the `nCentroids` smallest
    * pmod(id·LCG) draws — no RNG state, same result at any parallelism).
    * Each iteration is ONE crossJoin-free pass: corpus × centroid
    * assignment uses a broadcast centroid array (driver-held, tiny) and a
    * groupBy mean — the standard scalable shape.
    */
  final case class IvfModel(centroids: Array[Array[Double]]) {
    def nList: Int = centroids.length
  }

  def ivfTrain(
      corpus: DataFrame, // (cid, vec)
      nCentroids: Int,
      iterations: Int = 5
  ): IvfModel = {
    val c = corpus.select(col("cid"), toDouble(col("vec")).as("cv"))
    // bound the id BEFORE the LCG multiply: raw cid·1103515245 overflows a
    // long under ANSI once ids pass ~8e9
    val seeded = c
      .withColumn("__draw", pmod(
        pmod(col("cid"), lit(2147483647L)) * 1103515245L + 12345L, lit(1L << 31)))
      .orderBy(col("__draw"), col("cid"))
      .limit(nCentroids)
      .select(col("cv"))
    var centroids = seeded.collect().map(_.getSeq[Double](0).toArray)
    var it = 0
    while (it < iterations) {
      it += 1
      val assigned = assignCentroid(c, centroids)
      val means = assigned
        .select(col("__list"), posexplode(col("cv")).as(Seq("__pos", "__x")))
        .groupBy(col("__list"), col("__pos"))
        .agg(avg(col("__x")).as("__m"))
        .groupBy(col("__list"))
        .agg(map_from_entries(collect_list(struct(col("__pos"), col("__m"))))
          .as("__mm"))
        .collect()
      val next = centroids.clone()
      means.foreach { r =>
        val li = r.getInt(0)
        val mm = r.getMap[Int, Double](1)
        next(li) = Array.tabulate(centroids(li).length)(i => mm(i))
      }
      centroids = next
    }
    IvfModel(centroids)
  }

  /** Past this many centroids, assignment/probing switches from literal
    * subexpressions to the [[graft.functions.NearestCentroids]] reference-
    * object kernel: the literal plan is O(nList·dim) expression NODES and
    * Catalyst analysis/codegen blows up at the list counts a real corpus
    * needs (4k-64k); the kernel's plan size is constant at any nList.
    * Both paths are IEEE-op-identical (AnnParitySpec pins it).
    */
  private[graft] val literalMaxCentroids = 16

  /** Nearest-centroid assignment — no shuffle, no join, no UDF: a single
    * projection either over centroid literals (small nList; fully
    * codegen-inlined) or over the constant-plan-size native kernel.
    */
  private def assignCentroid(df: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.length >= 2, "IVF needs at least two centroids")
    if (centroids.length <= literalMaxCentroids) assignCentroidLiteral(df, centroids)
    else df.withColumn("__list",
      element_at(
        graft.functions.NearestCentroids(col("cv"), centroids, 1, tieLargerIdx = false),
        1))
  }

  /** Literal-expression assignment (the small-nList fast path; also the
    * parity reference for the native kernel).
    */
  private[graft] def assignCentroidLiteral(
      df: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    val sims = centroids.map { ctr =>
      val carr = array(ctr.map(lit(_)): _*)
      dot(col("cv"), carr) / (norm(col("cv")) * lit(math.sqrt(ctr.map(x => x * x).sum)))
    }
    val best = sims.zipWithIndex.map { case (s, i) =>
      struct(s.as("s"), lit(-i).as("ni"))
    }
    df.withColumn("__list", (-greatest(best: _*).getField("ni")).cast("int"))
  }

  /** Per-query probe lists (nProbe nearest centroids, ties → larger id,
    * matching `reverse(array_sort(...))` of the literal path) as an
    * array<int> column.
    */
  private[graft] def probeListsLiteral(
      qv: Column, centroids: Array[Array[Double]], nProbe: Int): Column = {
    val sims = centroids.zipWithIndex.map { case (ctr, i) =>
      val carr = array(ctr.map(lit(_)): _*)
      struct((dot(qv, carr) /
        (norm(qv) * lit(math.sqrt(ctr.map(x => x * x).sum)))).as("s"),
        lit(i).as("li"))
    }
    transform(slice(reverse(array_sort(array(sims: _*))), 1, nProbe),
      p => p.getField("li"))
  }

  private def probeLists(
      qv: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    if (centroids.length <= literalMaxCentroids)
      probeListsLiteral(qv, centroids, nProbe)
    else
      graft.functions.NearestCentroids(qv, centroids, nProbe, tieLargerIdx = true)

  /** Public nearest-centroid assignment over a (cid, vec) frame — the
    * bucketing step consumers like [[graft.text.Dedup.semanticDedup]]
    * compose with; returns (cid, cv, __list).
    */
  def assign(corpus: DataFrame, model: IvfModel): DataFrame =
    assignCentroid(
      corpus.select(col("cid"), toDouble(col("vec")).as("cv")), model.centroids)

  /** IVF top-k: corpus rows are bucketed by nearest centroid (the inverted
    * lists); each query probes only its `nProbe` nearest lists and reranks
    * exactly inside them. Candidate fan-out is |corpus|·nProbe/nList — the
    * classic IVF trade — and the probe join stays a hash equi-join on the
    * list id.
    */
  def ivfTopK(
      queries: DataFrame, // (qid, vec)
      corpus: DataFrame, // (cid, vec)
      model: IvfModel,
      k: Int,
      nProbe: Int = 2,
      roundTo: Int = 6
  ): DataFrame = {
    val c = assignCentroid(
      corpus.select(col("cid"), toDouble(col("vec")).as("cv")), model.centroids)
    val q0 = queries.select(col("qid"), toDouble(col("vec")).as("qv"))
    val q = q0.withColumn("__list",
      explode(probeLists(col("qv"), model.centroids, nProbe)))
    val scored = q.join(c, Seq("__list"))
      .where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        round(cosine(col("qv"), col("cv")), roundTo).as("cos"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("cid").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
  }
}
