package graft

import org.apache.spark.sql.functions._

import graft.ann.Ann

/** Scale-safe IVF assignment: the native NearestCentroids kernel (constant
  * plan size at any nList) must return bit-identical assignments/probes to
  * the literal-expression path it replaces past `literalMaxCentroids`.
  */
class AnnParitySpec extends GraftSuite {

  private lazy val vecs = spark.read.parquet(s"$sfSmall/embeddings.parquet")
    .select(col("vec_id").as("cid"), Ann.toDouble(col("embedding")).as("cv"))

  private lazy val centroids128 = vecs.orderBy(col("cid")).limit(128)
    .collect().map(_.getSeq[Double](1).toArray)

  test("assignment parity: native kernel == literal expressions at nList=128") {
    val lit128 = Ann.assignCentroidLiteral(vecs, centroids128)
      .select(col("cid"), col("__list"))
    val nat128 = vecs.withColumn("__list",
      element_at(graft.functions.NearestCentroids(
        col("cv"), centroids128, 1, tieLargerIdx = false), 1))
      .select(col("cid"), col("__list").as("__nlist"))
    val diff = lit128.join(nat128, Seq("cid"))
      .where(col("__list") =!= col("__nlist")).count()
    assert(diff == 0, s"$diff of ${vecs.count()} assignments diverge")
  }

  test("probe parity: native top-nProbe == literal reverse(array_sort) at nList=128") {
    val q = vecs.where(col("cid") < 50).select(col("cid"), col("cv").as("qv"))
    val both = q.select(col("cid"),
      Ann.probeListsLiteral(col("qv"), centroids128, 4).as("lit"),
      graft.functions.NearestCentroids(col("qv"), centroids128, 4,
        tieLargerIdx = true).as("nat"))
    assert(both.where(col("lit") =!= col("nat")).count() == 0)
  }

  test("native assignment plan: pure projection — no join, no exchange, constant size") {
    val df = vecs.withColumn("__list",
      element_at(graft.functions.NearestCentroids(
        col("cv"), centroids128, 1, tieLargerIdx = false), 1))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), "centroid assignment must not join")
    assert(!p.contains("Exchange"), "centroid assignment must not shuffle")
    // the 128x64 centroid matrix must NOT appear as plan literals
    assert(p.length < 20000, s"plan is ${p.length} chars — centroids leaked into the plan")
  }

  test("end-to-end IVF above the literal ceiling trains and probes") {
    val corpus = vecs
    val queries = vecs.where(col("cid") < 10)
      .select(col("cid").as("qid"), col("cv").as("vec"))
    val model = Ann.ivfTrain(
      corpus.select(col("cid"), col("cv").as("vec")), nCentroids = 24, iterations = 1)
    assert(model.nList == 24)
    val out = Ann.ivfTopK(queries,
      corpus.select(col("cid"), col("cv").as("vec")), model, k = 3, nProbe = 3)
    val byQ = out.groupBy(col("qid")).agg(count(lit(1)).as("n"))
      .where(col("n") =!= 3).count()
    assert(byQ == 0, "every query must get exactly k results")
    // self-exclusion + rank sanity
    assert(out.where(col("qid") === col("cid")).count() == 0)
  }
}
