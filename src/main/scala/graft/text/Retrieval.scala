package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lexical retrieval scoring for corpus curation: rank documents against a
  * fixed query (seed-document selection, targeted filtering, dataset
  * search) without an external index.
  *
  * Scale shape: corpus statistics (N, total tokens, per-term document
  * frequencies) are ONE aggregation pass — the query has a handful of
  * terms, so the df aggregation is a fixed number of columns, not an
  * explode. Scoring is then a pure per-row projection (no join, no
  * shuffle): term frequencies come from `filter` over the row's own token
  * array. Driver-side collect is a single row of longs — the same pattern
  * as [[Sampling.ratesForTokenBudget]].
  *
  * Determinism: idf/avgdl derive from exact integer counts through a fixed
  * double op sequence, and the per-document score sums query terms in
  * query order — any SQL engine reproduces the scores to the ulp of its
  * `ln`.
  */
object Retrieval {

  /** Okapi BM25 scores for every document against `query` (lowercased
    * whitespace terms). Returns the input plus `bm25` (rounded to 6) and
    * `n_tokens`.
    */
  def bm25(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75
  ): DataFrame = {
    require(query.nonEmpty, "empty query")
    val qTerms = query.map(_.toLowerCase)   // tokens are lowercased — a
                                            // mixed-case term would silently
                                            // score 0 everywhere
    val t = TextHash.lowerTokens(col(textCol))
    // one stats pass: corpus size, total tokens, per-term doc frequencies
    val dfAggs = qTerms.zipWithIndex.map { case (w, i) =>
      sum(when(array_contains(t, w), 1L).otherwise(0L)).as(s"df_$i")
    }
    val aggs = Seq(sum(size(t).cast("long")).as("tot")) ++ dfAggs
    val statsRow = df.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = statsRow.getAs[Long]("n")
    val tot = statsRow.getAs[Long]("tot")
    require(tot > 0, "corpus has zero tokens — avgdl undefined (NaN scores)")
    val avgdl = tot.toDouble / n
    val idf = qTerms.indices.map { i =>
      val dfi = statsRow.getAs[Long](s"df_$i")
      math.log((n - dfi + 0.5) / (dfi + 0.5) + 1.0)
    }
    val dl = size(t).cast("double")
    val score = qTerms.zipWithIndex.map { case (w, i) =>
      val tf = size(filter(t, x => x === w)).cast("double")
      lit(idf(i)) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("bm25", round(score, 6))
  }

  /** Unigram-LM document scoring — the CCNet-style perplexity-proxy
    * quality filter, with the corpus itself as the language model:
    * avg_logp(d) = (1/|d|) Σ_i ln p(w_i),  p(w) = (c(w)+1)/(T+V)
    * (add-one smoothing over the corpus unigram counts; lower = more
    * surprising/noisier document).
    *
    * Scale shape: ONE groupBy over exploded tokens builds the count table
    * (O(vocab) rows); tokens then join back on the token key (AQE handles
    * stopword skew) and per-document sums fold the per-position log-probs
    * in POSITION ORDER (sorted collect), so the double summation is
    * order-stable — the same result on any engine, any parallelism.
    * Documents with no tokens score null.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toksDf = df.select(col(idCol).as("__id"),
      posexplode(TextHash.lowerTokens(col(textCol))).as(Seq("__pos", "__tok")))
    val counts = toksDf.groupBy(col("__tok")).agg(count(lit(1)).as("__c"))
    val tv = counts.agg(sum(col("__c")).as("__t"), count(lit(1)).as("__v")).head()
    val denom = (tv.getAs[Long]("__t") + tv.getAs[Long]("__v")).toDouble
    val scored = toksDf.join(counts, Seq("__tok"))
      .withColumn("__lp", log((col("__c") + lit(1L)).cast("double") / denom))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_tokens"),
        aggregate(
          array_sort(collect_list(struct(col("__pos"), col("__lp")))),
          lit(0.0), (acc, e) => acc + e.getField("__lp")).as("__sum"))
      .withColumn("avg_logp", round(col("__sum") / col("n_tokens"), 6))
      .drop("__sum")
    df.select(col(idCol)).join(scored.withColumnRenamed("__id", idCol),
      Seq(idCol), "left")
  }
}
