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

  private def toks(text: Column) = TextHash.tokens(lower(text))

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
    val t = toks(col(textCol))
    // one stats pass: corpus size, total tokens, per-term doc frequencies
    val dfAggs = query.zipWithIndex.map { case (w, i) =>
      sum(when(array_contains(t, w), 1L).otherwise(0L)).as(s"df_$i")
    }
    val aggs = Seq(sum(size(t).cast("long")).as("tot")) ++ dfAggs
    val statsRow = df.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = statsRow.getAs[Long]("n")
    val avgdl = statsRow.getAs[Long]("tot").toDouble / n
    val idf = query.indices.map { i =>
      val dfi = statsRow.getAs[Long](s"df_$i")
      math.log((n - dfi + 0.5) / (dfi + 0.5) + 1.0)
    }
    val dl = size(t).cast("double")
    val score = query.zipWithIndex.map { case (w, i) =>
      val tf = size(filter(t, x => x === w)).cast("double")
      lit(idf(i)) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dl / lit(avgdl)))
    }.reduce(_ + _)
    df.withColumn("n_tokens", size(t).cast("long"))
      .withColumn("bm25", round(score, 6))
  }
}
