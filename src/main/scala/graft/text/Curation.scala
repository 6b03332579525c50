package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end corpus curation facade — the pipeline-level API a
  * training-data user actually runs: one call applies the standard gate
  * stack (length, repetition, character entropy, language set, exact-dup
  * keeper) and assigns the deterministic train/val/test split to the
  * survivors.
  *
  * Scale shape: every content gate is a PURE per-row expression in ONE
  * projection (no explode, no join); the only shuffle in the whole
  * operator is the digest window for the exact-dup keeper. Per-gate
  * booleans are kept in the output — production pipelines audit WHY a
  * document dropped, not just that it dropped — and `keep` is their
  * conjunction. Near-dup/semantic dedup intentionally stay separate
  * ([[Dedup.dedupDocs]], [[Dedup.semanticDedup]]): they are corpus-level
  * joins a pipeline schedules as their own passes, composed via
  * [[Dedup.dedupIncremental]]-style anti-joins on this gate output.
  */
object Curation {

  /** Gate thresholds; defaults mirror common open-corpus filter configs.
    * With `stripMarkup`/`normalize` on, the corresponding pre-clean
    * ([[TextQuality.stripMarkup]], then [[TextQuality.normalize]]) runs
    * FIRST, every gate (and the exact-dup digest) evaluates the cleaned
    * text, and the output carries it as `clean_text` — raw-HTML crawls and
    * pre-extracted corpora then flow through one identical gate stack.
    */
  final case class Gates(
      minTokens: Long = 5,
      maxTokens: Long = 100000,
      dupN: Int = 2,
      maxDupFraction: Double = 0.3,
      minEntropy: Double = 2.0,
      langs: Set[String] = Set.empty, // empty = accept all languages
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      stripMarkup: Boolean = false,
      normalize: Boolean = false)

  /** Input plus g_len/g_rep/g_ent/g_lang/g_uniq booleans, `keep`, and
    * `split` (null for dropped rows). Gate comparisons run on the RAW
    * metric doubles — both engines compute them through the identical op
    * sequence, so the compare is cross-engine stable without rounding.
    */
  def curate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      g: Gates = Gates()
  ): DataFrame = {
    // the dup keeper digests the SAME text the gates saw: a crawl where
    // two pages differ only in boilerplate markup IS a duplicate once on
    val digestText =
      if (g.stripMarkup || g.normalize) col("clean_text") else col(textCol)
    // the keeper is elected among copies that PASS the content gates:
    // elected over all copies, a min-id copy that fails a per-row metadata
    // gate (e.g. a divergent upstream lang label) would drag every copy of
    // the document out of the corpus even though an acceptable copy exists
    val contentPass = col("g_len") && col("g_rep") && col("g_ent") &&
      col("g_lang")
    val keeper = min(when(contentPass, col(idCol))).over(
      org.apache.spark.sql.expressions.Window.partitionBy(md5(digestText)))
    val keep = col("g_len") && col("g_rep") && col("g_ent") &&
      col("g_lang") && col("g_uniq")
    withGates(df, idCol, textCol, langCol, g)
      .withColumn("g_uniq", coalesce(col(idCol) === keeper, lit(false)))
      .withColumn("keep", keep)
      .withColumn("split",
        when(keep, Sampling.assignSplit(col(idCol), g.splits))
          .otherwise(lit(null).cast("string")))
  }

  /** The four PURE per-row gates (g_len/g_rep/g_ent/g_lang) alone — no
    * window, no state — shared by [[curate]] and the streaming twin
    * ([[graft.streaming.Streams.curateStream]]), so batch and live paths
    * can never disagree on gate arithmetic.
    */
  private[graft] def withGates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      g: Gates
  ): DataFrame = {
    val cleaned0 = col(textCol)
    val cleaned1 =
      if (g.stripMarkup) TextQuality.stripMarkup(cleaned0) else cleaned0
    val cleaned2 =
      if (g.normalize) TextQuality.normalize(cleaned1) else cleaned1
    val preClean = g.stripMarkup || g.normalize
    val base = if (preClean) df.withColumn("clean_text", cleaned2) else df
    val text = if (preClean) col("clean_text") else col(textCol)
    val nt = size(TextHash.tokens(text)).cast("long")
    val gLang =
      if (g.langs.isEmpty) lit(true)
      else col(langCol).isin(g.langs.toSeq.sorted: _*)
    base.withColumn("g_len", nt >= g.minTokens && nt <= g.maxTokens)
      .withColumn("g_rep",
        TextQuality.dupNgramFraction(text, g.dupN) < g.maxDupFraction)
      .withColumn("g_ent", TextQuality.charEntropy(text) >= g.minEntropy)
      .withColumn("g_lang", gLang)
  }
}
