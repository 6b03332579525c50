package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banned-term gate — the curation stage that filters documents containing
  * blocklisted words or phrases (NSFW lists, policy terms, known-bad
  * boilerplate markers).
  *
  * Matching semantics (the part naive `contains` gets wrong):
  *   - single-word terms match whole TOKENS only — "ass" must not hit
  *     "class" — via set intersection on the canonical lowercase
  *     whitespace tokens every other gate uses;
  *   - multi-word phrases match on the whitespace-CANONICALIZED lowercase
  *     text padded with sentinels, so "bad actor" hits across any run of
  *     whitespace but never mid-token.
  *
  * Shape (the 100 TB story): a pure projection. The blocklist is a literal
  * array baked into the plan (production lists are 10²-10⁴ terms — orders
  * of magnitude under the codegen limits the IVF literal path documents);
  * token matching is one `array_intersect` against a SORTED deduped literal,
  * phrase matching one `filter` over a phrase-literal array. No join, no
  * shuffle, no UDF. For million-entry lists, switch to a broadcast-join
  * variant — at that size the list is data, not configuration.
  */
object Blocklist {

  /** Per-document blocklist hits: `n_word_hits` (distinct banned words
    * present), `n_phrase_hits` (distinct banned phrases present), `blocked`
    * (any hit). Terms are canonicalized (lowercased, whitespace-collapsed);
    * empty terms are rejected.
    */
  def score(df: DataFrame, textCol: Column, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val canon = terms.map(t => t.trim.toLowerCase.split("\\s+").mkString(" "))
    require(canon.forall(_.nonEmpty), "blocklist terms must be non-empty")
    val (phrases, words) = canon.distinct.partition(_.contains(' '))

    val wordHits =
      if (words.isEmpty) lit(0)
      else size(array_intersect(
        TextHash.lowerTokens(textCol),
        lit(words.sorted.toArray)))
    // sentinel-padded canonical text: phrase boundaries are exactly spaces.
    // Let-bound through a single-element transform (the TextHash.winnow
    // idiom): referenced directly inside the filter lambda, the
    // regexp_replace would re-run once PER PHRASE per row.
    val padded = concat(lit(" "),
      regexp_replace(lower(trim(textCol)), "\\s+", " "), lit(" "))
    val phraseHits =
      if (phrases.isEmpty) lit(0)
      else element_at(transform(array(padded), pad =>
        size(filter(lit(phrases.sorted.toArray),
          p => contains(pad, concat(lit(" "), p, lit(" ")))))), 1)

    df.withColumn("n_word_hits", wordHits)
      .withColumn("n_phrase_hits", phraseHits)
      .withColumn("blocked",
        col("n_word_hits") > 0 || col("n_phrase_hits") > 0)
  }
}
