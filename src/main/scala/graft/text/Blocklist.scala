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
  * Shape (the 100 TB story): a pure projection. Token matching is one
  * `array_intersect` against a SORTED deduped literal; phrase matching is
  * ONE Aho–Corasick automaton pass per row ([[graft.functions
  * .MultiContainsCount]] — the automaton rides as a codegen reference
  * object, so plan size is constant and per-row cost is O(len) at any
  * phrase count). No join, no shuffle, no UDF.
  *
  * WHICH PATH AT WHAT LIST SIZE (measured, BASELINE.md §7 — sf0.1
  * corpus, 8 GB driver): the automaton wins to ~10⁴ entries (k=10³:
  * 0.22 s vs 1.25 s; k=10⁴: 0.76 s vs 1.80 s, 6 MB serialized); by 10⁵
  * the reference object is 65 MB — shipped with EVERY task closure — and
  * the corpus pass loses 2.5× (10.4 s vs 4.1 s); at 10⁶ the automaton
  * build itself exhausts the 8 GB driver heap while [[scoreJoin]] runs
  * fine. Rule: [[score]] for config-sized lists (≲ 2·10⁴ — constant plan,
  * zero shuffle), [[scoreJoin]] beyond (the list is data).
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

    // null text scores ZERO hits (not null): un-coalesced, size(null
    // tokens) nulls n_word_hits and poisons `blocked` — and diverges from
    // the join path, which drops null rows at the explode and backfills 0
    val wordHits =
      if (words.isEmpty) lit(0)
      else coalesce(size(array_intersect(
        TextHash.lowerTokens(textCol),
        lit(words.sorted.toArray))), lit(0))
    // sentinel-padded canonical text: phrase boundaries are exactly spaces.
    // ONE Aho–Corasick automaton pass matches every phrase simultaneously
    // (O(len) per row at ANY list size; the pre-round-5 `contains`-per-
    // phrase form — kept as [[phraseHitsDeclarative]], the parity-spec
    // twin — scanned the padded text once per phrase).
    val padded = concat(lit(" "),
      regexp_replace(lower(trim(textCol)), "\\s+", " "), lit(" "))
    val phraseHits =
      if (phrases.isEmpty) lit(0)
      else coalesce(graft.functions.MultiContainsCount(
        padded, phrases.sorted.map(p => s" $p ")), lit(0))

    df.withColumn("n_word_hits", wordHits)
      .withColumn("n_phrase_hits", phraseHits)
      .withColumn("blocked",
        col("n_word_hits") > 0 || col("n_phrase_hits") > 0)
  }

  /** Declarative twin of the phrase gate — one `contains` scan per phrase
    * (O(len·phrases) per row) — kept ONLY to parity-pin the automaton.
    * Padded text is let-bound through a single-element transform (the
    * TextHash.winnow idiom): referenced directly inside the filter lambda,
    * the regexp_replace would re-run once PER PHRASE per row.
    */
  private[graft] def phraseHitsDeclarative(
      textCol: Column, phrases: Seq[String]): Column = {
    val padded = concat(lit(" "),
      regexp_replace(lower(trim(textCol)), "\\s+", " "), lit(" "))
    coalesce(element_at(transform(array(padded), pad =>
      size(filter(lit(phrases.sorted.toArray),
        p => contains(pad, concat(lit(" "), p, lit(" ")))))), 1), lit(0))
  }

  /** [[score]] with the blocklist as DATA — the 10⁵-10⁶-entry compliance-
    * list shape where baking terms into the plan stops scaling (plan size,
    * and one substring scan per phrase per row). Identical verdict columns
    * (spec-pinned against the literal path).
    *
    * Shape: canonicalization is shared with [[score]] (same lowercase/
    * whitespace folding on BOTH terms and text). Word hits are an explode +
    * broadcast equi-join on the token — each document token probes a hash
    * table once, independent of list size. Phrase hits use a banded
    * RAREST-TOKEN prefilter: a phrase match implies every phrase token is
    * a whole token of the document (the text is whitespace-canonicalized
    * before the sentinel `contains`), so each phrase is banded by its
    * corpus-RAREST token — document frequencies counted over the same
    * distinct-token explode, restricted to tokens any phrase uses — and
    * candidates come from the broadcast token join on that band token.
    * Only candidate (doc, phrase) pairs re-fetch the padded text for the
    * verify — the PPJoin candidate/verify discipline ([[Dedup.prefixOf]]
    * ranks shingles by the same global-rarity rule). Banding by the FIRST
    * token (the round-5 shape) degenerates on real compliance lists,
    * which are dense in stop-word-initial phrases ("the …", "how to …"):
    * every document containing "the" became a candidate for every such
    * phrase. Rarest-token banding keeps the candidate count
    * O(docs containing the band token), which for any phrase with at
    * least one non-stop-word token is corpus-tiny; a phrase whose tokens
    * are ALL corpus-frequent is genuinely hard for any banding scheme —
    * then the Aho–Corasick literal path ([[score]]) is the right tool.
    *
    * `terms` must have a string column `termCol`; empty/whitespace terms
    * are dropped. `idCol` must uniquely identify rows (the hit counts are
    * aggregated per id and joined back — duplicate ids would merge counts
    * across rows, where [[score]] scores each row independently) and be
    * NON-NULL (a null id never equi-joins its counts back: such rows
    * would score 0 hits where [[score]] evaluates the text).
    * Returns `df` + (n_word_hits, n_phrase_hits, blocked).
    */
  def scoreJoin(
      df: DataFrame,
      idCol: String,
      textCol: Column,
      terms: DataFrame,
      termCol: String = "term"
  ): DataFrame = {
    val canon = terms.select(
      regexp_replace(lower(trim(col(termCol))), "\\s+", " ").as("__term"))
      .where(col("__term") =!= "").distinct()
    val words = canon.where(!col("__term").contains(" "))
    val phrases = canon.where(col("__term").contains(" "))
    val base = df.select(col(idCol).as("__bid"),
      array_distinct(TextHash.lowerTokens(textCol)).as("__tk"),
      concat(lit(" "),
        regexp_replace(lower(trim(textCol)), "\\s+", " "), lit(" ")).as("__pad"))
    // three consumers (word hits, phrase candidates, band-token document
    // frequencies) each recompute this tokenize+explode — measured CHEAPER
    // than caching it (the exploded rows outweigh their recompute; same
    // doctrine as oovRate's deliberate second scan)
    val toks = base.select(col("__bid"), explode(col("__tk")).as("__tok"))
    // tokens are DISTINCT per doc and terms distinct, so each (doc, term)
    // pair appears at most once — plain counts ARE distinct-term counts
    val wordHits = toks
      .join(broadcast(words), col("__tok") === col("__term"))
      .groupBy(col("__bid")).agg(count(lit(1)).cast("int").as("__nw"))
    val phraseCand = toks
      .join(broadcast(bandPhrases(phrases, toks)),
        col("__tok") === col("__band"))
      .select(col("__bid"), col("__term"))
    val phraseHits = phraseCand
      .join(base.select(col("__bid"), col("__pad")), Seq("__bid"))
      .where(contains(col("__pad"), concat(lit(" "), col("__term"), lit(" "))))
      .groupBy(col("__bid")).agg(count(lit(1)).cast("int").as("__np"))
    df.join(wordHits.withColumnRenamed("__bid", idCol), Seq(idCol), "left")
      .join(phraseHits.withColumnRenamed("__bid", idCol), Seq(idCol), "left")
      .withColumn("n_word_hits", coalesce(col("__nw"), lit(0)))
      .withColumn("n_phrase_hits", coalesce(col("__np"), lit(0)))
      .withColumn("blocked",
        col("n_word_hits") > 0 || col("n_phrase_hits") > 0)
      .drop("__nw", "__np")
  }

  /** (__term, __band) — each canonical phrase banded by its RAREST token
    * under corpus document frequency (ties → lexicographically smallest
    * token, deterministic at any parallelism). `toks` is the corpus's
    * distinct-(doc, token) explode; frequencies are counted ONLY for
    * tokens some phrase uses (a broadcast semi-join keeps the aggregation
    * phrase-vocabulary-sized, not corpus-vocabulary-sized). A phrase token
    * absent from the corpus gets df = 0 — banding on it yields zero
    * candidates, which is exact: a phrase can only match a document
    * containing ALL its tokens.
    */
  private[graft] def bandPhrases(phrases: DataFrame, toks: DataFrame): DataFrame = {
    val ptoks = phrases.select(col("__term"),
      explode(split(col("__term"), " ")).as("__ptok")).distinct()
    val pdf = toks
      .join(broadcast(ptoks.select(col("__ptok")).distinct()),
        col("__tok") === col("__ptok"))
      .groupBy(col("__ptok")).agg(count(lit(1)).as("__df"))
    ptoks.join(pdf, Seq("__ptok"), "left")
      .withColumn("__df", coalesce(col("__df"), lit(0L)))
      .groupBy(col("__term"))
      .agg(min_by(col("__ptok"), struct(col("__df"), col("__ptok")))
        .as("__band"))
  }
}
