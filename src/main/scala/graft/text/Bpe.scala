package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tokenizer-training statistics at corpus scale: the byte-pair-encoding
  * (BPE) pipeline split the way production tokenizer training actually
  * splits it (Sennrich et al. 2016; HuggingFace tokenizers does the same):
  *
  *  1. ONE distributed pass reduces the corpus to a (word, freq) table —
  *     the only step that touches all the data. By Heaps' law the word
  *     table is tiny relative to the corpus (10⁷-10⁸ rows at 100 TB), and
  *     [[wordFreqs]] can cap it to the top-N words by mass.
  *  2. The merge LOOP runs on the word table (driver-side here; the table
  *     is the size of a dictionary, not a corpus) — each merge only
  *     rewrites the words that contain the merged pair.
  *
  * [[pairCounts]] exposes step 2's first iteration as a distributed,
  * oracle-verifiable aggregation (the top pair IS the first BPE merge).
  */
object Bpe {

  /** Corpus → (word, freq) — the one full-data pass of tokenizer training.
    * `maxWords > 0` keeps only the top `maxWords` words by (freq desc,
    * word) — deterministic truncation for bounding driver memory; 0 keeps
    * all.
    */
  def wordFreqs(df: DataFrame, textCol: String, maxWords: Int = 0): DataFrame = {
    val wf = df.select(explode(TextHash.lowerTokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    if (maxWords <= 0) wf
    else wf.orderBy(col("freq").desc, col("word")).limit(maxWords)
  }

  /** Adjacent-symbol pair counts over a (word, freq) table at the CHARACTER
    * stage (iteration 1 of BPE): each word contributes its adjacent
    * character pairs weighted by the word's corpus frequency. One explode
    * over the word table (not the corpus) + one partial-agg groupBy.
    * Returns (pair, cnt): `pair` is the 2-char string.
    */
  def pairCounts(wordFreqs: DataFrame): DataFrame =
    wordFreqs
      .where(length(col("word")) >= 2)
      .select(col("freq"),
        explode(transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))

  /** Classic BPE merge loop over a COLLECTED word table (driver-side by
    * design — see object doc). Words are symbol sequences starting at
    * characters; each round merges the most frequent adjacent pair
    * (ties broken by pair lexicographic order, deterministic) everywhere
    * it occurs, left-to-right non-overlapping, and records it.
    *
    * Returns the merge list in order: (left symbol, right symbol, count at
    * merge time). Stops early when no pair occurs twice.
    */
  def train(words: Seq[(String, Long)], numMerges: Int): Seq[(String, String, Long)] = {
    // split by CODEPOINT (String.split("") would halve surrogate pairs,
    // diverging from encode's codepoint-wise "." delimiting on non-BMP text)
    def symbols(w: String): Array[String] =
      w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
    var seqs: Array[(Array[String], Long)] =
      words.map { case (w, f) => (symbols(w), f) }.toArray
    val merges = Seq.newBuilder[(String, String, Long)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (s, f) =>
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      val best = counts.toSeq
        .sortBy { case ((a, b), c) => (-c, a, b) }
        .headOption.filter(_._2 >= 2)
      best match {
        case None => done = true
        case Some(((a, b), c)) =>
          merges += ((a, b, c))
          val merged = a + b
          seqs = seqs.map { case (s, f) =>
            if (s.length < 2) (s, f)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < s.length) {
                if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
                  out += merged; i += 2
                } else { out += s(i); i += 1 }
              }
              (out.result(), f)
            }
          }
      }
      round += 1
    }
    merges.result()
  }

  /** The word-boundary symbol separator in the delimited representation a
    * word is encoded through: `␁c₁␁c₂␁…␁cₙ␁` (U+0001 never appears in
    * whitespace tokens — the same exclusion the n-gram ops rely on).
    */
  private val Sep = ""

  /** Apply a trained merge list to a delimited-word column — the ENCODE
    * half of BPE as a pure chained expression (no UDF): merge (a,b) is the
    * plain left-to-right substring replacement `␁a␁b␁ → ␁ab␁`, run
    * TWICE. One pass can skip an occurrence that starts at the separator a
    * replacement just re-emitted (the scan resumes past it), but any
    * occurrence surviving pass 1 is isolated — two originally-overlapping
    * neighbors can't both survive, because skipping one means the scan is
    * positioned to take the next — so pass 2 is always a fixpoint
    * (spec-pinned). Quoted-literal replacement has identical left-to-right
    * non-overlapping semantics in the JVM and in ANSI SQL `replace` — no
    * regex dialect in play.
    *
    * Equivalence to canonical BPE: merges apply in rank order (a merge's
    * components always carry lower ranks, so a completed rank never
    * becomes applicable again), and for a ≠ b every occurrence merges
    * exactly as BPE's left-to-right scan does. The one divergence is a
    * degenerate SELF-run (merge (a,a) over `aaaaa…`): the subword
    * multiset — and so every count — still matches BPE's floor(m/2)
    * pairs + remainder, but the leftover single `a` can sit mid-run
    * rather than at the end.
    */
  private def applyMerges(delimited: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(delimited) { case (acc, (a, b)) =>
      val pat = java.util.regex.Pattern.quote(Sep + a + Sep + b + Sep)
      val rep = Sep + a + b + Sep
      regexp_replace(regexp_replace(acc, pat, rep), pat, rep)
    }

  /** BPE-encode every whitespace token of `textCol` with a trained merge
    * list: tokens become `+`-joined subword groups, joined by spaces —
    * and `n_subwords` is the TOKENIZER-ACCURATE sequence length (the count
    * [[Packing]] / [[Sampling.mixByTokenBudget]] budgets should use once a
    * real tokenizer exists). Pure per-row projection, zero shuffle; the
    * merge list is a driver-side literal (vocab-sized by nature).
    *
    * Returns (id, n_tokens, n_subwords, enc_text).
    */
  def encode(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    // Merges run over the WHOLE row once, not once per token: the
    // canonical token join is delimited in one regex pass and each merge
    // is 2 `regexp_replace` calls per ROW (the round-5 form paid
    // 2·|merges| regex invocations per TOKEN through a `transform`
    // lambda — regex setup dominated; guide §4). Identical output
    // (SpanBpeSpec pins it against [[encodePerWord]]): a merge pattern
    // `␁a␁b␁` can never span two tokens — the boundary between delimited
    // tokens is `␁ ␁` and merge symbols contain no spaces — and the
    // left-to-right double-pass fixpoint argument (see [[applyMerges]])
    // is per-token-local for the same reason.
    val tk = TextHash.lowerTokens(col(textCol))
    val joined = array_join(tk, " ")
    val delimited = concat(regexp_replace(joined, "(.)", Sep + "$1"), lit(Sep))
    val merged = applyMerges(delimited, merges)
    // per-token subword groups: token boundaries are exactly `␁ ␁`;
    // within a token, dropping empty fragments strips the outer
    // separators that split() re-emits
    val enc = transform(split(merged, Sep + " " + Sep),
      w => filter(split(w, Sep), x => x =!= ""))
    df.select(col(idCol).as("id"), tk.as("tk"), enc.as("__enc"))
      .select(col("id").as(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        coalesce(aggregate(
          when(size(col("tk")) === 0, array().cast("array<array<string>>"))
            .otherwise(col("__enc")), lit(0L),
          (acc, sw) => acc + size(sw).cast("long")), lit(0L)).as("n_subwords"),
        when(size(col("tk")) === 0, lit(""))
          .otherwise(array_join(transform(col("__enc"),
            sw => array_join(sw, "+")), " ")).as("enc_text"))
  }

  /** Round-5 per-token form — kept ONLY as the parity-spec reference for
    * the whole-row merge pass above.
    */
  private[graft] def encodePerWord(
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]
  ): DataFrame = {
    val tk = TextHash.lowerTokens(col(textCol))
    val encWord = (w: Column) => {
      // ␁ before every char + a trailing ␁ = the delimited form (one
      // regex pass; tokens here are whitespace-split, so no U+0001 inside)
      val delimited = concat(regexp_replace(w, "(.)", Sep + "$1"), lit(Sep))
      val merged = applyMerges(delimited, merges)
      // strip the outer separators, then split on the survivors
      split(regexp_replace(merged, "^" + Sep + "|" + Sep + "$", ""), Sep)
    }
    df.select(col(idCol).as("id"), tk.as("tk"))
      .withColumn("__enc", transform(col("tk"), w => encWord(w)))
      .select(col("id").as(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        coalesce(aggregate(col("__enc"), lit(0L),
          (acc, sw) => acc + size(sw).cast("long")), lit(0L)).as("n_subwords"),
        array_join(transform(col("__enc"), sw => array_join(sw, "+")), " ")
          .as("enc_text"))
  }

  /** End-to-end: corpus → word table (distributed) → merge list (driver).
    * `maxWords` bounds the driver collect.
    */
  def trainFromCorpus(
      df: DataFrame,
      textCol: String,
      numMerges: Int,
      maxWords: Int = 1000000
  ): Seq[(String, String, Long)] = {
    val wf = wordFreqs(df, textCol, maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    train(wf, numMerges)
  }
}
