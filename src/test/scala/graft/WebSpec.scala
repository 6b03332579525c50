package graft

import org.apache.spark.sql.functions._

import graft.text.{Retrieval, TextQuality, Web}

/** URL hygiene, markup stripping, vocab coverage — the three web-curation
  * gates added in round 4's tail. Truth tables here; cross-engine byte
  * parity is q85/q86/q87's oracle job.
  */
class WebSpec extends GraftSuite {
  import spark.implicits._

  private def canon1(url: String): String =
    Seq(url).toDF("u").select(Web.canonicalize(col("u"))).head().getString(0)

  test("canonicalize: truth table (case, port, tracking, fragment)") {
    val cases = Seq(
      // lowercase scheme+host only; path/query case preserved
      "HTTPS://WWW.Example.COM/Path?Id=3" ->
        "https://www.example.com/Path?Id=3",
      // default ports drop; non-default ports stay
      "https://a.example.com:443/x" -> "https://a.example.com/x",
      "http://a.example.com:80/x" -> "http://a.example.com/x",
      "https://a.example.com:8443/x" -> "https://a.example.com:8443/x",
      // host-only with default port, no path
      "https://a.example.com:443" -> "https://a.example.com",
      // fragment drops
      "https://a.com/x?id=1#frag" -> "https://a.com/x?id=1",
      // tracking params drop separator-correctly wherever they sit
      "https://a.com/x?utm_source=f&id=1" -> "https://a.com/x?id=1",
      "https://a.com/x?id=1&utm_source=f" -> "https://a.com/x?id=1",
      "https://a.com/x?utm_a=1&utm_b=2&id=1" -> "https://a.com/x?id=1",
      "https://a.com/x?utm_a=1" -> "https://a.com/x",
      "https://a.com/x?fbclid=abc&gclid=d" -> "https://a.com/x",
      // an & in the PATH is untouched (the no-repair-regex design point)
      "https://a.com/a&b?id=1" -> "https://a.com/a&b?id=1",
      // empty trailing ? drops; non-URLs pass through un-lowercased
      "https://a.com/x?" -> "https://a.com/x",
      "Not A Url" -> "Not A Url"
    )
    for ((in, want) <- cases)
      assert(canon1(in) === want, s"canonicalize($in)")
  }

  test("host + registeredDomain: ports and deep subdomains") {
    val df = Seq(
      "https://a.b.News.Example.com:8080/x",
      "https://example.com/x",
      "https://localhost/x",
      "no url here"
    ).toDF("u").select(
      Web.host(col("u")).as("h"), Web.registeredDomain(col("u")).as("d"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows(0) === ("a.b.news.example.com", "example.com"))
    assert(rows(1) === ("example.com", "example.com"))
    // single-label host falls back to the host itself
    assert(rows(2) === ("localhost", "localhost"))
    assert(rows(3) === ("", ""))
  }

  test("perDomainCap keeps top-cap per domain by the given order; dedupByUrl keeps one per canonical url") {
    val df = (1L to 30L).map { i =>
      (i, s"https://www.site${i % 3}.com/p?id=$i&utm_source=x", 100L - i)
    }.toDF("id", "url", "quality")
      .withColumn("url", Web.canonicalize(col("url")))
    val capped = Web.perDomainCap(df, "url", cap = 4,
      order = Seq(col("quality").desc, col("id").asc))
    assert(capped.count() === 12) // 3 domains x 4
    // within each domain the kept ids are the 4 highest-quality (= lowest id)
    val kept = capped.where(col("domain") === "site1.com")
      .select("id").as[Long].collect().sorted
    assert(kept.sameElements(Array(1L, 4L, 7L, 10L)))
    assert(capped.select(max(col("domain_rank"))).head().getInt(0) === 4)

    val dup = df.union(df) // every canonical url twice
    val ded = Web.dedupByUrl(dup, "url", order = Seq(col("id").asc))
    assert(ded.count() === 30)
  }

  test("stripMarkup: blocks, tags, entities, decode order") {
    def strip1(s: String): String =
      Seq(s).toDF("t").select(TextQuality.stripMarkup(col("t")))
        .head().getString(0)
    // script/style bodies vanish entirely, even with a bare < inside
    assert(strip1("a<script>if(i<2){x}</script>b") === "a b")
    assert(strip1("a<STYLE>p{color:red}</STYLE>b") === "a b")
    // comments vanish; tags become spaces (no word welding)
    assert(strip1("one</p><p>two<!-- gone -->three") === "one two three")
    // doctype/attributes strip; entity-coded markup survives as TEXT
    assert(strip1("<!DOCTYPE html><p class=\"x\">&lt;b&gt;bold&lt;/b&gt;</p>")
      === "<b>bold</b>")
    // single-pass decode: &amp;lt; is the literal text &lt;
    assert(strip1("x &amp;lt; y") === "x &lt; y")
    assert(strip1("a&nbsp;b&quot;c&#39;d") === "a b\"c'd")
    // plain text unharmed (math with < that is not a tag)
    assert(strip1("1 < 2 and 3 > 2") === "1 < 2 and 3 > 2")
  }

  test("curate pre-clean: gates+digest on cleaned text == curate over pre-cleaned input") {
    import graft.text.Curation
    val dirty = Seq(
      (1L, "<p>the quick brown fox jumps over the lazy dog</p>", "en"),
      // markup-only variant of 1: a duplicate once cleaning is on
      (2L, "<div>the quick &amp; brown fox jumps over the lazy dog</div>", "en"),
      (3L, "<script>var x=1;</script>short", "en"),
      (4L, "plain different text about spark engines entirely here", "en")
    ).toDF("doc_id", "text", "lang")
    // doc 2 differs from doc 1 by a real character change too (&amp; -> &),
    // so only assert the clean paths agree, not specific dup outcomes
    val g = Curation.Gates(stripMarkup = true, normalize = true, minTokens = 2)
    val a = Curation.curate(dirty, "doc_id", "text", "lang", g)
    val pre = dirty.withColumn("text",
      TextQuality.normalize(TextQuality.stripMarkup(col("text"))))
    val b = Curation.curate(pre, "doc_id", "text", "lang",
      Curation.Gates(minTokens = 2))
    val cols = Seq("doc_id", "g_len", "g_rep", "g_ent", "g_lang", "g_uniq",
      "keep", "split")
    val got = a.select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
    val want = b.select(cols.map(col): _*).orderBy("doc_id").collect().toSeq
    assert(got === want)
    // and clean_text is exactly the pre-cleaned text
    val ct = a.orderBy("doc_id").select("clean_text").as[String].collect()
    val pt = pre.orderBy("doc_id").select("text").as[String].collect()
    assert(ct.sameElements(pt))
  }

  test("temperatureWeights: alpha endpoints and tail upsampling") {
    import graft.text.Sampling
    val docs = spark.read.parquet(s"$sfSmall/documents.parquet")
      .withColumn("ntok",
        size(graft.text.TextHash.tokens(col("text"))).cast("long"))
    val totals = Sampling.stratumTokenTotals(docs, "lang", "ntok")
    val natural = totals.map { case (k, t) =>
      k -> t.toDouble / totals.values.sum }

    // alpha=1: weights == natural proportions (to quantization: pwq sums
    // differ from exact by <1e-6 relative per stratum)
    val w1 = Sampling.temperatureWeights(docs, "lang", "ntok", alpha = 1.0)
    w1.foreach { case (k, w) => assert(math.abs(w - natural(k)) < 1e-5, k) }

    // alpha=0: uniform over non-empty strata
    val w0 = Sampling.temperatureWeights(docs, "lang", "ntok", alpha = 0.0)
    w0.values.foreach(w => assert(math.abs(w - 1.0 / w0.size) < 1e-5))

    // alpha=0.3 strictly upsamples every below-natural-share stratum
    val w3 = Sampling.temperatureWeights(docs, "lang", "ntok", alpha = 0.3)
    val (small, _) = natural.minBy(_._2)
    val (big, _) = natural.maxBy(_._2)
    assert(w3(small) > natural(small) && w3(big) < natural(big))
    assert(math.abs(w3.values.sum - 1.0) < 1e-9)

    // mixByTemperature == stratified with the derived rates (same salt)
    val z = totals.map { case (k, t) =>
      k -> math.floor(math.pow(t.toDouble, 0.3) * 1e6 + 0.5).toLong }
    val rates = z.map { case (k, q) =>
      k -> math.min(1.0,
        15000L.toDouble * q.toDouble / z.values.sum.toDouble /
          totals(k).toDouble) }
    val a = Sampling.mixByTemperature(
      docs, "doc_id", "lang", "ntok", 0.3, 15000L)
      .select("doc_id").as[Long].collect().sorted
    val b = Sampling.stratified(docs, "doc_id", "lang", rates,
        defaultRate = 0.0, salt = "temp1")
      .select("doc_id").as[Long].collect().sorted
    assert(a.sameElements(b))
  }

  test("oovRate: planted vocab split") {
    // 10 docs of common words + rare singletons; vocabSize=3 keeps the
    // three common words, so each doc's OOV tokens are exactly its rares
    val docs = (1L to 10L).map { i =>
      (i, s"alpha beta gamma rare$i" + (if (i % 2 == 0) s" odd$i" else ""))
    }.toDF("doc_id", "text")
    val out = Retrieval.oovRate(docs, "doc_id", "text", vocabSize = 3)
    val r4 = out.where(col("doc_id") === 4).head()
    assert(r4.getAs[Long]("n_tokens") === 5L)
    assert(r4.getAs[Long]("n_oov") === 2L)
    assert(r4.getAs[Double]("oov_rate") === 0.4)
    val r5 = out.where(col("doc_id") === 5).head()
    assert(r5.getAs[Long]("n_oov") === 1L)
    // empty doc scores null
    val empty = Retrieval.oovRate(
      Seq((1L, "a b"), (2L, "")).toDF("doc_id", "text"),
      "doc_id", "text", vocabSize = 10)
    assert(empty.where(col("doc_id") === 2).head().isNullAt(1))
  }

  test("review fixes: userinfo never reaches domain; path ampersands survive canonicalize") {
    import graft.text.Web
    val rows = Seq(
      (1L, "http://a@spam.com/1"),
      (2L, "http://b:pw@spam.com:80/2"),
      (3L, "http://ex.com/r&utm_x=1/download?id=2"),
      (4L, "https://h.com/p?utm_a=1&id=3&utm_b=2#f")
    ).toDF("id", "url")
    val out = rows.select(col("id"),
        Web.canonicalize(col("url")).as("c"),
        Web.registeredDomain(Web.canonicalize(col("url"))).as("d"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L)._2 == "spam.com", s"userinfo leaked: ${out(1L)}")
    assert(out(2L)._2 == "spam.com", s"userinfo+port leaked: ${out(2L)}")
    // the path is untouched; only the query is stripped
    assert(out(3L)._1 == "http://ex.com/r&utm_x=1/download?id=2",
      s"path corrupted: ${out(3L)._1}")
    assert(out(4L)._1 == "https://h.com/p?id=3", s"query strip: ${out(4L)._1}")
  }
}
