package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL hygiene for web-crawl corpora: canonicalization, host/domain
  * extraction, URL-level dedup and per-domain quota capping — the
  * source-diversity gates every CommonCrawl-style curation run applies
  * before content filters (a handful of mega-domains otherwise dominate
  * the token budget).
  *
  * All transforms are pure codegen'd `regexp_*`/string expressions using
  * only Java∩RE2 syntax (character classes, lazy/bounded repetition,
  * anchors — no lookaround, no backrefs in PATTERNS), so every step is
  * byte-reproducible in DuckDB for the oracle. (Replacement-string syntax
  * differs by engine — `$1` vs `\1` — but that lives in each engine's SQL,
  * not in the pattern contract.)
  */
object Web {

  /** scheme://host[:port] prefix (group 1); empty when not a URL. */
  private val prefixRe = "^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"

  /** Canonical URL. Contract (in application order):
    *  1. drop the fragment (`#...` to end);
    *  2. lowercase scheme and authority (path/query stay case-sensitive);
    *  3. drop default ports (`:443` for https, `:80` for http);
    *  4. drop tracking params (`utm_*`, `fbclid`, `gclid`) wherever they
    *     sit in the query string, separator-correctly (`?utm=…&id=…` →
    *     `?id=…`);
    *  5. drop an empty trailing `?`.
    * Non-URL strings (no `scheme://`) pass through steps 1/4/5 unchanged
    * by construction (the prefix extract is empty, so lowercasing applies
    * to nothing).
    */
  def canonicalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "(?s)#.*", "")
    val pre = regexp_extract(noFrag, prefixRe, 1)
    val lowered = concat(lower(pre), expr_substr(noFrag, length(pre) + 1))
    // no lookahead (RE2 has none): anchor the whole string and carry the
    // tail through as a captured group (an unmatched optional group
    // substitutes as empty in both Java and RE2 replacement)
    val noPort = regexp_replace(
      regexp_replace(lowered, "(?s)^(https://[^:/?#]+):443([/?#].*)?$", "$1$2"),
      "(?s)^(http://[^:/?#]+):80([/?#].*)?$", "$1$2")
    // the strips run on the QUERY STRING ONLY (split at the first `?`):
    // run against the whole URL, the `&param=…` stage would also delete
    // matching substrings from the PATH (`/r&utm_x=1/dl?id=2` →
    // `/r?id=2`, a different resource) because `[^&#]*` happily spans `/`.
    // Three-stage strip so no separator "repair" pass is needed (a repair
    // regex would corrupt legitimate `&` in paths): first every `&param=…`,
    // then a tracking param LEADING the query (keep the `?` when params
    // follow, drop it when it was the whole query), then an empty `?`
    val track = "(?:utm_[a-z]+|fbclid|gclid)"
    val pathPart = regexp_extract(noPort, "(?s)^[^?]*", 0)
    val queryPart = expr_substr(noPort, length(pathPart) + 1)
    val cleanedQuery = regexp_replace(
      regexp_replace(
        regexp_replace(queryPart, s"&$track=[^&#]*", ""),
        s"(?s)^\\?$track=[^&#]*&", "?"),
      s"(?s)^\\?$track=[^&#]*$$", "")
    regexp_replace(concat(pathPart, cleanedQuery), "\\?$", "")
  }

  /** substring-from-index helper: `substr(url, pos)` to end of string. */
  private def expr_substr(c: Column, pos: Column): Column =
    c.substr(pos, length(c) - pos + 1)

  /** Host (authority minus port/userinfo) of a canonical-or-raw URL,
    * lowercased; empty string when the input is not a URL.
    */
  def host(url: Column): Column =
    // strip userinfo BEFORE the port: `user:pw@h.com:8080` must not group
    // per-userinfo downstream (per-domain caps would be bypassable by
    // minting userinfo strings)
    lower(regexp_replace(
      regexp_replace(
        regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1),
        "^[^@]*@", ""),
      ":[0-9]+$", ""))

  /** Registered-domain approximation: the last two dot-labels of the host
    * (`a.b.example.com` → `example.com`). A public-suffix list is data this
    * sandbox doesn't ship; two labels is the standard fallback and is the
    * contract here — documented, deterministic, oracle-checkable.
    */
  def registeredDomain(url: Column): Column = {
    val h = host(url)
    val m = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    when(m === "", h).otherwise(m)
  }

  /** Per-domain quota cap: keep at most `cap` rows per registered domain,
    * preferring rows first by `order` (e.g. quality desc, id asc — the
    * caller's tie-break must be total for determinism). Adds `domain` and
    * `domain_rank` (1-based) columns.
    *
    * Scale shape: ONE hash shuffle on domain + a rank window. Spark's
    * `InferWindowGroupLimit` rewrites the `row_number <= cap` filter into a
    * per-partition group-limit (WindowGroupLimit in the plan, pinned by
    * PlanAuditSpec), so a mega-domain's millions of rows are top-k-pruned
    * map-side BEFORE the shuffle — the skew case is exactly the case the
    * cap exists for, and it never materializes a full per-domain sort of
    * the losers.
    */
  def perDomainCap(df: DataFrame, urlCol: String, cap: Int,
                   order: Seq[Column]): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    require(order.nonEmpty, "perDomainCap needs a deterministic order")
    val w = Window.partitionBy(col("domain")).orderBy(order: _*)
    df.withColumn("domain", registeredDomain(col(urlCol)))
      .withColumn("domain_rank", row_number().over(w))
      .where(col("domain_rank") <= cap)
  }

  /** Exact URL-level dedup: keep one row per canonical URL, preferring by
    * `order`. Same group-limit shape as [[perDomainCap]] with cap=1 on the
    * canonical-url key.
    */
  def dedupByUrl(df: DataFrame, urlCol: String, order: Seq[Column]): DataFrame = {
    require(order.nonEmpty, "dedupByUrl needs a deterministic order")
    val w = Window.partitionBy(col("__canon")).orderBy(order: _*)
    df.withColumn("__canon", canonicalize(col(urlCol)))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .drop("__rk", "__canon")
  }
}
