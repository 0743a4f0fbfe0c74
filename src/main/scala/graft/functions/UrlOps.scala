package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level curation for web corpora.
  *
  * Web-crawl pipelines key almost everything off the URL: exact dedup
  * wants one canonical form per page (`http://WWW.a.com:80/x/?utm_source=f`
  * and `http://a.com/x` are the same document), and corpus balance wants
  * per-registered-domain caps so one giant site cannot dominate a mixture
  * (the C4 and RefinedWeb recipes both filter and cap by domain before
  * any content-level step). These are additive operators in the
  * training-data-pipeline family — the reference engine has no URL
  * surface — so the designs follow the published recipes, not a
  * reference operator.
  *
  * Everything here is a narrow Column chain over builtin expressions
  * (regexp on RE2∩Java-safe patterns, HOF `filter` over the query
  * params) — no UDFs, no shuffle until a per-domain decision genuinely
  * needs one, and then only via [[domainCap]]'s `row_number` ≤ k filter,
  * which Spark lowers to `WindowGroupLimit`: every map task keeps at most
  * k rows per domain BEFORE the exchange, so the shuffle carries
  * O(k · partitions) rows per domain rather than the domain's full page
  * set — the same bounded partial-aggregation discipline as
  * `Aggregators.topKAgg`.
  */
object UrlOps {

  /** RFC-3986-shaped splitter, restricted to constructs Java and RE2
    * parse identically: scheme ∶// authority path ?query #fragment.
    * Group 4 (query) excludes the '?', the fragment is dropped entirely. */
  private val UrlRe =
    "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(?:\\?([^#]*))?(?:#.*)?$"

  private def part(url: Column, g: Int): Column = regexp_extract(url, UrlRe, g)

  /** Tracking params dropped by [[canonicalizeUrl]]: the `utm_*` family
    * plus the common click-identifier keys. Key match is case-insensitive. */
  val TrackingParams: Seq[String] =
    Seq("fbclid", "gclid", "msclkid", "mc_eid", "ref", "ref_src", "igshid")

  private def paramKey(p: Column): Column = lower(regexp_extract(p, "^([^=]*)", 1))

  /** Canonical form of a URL: lowercased scheme and authority, leading
    * `www.` and the scheme's default port stripped, exactly one trailing
    * slash collapsed (empty path becomes `/`), tracking query params
    * removed (order of survivors preserved), fragment dropped. Strings
    * that don't parse as `scheme://...` pass through unchanged — a
    * curation pipeline filters those separately rather than silently
    * rewriting them. */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(part(url, 1))
    // userinfo is stripped FIRST: 'http://x@a.com/' and 'http://a.com/'
    // are the same page, and keeping it would let a crafted 'user@' both
    // defeat exact dedup and (in urlHost) bypass ban lists
    val noUser = regexp_replace(lower(part(url, 2)), "^[^@]*@", "")
    val noWww  = regexp_replace(noUser, "^www\\.", "")
    val auth = when(scheme === "http", regexp_replace(noWww, ":80$", ""))
      .when(scheme === "https", regexp_replace(noWww, ":443$", ""))
      .otherwise(noWww)
    val stripped = regexp_replace(part(url, 3), "/$", "")
    val path = when(stripped === "", lit("/")).otherwise(stripped)
    val query = array_join(
      filter(split(part(url, 4), "&"), p =>
        p =!= "" && !paramKey(p).startsWith("utm_") &&
          !paramKey(p).isInCollection(TrackingParams)),
      "&")
    val canon = concat(scheme, lit("://"), auth, path,
      when(query === "", lit("")).otherwise(concat(lit("?"), query)))
    when(part(url, 1) === "", url).otherwise(canon)
  }

  /** Hostname of a URL: lowercased authority without the RFC-3986
    * userinfo or the port — 'http://x@banned.com:8080/' hosts at
    * 'banned.com' (treating userinfo as host let it bypass ban lists and
    * split domain caps). */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(part(url, 2)), "^[^@]*@", ""), ":[0-9]+$", "")

  /** Registered-domain approximation: the last two dot-separated labels of
    * the host (`sub.a.example.com` → `example.com`), the whole host when it
    * has no dot. A faithful answer needs the public-suffix list (so
    * `a.co.uk` would wrongly collapse to `co.uk` here) — documented
    * approximation, the PSL is not available offline and the cap/grouping
    * semantics don't change. */
  def registeredDomain(url: Column): Column = {
    val host = regexp_replace(urlHost(url), "^www\\.", "")
    val dom = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    when(dom === "", host).otherwise(dom)
  }

  /** True when the URL's host is `blocked` or a subdomain of a blocked
    * entry (`example.com` bans `a.b.example.com`) — ban-list semantics.
    * The list rides the plan as a literal array (curation ban lists are
    * thousands of entries — well under broadcast scale), so the filter
    * is a narrow stage. */
  def hostBlocked(url: Column, blocked: Seq[String]): Column = {
    val host = urlHost(url)
    // normalize the entries to the host's casing — a mixed-case ban entry
    // would otherwise silently never match the lowercased host
    exists(typedlit(blocked.map(_.trim.toLowerCase)),
      b => host === b || host.endsWith(concat(lit("."), b)))
  }

  /** Drop rows whose host matches the ban list ([[hostBlocked]]). */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame =
    df.filter(!hostBlocked(col(urlCol), blocked))

  /** Keep at most `maxPerDomain` rows per registered domain, chosen by a
    * deterministic hash order of `idCol` (rerun- and growth-stable like
    * `Sampling.hashSplit` — a domain's survivors only change if ids with
    * smaller hashes arrive). Adds a `domain` column. The `row_number` ≤ k
    * plan runs as WindowGroupLimit: map-side top-k per domain before the
    * one exchange on `domain`. Skewed domain histograms are the norm on
    * web data — run `Scale.skewProfile` on `domain` first if the cap
    * feeds a join. */
  def domainCap(df: DataFrame, urlCol: String, idCol: String,
      maxPerDomain: Int, portable: Boolean = false): DataFrame = {
    require(maxPerDomain > 0, s"domainCap needs maxPerDomain > 0, got $maxPerDomain")
    val ord = if (portable) Dedup.portableHash60(col(idCol).cast("string"))
              else abs(xxhash64(col(idCol).cast("string")))
    val w = Window.partitionBy(col("domain")).orderBy(col("_cap_ord"), col(idCol))
    df.withColumn("domain", registeredDomain(col(urlCol)))
      .withColumn("_cap_ord", ord)
      .withColumn("_cap_rn", row_number().over(w))
      .filter(col("_cap_rn") <= maxPerDomain)
      .drop("_cap_ord", "_cap_rn")
  }
}
