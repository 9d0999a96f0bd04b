package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus curation (the RefinedWeb/CCNet web-pipeline stages
  * that run BEFORE content dedup — Penedo et al. 2023, arXiv:2306.01116
  * §3.1: URL filtering, exact-URL dedup, per-domain caps): normalize
  * crawl URLs to a canonical form, extract the registrable host,
  * drop blocklisted domains, keep one document per URL, and bound any
  * single domain's share of the corpus.
  *
  * Normalization contract (deterministic, replayable in ANSI SQL so
  * the oracle can pin it): lowercase the scheme and host, keep the
  * path/query case-sensitive (RFC 3986 — host is case-insensitive,
  * path is not), drop the #fragment, strip trailing '/' runs from the
  * PATH only (a query string is preserved byte-for-byte — '?next=/'
  * and '?next=' are distinct URLs).
  *
  * Scale design: normalization/domain are per-row expressions
  * (map-only, codegen); the blocklist broadcasts (it is a curated
  * list, not data-sized); URL dedup and domain caps rank through the
  * bounded-heap top-k operator — one shuffle on the url/domain key
  * with k rows of reducer state per key, never a per-key sort. A
  * boilerplate-heavy domain with 10⁸ pages costs its cap, not its
  * page count. */
object UrlOps {

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  // path only (host..'?'/'#') — trailing-slash stripping must not
  // reach into a query string ('?next=/' is a distinct URL from
  // '?next=')
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  // query incl. its '?' (path..'#'); '' when absent
  private val queryRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*[^?#]*(\\?[^#]*)"

  /** A working-column name absent from `taken` — the same invariant as
    * `Sampling.freshName`: internal columns must never collide with
    * (and silently drop) a user column of the same name. */
  private def freshName(base: String, taken: Set[String]): String = {
    var name = base
    var i = 0
    while (taken(name)) { i += 1; name = s"${base}_$i" }
    name
  }

  private def requireAbsent(df: DataFrame, out: String*): Unit =
    out.foreach(c => require(!df.columns.contains(c),
      s"output column '$c' already exists on the input — rename it first"))

  /** Canonical URL per the contract above. Rows that do not look like
    * scheme://host URLs pass through trimmed but CASE-PRESERVED — for
    * dedup the conservative fallback is the one that cannot merge
    * distinct keys (schemeless crawl rows differing only in path case
    * must stay distinct); filter such rows upstream if they are
    * noise. */
  def normalizeUrl(url: Column): Column = {
    val scheme = regexp_extract(url, schemeRe, 1)
    val host = regexp_extract(url, hostRe, 1)
    val path = regexp_extract(url, pathRe, 1)
    val query = regexp_extract(url, queryRe, 1)
    when(scheme =!= "",
      concat(lower(scheme), lit("://"), lower(host),
        rtrim(path, "/"), query))
      .otherwise(trim(url))
  }

  /** Registrable host for blocklists/caps: the authority lowercased,
    * with userinfo (`user@`), port (`:8080`) and trailing dots
    * stripped — spellings of one host must land on ONE key or an
    * exact-match blocklist is trivially bypassed and a domain cap
    * fragments. ('' when the value is not a scheme://host URL.)
    * [[normalizeUrl]] deliberately keeps the full authority: `:8080`
    * is a different origin for URL identity, but the same DOMAIN for
    * rate/blocking purposes. */
  def domainOf(url: Column): Column = {
    val auth = regexp_extract(url, hostRe, 1)
    lower(rtrim(
      regexp_replace(regexp_replace(auth, "^.*@", ""), ":[0-9]*$", ""),
      "."))
  }

  /** Drop rows whose domain is on the blocklist. The blocklist is a
    * curated artifact (thousands of rows, not corpus-sized) — broadcast
    * left-anti, corpus never shuffles. */
  def filterBlocked(df: DataFrame, urlCol: String,
      blocked: DataFrame): DataFrame = {
    val dom = freshName("__dom", df.columns.toSet)
    df.withColumn(dom, domainOf(col(urlCol)))
      .join(broadcast(blocked.select(lower(col(blocked.columns.head))
        .as(dom))), Seq(dom), "left_anti")
      .drop(dom)
  }

  /** Exact-URL dedup: one survivor per normalized URL — the smallest
    * id (first-crawled under monotone ids), the RefinedWeb choice.
    * Bounded-heap k=1 per URL: one shuffle, one row of state per
    * distinct URL. Output keeps (normalized `url_norm`, survivor
    * row); fails loudly if the input already has a `url_norm`/`rank`
    * column rather than silently clobbering it. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    import graft.plans.TopK
    requireAbsent(df, "url_norm", "rank")
    TopK.perKey(df.withColumn("url_norm", normalizeUrl(col(urlCol))),
        Seq("url_norm"), Seq(TopK.asc(idCol)), k = 1)
      .drop("rank")
  }

  /** Per-domain document cap: at most `cap` rows per domain, smallest
    * ids surviving (deterministic). `domain_rank` (1-based) rides
    * along. Fails loudly on `domain`/`domain_rank`/`rank` input
    * collisions. */
  def capPerDomain(df: DataFrame, idCol: String, urlCol: String,
      cap: Int): DataFrame = {
    import graft.plans.TopK
    requireAbsent(df, "domain", "domain_rank", "rank")
    TopK.perKey(df.withColumn("domain", domainOf(col(urlCol))),
        Seq("domain"), Seq(TopK.asc(idCol)), k = cap)
      .withColumnRenamed("rank", "domain_rank")
  }
}
