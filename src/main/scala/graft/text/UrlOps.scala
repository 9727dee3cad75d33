package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization + domain extraction — the stage-1 web-corpus
  * curation signals (C4 / RefinedWeb / Dolma all key their first
  * filters on the URL): a crawl's raw URLs differ in case, `www.`,
  * trailing slashes, tracking parameters, and fragments while naming
  * the SAME resource, so URL-level dedup, blocklists, and per-domain
  * caps all need a canonical form first. Everything here is pure
  * Column expressions over Spark's `parse_url` builtin + string/array
  * functions — no UDF, no shuffle; canonicalizing a 100-TB URL column
  * is a map over the scan. The `try_` spelling makes malformed URLs
  * null (→ quarantine) instead of an ANSI runtime error.
  *
  * ==Canonical form==
  * `lower(scheme)://host'[path'][?query']` where
  *  - host': lowercased, leading `www.` stripped (ports never appear:
  *    `parse_url(..., 'HOST')` excludes them);
  *  - path': trailing `/` stripped; a bare root path disappears;
  *  - query': tracking parameters dropped (`utm_*`, `fbclid`,
  *    `gclid`, `msclkid`, `mc_cid`, `mc_eid`, `ref`), the rest
  *    SORTED so parameter order cannot split a URL's identity;
  *  - fragment: always dropped (`parse_url` never returns it in
  *    HOST/PATH/QUERY).
  *
  * ==Registrable domain==
  * [[registrableDomain]] is eTLD+1 against the vendored trimmed
  * Public Suffix List ([[PublicSuffix]] — wildcard and exception
  * rules included, so `pref.hokkaido.jp`-class prefecture suffixes
  * and `*.ck`-class registries group correctly).
  * [[registrableDomainApprox]] keeps the earlier pure-arithmetic
  * approximation (last two labels, three under a generic-SLD ccTLD)
  * for callers that need a zero-resource closed form — e.g. an
  * engine-portable SQL twin. */
object UrlOps {

  /** `try_parse_url`: null on malformed input (ANSI `parse_url`
    * throws) — malformed URLs must quarantine, not kill the job. */
  private def pu(url: Column, part: String): Column =
    call_function("try_parse_url", url, lit(part))

  private val TrackingExact =
    Seq("fbclid", "gclid", "msclkid", "mc_cid", "mc_eid", "ref")
  private val GenericSld =
    Seq("co", "com", "net", "org", "ac", "gov", "edu")

  /** Lowercased host with any leading `www.` stripped. */
  def canonicalHost(url: Column): Column =
    regexp_replace(lower(pu(url, "HOST")), "^www\\.", "")

  /** Path with the trailing slash stripped (root path → empty). */
  def canonicalPath(url: Column): Column =
    regexp_replace(coalesce(pu(url, "PATH"), lit("")),
                   "/+$", "")

  /** Query with tracking parameters dropped and the survivors sorted;
    * empty string when nothing survives. */
  def canonicalQuery(url: Column): Column = {
    val params = filter(
      split(coalesce(pu(url, "QUERY"), lit("")), "&"),
      p => {
        val key = lower(split(p, "=").getItem(0))
        !(key.startsWith("utm_") || key.isInCollection(TrackingExact) ||
          p === "")
      })
    array_join(array_sort(params), "&")
  }

  /** The full canonical URL (see object scaladoc); null for a null or
    * hostless input — callers quarantine on it. */
  def canonicalizeUrl(url: Column): Column = {
    val host = canonicalHost(url)
    val q = canonicalQuery(url)
    when(host.isNull || host === "", lit(null))
      .otherwise(concat(
        lower(pu(url, "PROTOCOL")), lit("://"), host,
        canonicalPath(url),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** eTLD+1 of a (canonical) host against the trimmed PSL — see
    * [[PublicSuffix]]. */
  def registrableDomain(host: Column): Column =
    PublicSuffix.registrableDomain(host)

  /** Approximate eTLD+1 WITHOUT the suffix list — last two labels,
    * three when the second-to-last is a generic second-level name
    * under a 2-letter ccTLD. Kept for zero-resource/closed-form
    * callers; agrees with [[registrableDomain]] everywhere outside
    * the PSL's exotic multi-label and wildcard suffixes. */
  def registrableDomainApprox(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val genericUnderCc =
      element_at(labels, -2).isInCollection(GenericSld) &&
        length(element_at(labels, -1)) === 2
    when(n >= 3 && genericUnderCc, concat_ws(".", slice(labels, -3, 3)))
      .when(n >= 2, concat_ws(".", slice(labels, -2, 2)))
      .otherwise(host)
  }

  /** SURT key (Sort-friendly URI Reordering Transform) — the
    * ordering Common Crawl / Wayback CDX indexes use: host labels
    * REVERSED and comma-joined, a `)` separator, then path?query,
    * everything lowercased; applied here over the canonical form
    * above (www/trailing-slash/tracking-param/order noise already
    * collapsed). Reversing the host puts the most-significant label
    * first, so under a plain string sort EVERY domain — and every
    * subdomain subtree — becomes ONE contiguous key range:
    * `example,beta)` rows sit between `example,alpha)` and
    * `example,beta,news)`, and a "all URLs of beta.example" lookup
    * over a SURT-sorted (or SURT-range-partitioned) index is a range
    * scan with file/partition pruning, never a full-index filter.
    * That locality is the entire reason CDX files are SURT-sorted —
    * and the property to ask for when laying a 100-TB URL index out
    * on disk. Null (→ quarantine) for hostless/malformed input.
    * Pure builtin expressions: codegen'd, map over the scan. */
  def surtKey(url: Column): Column = {
    // lowercase FIRST (Wayback's default canonicalizer does), so the
    // query-param sort happens on the folded spelling
    val u = lower(url)
    val host = canonicalHost(u)
    val q = canonicalQuery(u)
    when(host.isNull || host === "", lit(null))
      .otherwise(concat(
        array_join(reverse(split(host, "\\.")), ","),
        lit(")"), canonicalPath(u),
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }
}
