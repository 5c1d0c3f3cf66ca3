package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side TIER-0 dedup key: before any
  * content fingerprint runs, a web corpus collapses re-crawls of the same
  * resource whose URLs differ only in case, default ports, fragments,
  * tracking parameters, or query-parameter order. At 100 TB this is a
  * map-side projection ahead of the q07 fingerprint shuffle — it removes
  * the cheapest duplicate class without touching document bytes.
  *
  * The spec is deliberately REGEX/LIST-portable (every step has the same
  * spelling in DuckDB), so the transform itself is oracle-hash-checked
  * per row (q260) rather than trusted:
  *
  *  1. strip the `#fragment`;
  *  2. lowercase the scheme and the host (path/query case PRESERVED —
  *     paths are case-sensitive on most origins);
  *  3. strip the scheme's default port (`:443` for https, `:80` for http);
  *  4. drop tracking query params (`utm_*`, `fbclid`, `gclid`);
  *  5. sort the surviving query params bytewise (param order is
  *     almost never semantic; sorting makes the key order-independent);
  *  6. an empty path becomes `/`; an emptied query drops its `?`.
  *
  * Trailing-slash folding and percent-decoding are deliberately NOT done:
  * both change semantics on real origins (`/a` vs `/a/` can differ;
  * decoding can merge distinct resources). The HOF steps (filter/sort
  * over the param list) are interpreted — fine for a cleaning projection;
  * fuse into a kernel only if a profile ever shows it hot. */
object UrlFns {

  private val TrackingParam = "^(utm_[^=]*|fbclid|gclid)(=|$)"

  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1))
    val host =
      when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
        .when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
        .otherwise(hostPort)
    val rest = regexp_extract(noFrag,
      "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParam))
    val sortedQ = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host,
      when(path === "", lit("/")).otherwise(path),
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ)))
  }

  /** Registered domain, public-suffix-LITE: the last two host labels
    * (`a.b.example.com` → `example.com`). A real deployment swaps in the
    * public-suffix list (the two-label rule mis-handles `co.uk`-class
    * suffixes — documented limitation, same on both engines); hosts with
    * fewer than two labels pass through unchanged. Port must already be
    * stripped (feed it [[canonicalizeUrl]] output's host or a bare host). */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    when(size(labels) >= 2,
      array_join(slice(labels, size(labels) - 1, lit(2)), "."))
      .otherwise(host)
  }

  /** Host of an (already canonical) URL. */
  def urlHost(u: Column): Column =
    regexp_extract(u, "^[a-z][a-z0-9+.-]*://([^/?]*)", 1)
}
