package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.functions.UrlFns

/** Forty-third query wave: crawl-side URL hygiene — canonicalization as an
  * oracle-checked per-row transform (q260) and canonical-URL dedup rolled
  * up by registered domain (q261), the TIER-0 dedup a web corpus runs
  * before any content fingerprint: re-crawls differing only in case,
  * default port, fragment, tracking params, or query order collapse on a
  * map-side key, no document bytes touched.
  *
  * The fixture has no URL column, so both engines synthesize the same
  * deterministic URLs from (doc_id, source) — mixed-case scheme/host, a
  * `:443` default port, a PER-DOCUMENT `utm_campaign` tracking param (so
  * zero duplicates exist unless tracking-param removal works), unsorted
  * params, and a per-document fragment. Canonical-key cardinality is
  * 3·5·7 = 105 per source, so real duplicate mass exists at every SF.
  */
object Queries43 {

  type Q = (SparkSession, String) => DataFrame

  private def synthUrl(d: Column, source: Column): Column =
    concat(lit("HTTPS://WWW."), source, lit(".Example"),
      (d % 3).cast("string"), lit(".COM:443/Docs/"), (d % 5).cast("string"),
      lit("?utm_campaign=c"), d.cast("string"),
      lit("&id="), (d % 7).cast("string"),
      lit("#sec"), d.cast("string"))

  private val synthUrlSql: String =
    "'HTTPS://WWW.' || source || '.Example' || (doc_id % 3)::VARCHAR ||" +
      " '.COM:443/Docs/' || (doc_id % 5)::VARCHAR ||" +
      " '?utm_campaign=c' || doc_id::VARCHAR ||" +
      " '&id=' || (doc_id % 7)::VARCHAR || '#sec' || doc_id::VARCHAR"

  /** The canonicalization steps in DuckDB, mirroring
    * [[graft.functions.UrlFns.canonicalizeUrl]] one-for-one. */
  private val canonCteSql: String =
    s"""raw AS (SELECT doc_id, $synthUrlSql AS url FROM documents),
       |nf AS (SELECT doc_id, regexp_replace(url, '#.*$$', '') AS u FROM raw),
       |pieces AS (SELECT doc_id,
       |    lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
       |      AS scheme,
       |    lower(regexp_extract(u,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1)) AS hostport,
       |    regexp_extract(u,
       |      '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$$', 1) AS rest
       |  FROM nf),
       |parts AS (SELECT doc_id, scheme,
       |    CASE WHEN scheme = 'https'
       |           THEN regexp_replace(hostport, ':443$$', '')
       |         WHEN scheme = 'http'
       |           THEN regexp_replace(hostport, ':80$$', '')
       |         ELSE hostport END AS host,
       |    regexp_extract(rest, '^([^?]*)', 1) AS path,
       |    regexp_extract(rest, '\\?(.*)$$', 1) AS query
       |  FROM pieces),
       |canon AS (SELECT doc_id, scheme, host,
       |    scheme || '://' || host ||
       |    (CASE WHEN path = '' THEN '/' ELSE path END) ||
       |    (CASE WHEN sq = '' THEN '' ELSE '?' || sq END) AS canonical
       |  FROM (SELECT *, array_to_string(list_sort(list_filter(
       |          string_split(query, '&'),
       |          p -> p <> '' AND NOT regexp_matches(p,
       |            '^(utm_[^=]*|fbclid|gclid)(=|$$)'))), '&') AS sq
       |        FROM parts))""".stripMargin

  /** Per-row canonicalization on a deterministic id slice — the transform
    * itself hash-checked (case/port/fragment/tracking/sort each visible
    * in the output). [[graft.functions.UrlFns.canonicalizeUrl]]. */
  val q260UrlCanonical: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 3L)
      .select(col("doc_id"),
        UrlFns.canonicalizeUrl(synthUrl(col("doc_id"), col("source")))
          .as("canonical"))
      .orderBy("doc_id")

  val q260Sql: String =
    s"""WITH $canonCteSql
       |SELECT doc_id, canonical FROM canon WHERE doc_id % 10 = 3
       |ORDER BY doc_id""".stripMargin

  /** Canonical-URL dedup by registered domain: per domain the raw URL
    * count, distinct canonical count, and the duplicate share removed by
    * canonicalization ALONE (every URL here is unique pre-canonical —
    * the per-doc utm_campaign guarantees it).
    * [[graft.functions.UrlFns.registeredDomain]]. */
  val q261UrlDedupDomains: Q = (spark, dir) =>
    Tables.documents(spark, dir)
      .select(
        UrlFns.canonicalizeUrl(synthUrl(col("doc_id"), col("source")))
          .as("canonical"))
      .select(col("canonical"),
        UrlFns.registeredDomain(UrlFns.urlHost(col("canonical")))
          .as("domain"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_urls"),
        count_distinct(col("canonical")).as("n_canonical"))
      .select(col("domain"), col("n_urls"), col("n_canonical"),
        expr("(n_urls - n_canonical) * 1000000L div n_urls")
          .cast("long").as("dup_ppm"))
      .orderBy("domain")

  val q261Sql: String =
    s"""WITH $canonCteSql,
       |dom AS (SELECT canonical,
       |    CASE WHEN len(ls) >= 2
       |         THEN array_to_string(ls[len(ls) - 1 : len(ls)], '.')
       |         ELSE host END AS domain
       |  FROM (SELECT canonical, host, string_split(host, '.') AS ls
       |        FROM canon)),
       |g AS (SELECT domain, count(*)::BIGINT AS n_urls,
       |    count(DISTINCT canonical)::BIGINT AS n_canonical
       |  FROM dom GROUP BY 1)
       |SELECT domain, n_urls, n_canonical,
       |  ((n_urls - n_canonical) * 1000000 // n_urls)::BIGINT AS dup_ppm
       |FROM g ORDER BY domain""".stripMargin

  val all: Map[String, Q] = Map(
    "q260_url_canonical" -> q260UrlCanonical,
    "q261_url_dedup_domains" -> q261UrlDedupDomains)

  val oracle: Map[String, String] = Map(
    "q260_url_canonical" -> q260Sql,
    "q261_url_dedup_domains" -> q261Sql)
}
