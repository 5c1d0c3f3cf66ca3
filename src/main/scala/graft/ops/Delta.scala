package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus RELEASE-DELTA operator — diff two corpus snapshots by key and
  * content fingerprint: the artifact a versioned dataset release ships next
  * to its datasheet (what changed since the previous release), and the
  * input to incremental recomputation (only `added`/`changed` documents
  * need re-cleaning, re-embedding, re-sharding). The reference pipeline
  * re-crawls its sources wholesale (REDDIT-Recuperation-*.py re-fetch full
  * listings each run); diffing releases is how that loop stops being
  * O(corpus) per refresh.
  *
  * Scale shape: each side is reduced AT THE SCAN to (key, 16-byte md5 of
  * the payload columns, carried metadata) — the full-outer equi-join on
  * the key therefore shuffles tens of bytes per document, never document
  * bodies. One shuffle total, AQE-skew-safe, stateless, resumable.
  */
object Delta {

  /** Full-outer diff of `prev` vs `cur` on `keyCol`.
    *
    * Output: one row per key present in EITHER snapshot — `keyCol`,
    * `status` ∈ {added, removed, changed, unchanged} (relative to `prev` →
    * `cur`), and each of `carryCols` coalesced current-side-first (so
    * `removed` rows keep their last-known metadata).
    *
    * The fingerprint is md5 over `payloadCols` joined with a unit (U+001F)
    * separator, nulls as empty string — the same convention as
    * [[Dedup]]'s exact fingerprints, so a release diff and a dedup pass
    * agree on what "same content" means. */
  def releaseDiff(prev: DataFrame, cur: DataFrame, keyCol: String,
      payloadCols: Seq[String], carryCols: Seq[String] = Nil): DataFrame = {
    def slim(d: DataFrame, tag: String) = d.select(
      col(keyCol).as(s"__${tag}_k") +:
        md5(concat_ws("\u001f",
          payloadCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
          .as(s"__${tag}_fp") +:
        carryCols.map(c => col(c).as(s"__${tag}_$c")): _*)
    slim(prev, "p").join(slim(cur, "c"),
        col("__p_k") === col("__c_k"), "full_outer")
      .select(
        coalesce(col("__c_k"), col("__p_k")).as(keyCol) +:
          when(col("__p_k").isNull, "added")
            .when(col("__c_k").isNull, "removed")
            .when(col("__p_fp") === col("__c_fp"), "unchanged")
            .otherwise("changed").as("status") +:
          carryCols.map(c => coalesce(col(s"__c_$c"), col(s"__p_$c")).as(c)): _*)
  }
}
