package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Population-stability-index drift report between two releases of a
    * bucketed statistic — the governance table a versioned dataset ships
    * next to its [[releaseDiff]]: per bucket, the Laplace-smoothed share
    * of each release in ppm and the bucket's PSI contribution
    * `floor((p_prev − p_cur)·ln(p_prev/p_cur)·1 + 0.5)` in micro-units
    * (sum the column for the headline PSI; < 0.1 stable, > 0.25 shifted,
    * by the usual credit-scoring reading). Smoothing is add-one over the
    * observed bucket union, so an empty-on-one-side bucket contributes a
    * finite, engine-exact term instead of ±∞.
    *
    * Scale shape: each side collapses to a |buckets|-row aggregate before
    * anything joins (map-side combined); the totals ride in as a
    * broadcast 1-row frame. The single ln() per BUCKET is floored to
    * micro-units (the q61/q130 libm discipline) — corpus size never
    * touches a double.
    *
    * Output: (bucketCol, n_prev, n_cur, p_prev_ppm, p_cur_ppm, psi_e6). */
  def psiReport(prev: DataFrame, cur: DataFrame, bucketCol: String): DataFrame = {
    val a = prev.groupBy(col(bucketCol)).agg(count(lit(1)).as("n_prev"))
    val b = cur.groupBy(col(bucketCol)).agg(count(lit(1)).as("n_cur"))
    val j = a.join(b, Seq(bucketCol), "full_outer")
      .select(col(bucketCol),
        coalesce(col("n_prev"), lit(0L)).as("n_prev"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .localCheckpoint(eager = false)
    val tot = j.agg(sum(col("n_prev")).as("__ta"), sum(col("n_cur")).as("__tb"),
      count(lit(1)).as("__nb"))
    j.crossJoin(broadcast(tot))
      .withColumn("p_prev_ppm", expr("(n_prev + 1) * 1000000L div (__ta + __nb)"))
      .withColumn("p_cur_ppm", expr("(n_cur + 1) * 1000000L div (__tb + __nb)"))
      .withColumn("psi_e6",
        floor((col("p_prev_ppm") - col("p_cur_ppm")).cast("double") *
          log(col("p_prev_ppm").cast("double") / col("p_cur_ppm").cast("double"))
          + 0.5).cast("long"))
      .select(col(bucketCol), col("n_prev"), col("n_cur"),
        col("p_prev_ppm"), col("p_cur_ppm"), col("psi_e6"))
  }

  /** Per-document shingle NOVELTY against an existing corpus — the
    * release-governance number behind "how much of this crawl is
    * actually new": each candidate document's distinct word n-grams are
    * checked for containment in the previous release's n-gram set, and
    * `novelty_ppm = (n_shingles − n_contained) · 1e6 div n_shingles`.
    * The same containment estimate drives crawl-dump triage (C4-style
    * novelty filters) and incremental-ingest budgeting.
    *
    * Scale shape: the previous corpus collapses to its DISTINCT n-gram
    * set once (a map-side-combined aggregate — fingerprint-sized rows,
    * never documents); the candidate side explodes to (doc, distinct
    * shingle) and the containment check is ONE equi-join on the shingle —
    * the [[Decontaminate]] cross-set discipline, never a text scan of
    * prev × cur. Documents with fewer than `n` tokens have no shingles
    * and report novelty 1e6 (nothing anchors them to the old corpus). */
  def shingleNovelty(prev: DataFrame, cur: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    require(n >= 1)
    def shingles(df: DataFrame, keep: Seq[Column]): DataFrame = {
      // token array projected once per row — an interpreted HOF lambda
      // re-evaluates captured expressions per element (the q161 lesson)
      val sh = when(size(col("__t")) >= n,
          transform(sequence(lit(1), size(col("__t")) - (n - 1)),
            i => array_join(slice(col("__t"), i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))
      df.select(keep :+ filter(graft.functions.TextFns.wordTokens(col(textCol)),
          t => t =!= "").as("__t"): _*)
        .select(keep :+ explode(sh).as("shingle"): _*)
    }
    val prevSet = shingles(prev, Seq.empty).distinct()
      .withColumnRenamed("shingle", "__ps")
    val curSh = shingles(cur, Seq(col(idCol))).distinct()
    val contained = curSh
      .join(prevSet, col("shingle") === col("__ps"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("__ps").isNotNull, 1L).otherwise(0L)).as("n_contained"))
    cur.select(col(idCol)).join(contained, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_contained"), lit(0L)).as("n_contained"))
      .withColumn("novelty_ppm",
        when(col("n_shingles") === 0L, lit(1000000L))
          .otherwise(expr(
            "(n_shingles - n_contained) * 1000000L div n_shingles")))
  }

  /** Emerging-terms drift report: the `topK` tokens whose smoothed rate
    * grew most from the `old` slice to the `new` slice — the per-token
    * drift readout next to [[psiReport]]'s bucket-level PSI (a new crawl
    * source, a meme, a spam campaign show up HERE first). Rates are
    * add-one smoothed over (slice total + pooled vocab); each rate is
    * floored to ppb FIRST, then the ratio to ppm — two documented floors
    * instead of one int64-overflowing product (the q216 lesson).
    *
    * Output: (term, c_old, c_new, r_old_ppb, r_new_ppb, lift_ppm), top
    * `topK` by (lift desc, term asc). Scale shape: one conditional
    * (term, slice) aggregate over the exploded stream; totals and the
    * pooled vocab are a 1-row cross join; the top-k is
    * TakeOrderedAndProject, never a full-vocab sort partition. */
  def emergingTerms(df: DataFrame, textCol: String,
      isNew: Column, topK: Int): DataFrame = {
    val tok = df.select(isNew.as("__new"),
        explode(graft.functions.TextFns.wordTokens(col(textCol)))
          .as("term"))
      .filter(col("term") =!= "")
    val counts = tok.groupBy(col("term"))
      .agg(sum(when(col("__new"), 0L).otherwise(1L)).as("c_old"),
        sum(when(col("__new"), 1L).otherwise(0L)).as("c_new"))
      .localCheckpoint(false)
    val totals = counts.agg(sum(col("c_old")).as("__to"),
      sum(col("c_new")).as("__tn"), count(lit(1)).as("__v"))
    counts.crossJoin(broadcast(totals))
      .withColumn("r_old_ppb",
        expr("(c_old + 1L) * 1000000000L div (__to + __v)"))
      .withColumn("r_new_ppb",
        expr("(c_new + 1L) * 1000000000L div (__tn + __v)"))
      // greatest(…,1): past ~1e9 tokens the ppb floor can reach 0 for
      // hapaxes — clamp so the ratio stays defined, same in both engines
      .withColumn("lift_ppm",
        expr("r_new_ppb * 1000000L div greatest(r_old_ppb, 1L)"))
      .orderBy(col("lift_ppm").desc, col("term").asc)
      .limit(topK)
      .select(col("term"), col("c_old"), col("c_new"), col("r_old_ppb"),
        col("r_new_ppb"), col("lift_ppm"))
  }

  /** Slowly-changing-dimension Type-2 build: collapse a keyed change log
    * into effective-dated attribute versions — the warehouse spelling of
    * "history table from events". Rows are ordered per key by
    * (`orderCol`, `tieCol`); consecutive runs of the same `attrCol`
    * value become one version row.
    *
    * Output: (key, version, attr, effective_from, effective_to,
    * is_current, n_rows) — `effective_from` is the first `orderCol` of
    * the run, `effective_to` the next version's start (NULL while
    * current), `is_current` 1/0.
    *
    * Scale shape: the gaps-and-islands classic — one window pass keyed
    * on the dimension key (lag + running sum, both on the same window
    * spec so ONE shuffle), a (key, version) aggregate that reuses that
    * partitioning, and a second tiny window over the version frame for
    * `effective_to`. No self-join of the log. */
  def scd2(log: DataFrame, keyCol: String, attrCol: String,
      orderCol: String, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).asc, col(tieCol).asc)
    val run = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol).asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val versions = log
      .withColumn("__chg",
        when(lag(col(attrCol), 1).over(w).isNull ||
          lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("version", sum(col("__chg")).over(run))
      .groupBy(col(keyCol).as("key"), col("version"))
      .agg(min(col(attrCol)).as("attr"),
        min(col(orderCol)).as("effective_from"),
        count(lit(1)).as("n_rows"))
    val byVer = Window.partitionBy(col("key")).orderBy(col("version").asc)
    versions
      .withColumn("effective_to", lead(col("effective_from"), 1).over(byVer))
      .withColumn("is_current",
        when(col("effective_to").isNull, 1L).otherwise(0L))
      .select(col("key"), col("version"), col("attr"),
        col("effective_from"), col("effective_to"), col("is_current"),
        col("n_rows"))
  }
}
