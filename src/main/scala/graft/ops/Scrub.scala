package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus SCRUBBING operators — the cleaning steps between raw text and a
  * training corpus that the reference's cleaning stage
  * (REDDIT-Nettoyage-Posts.py:31-43: deleted markers, bot signatures) is
  * the platform-specific instance of, generalized to the two scrubs every
  * public pretraining pipeline runs (C4, Raffel et al. 2020 §2.2; Dolma,
  * Soldaini et al. 2024 §4):
  *
  *  - [[redactPii]]: pattern-based PII masking (emails, phone numbers)
  *    with per-category match counts, so downstream audits can report
  *    redaction rates without re-scanning.
  *  - [[stripBoilerplateLines]]: remove lines that recur across many
  *    DISTINCT documents (nav bars, cookie banners, footers) — CCNet/Dolma
  *    line-level dedup. Document-level dedup ([[Dedup]]) cannot catch
  *    these: each document is unique, only its furniture repeats.
  *
  * Both are deterministic string/integer transforms (no RNG, no floats),
  * so they hash-check against the DuckDB oracle; regexes are kept in the
  * RE2-compatible subset (no backrefs, no lookaround) so the same pattern
  * text means the same language in Java regex and DuckDB/RE2.
  */
object Scrub {

  /** Unicode-NFC normalize `textCol` in place and report what changed:
    * adds `nfc_changed` (did normalization alter the string) and
    * `nfc_chars_delta` (code points removed by canonical composition —
    * e.g. `e` + COMBINING ACUTE collapsing to `é`; ≥ 0 for pure
    * composition, composition exclusions can make it negative).
    *
    * Every tokenizer/dedup/fingerprint stage downstream assumes ONE
    * canonical byte form per grapheme — decomposed and composed spellings
    * of the same text would otherwise hash apart and tokenize apart, so
    * this runs once at ingest, before any fingerprinting. Backed by the
    * codegen'd [[graft.expr.NfcNormalize]] kernel whose ASCII fast path
    * skips the whole decode for single-byte rows (the common case).
    * Scale shape: pure map-side projection, no shuffle. */
  def normalizeNfc(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val n = graft.expr.TextExprs.nfcNormalize(t)
    df.withColumn("nfc_text", n)
      .withColumn("nfc_changed", col("nfc_text") =!= t)
      .withColumn("nfc_chars_delta", (length(t) - length(col("nfc_text"))).cast("long"))
  }

  /** RE2-safe email pattern (user@host.tld). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** RE2-safe phone pattern: international-ish digit runs with separators
    * (a leading +, then 8+ of digits/dashes, ending in a digit). */
  val phonePattern = "\\+?\\d[\\d-]{7,}\\d"

  /** Mask emails and phone numbers in `textCol`, emitting the scrubbed
    * text plus per-category match counts.
    *
    * Output columns: `red_text` (emails replaced by `[EMAIL]`, then phones
    * by `[PHONE]`), `n_emails`, `n_phones`. The stages run SEQUENTIALLY
    * and each stage counts matches in its own input (phones are counted
    * after email masking), so a digit-run inside an email's local part is
    * never double-reported — the counts are exactly "replacements this
    * stage made".
    *
    * Scale shape: pure map-side projection (regexp_replace +
    * regexp_extract_all are codegen'd unary string ops) — no shuffle, no
    * state; composes anywhere in a pipeline at any scale. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val e1 = regexp_replace(t, emailPattern, "[EMAIL]")
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(emailPattern), lit(0))).cast("long"))
      .withColumn("n_phones", size(regexp_extract_all(e1, lit(phonePattern), lit(0))).cast("long"))
      .withColumn("red_text", regexp_replace(e1, phonePattern, "[PHONE]"))
  }

  /** Remove lines occurring in at least `minDocs` DISTINCT documents and
    * reassemble each document in original line order.
    *
    * Output per input row: the `idCol`, `clean_text` (surviving lines
    * joined by newline; empty string when every line was boilerplate),
    * `n_kept`, `n_dropped` (line counts).
    *
    * Scale shape: split+posexplode is map-side; line document-frequency is
    * one aggregation keyed by line text with a distinct-doc count (Spark
    * plans count(DISTINCT) as a two-stage partial-dedup aggregate — the
    * dedup happens map-side per partition before any shuffle, and the
    * heavy key (a repeated boilerplate line) arrives at its reducer
    * already collapsed to one row per (line, doc-partition)). The verdict
    * joins back to the exploded lines on the line text, and the per-doc
    * reassembly (sorted collect over that doc's OWN lines — bounded by
    * document length, never by corpus size) is the second and final
    * shuffle. At 100 TB, hash lines to 64-bit keys (xxhash64) before the
    * frequency agg to shrink shuffle bytes — raw text kept here so the
    * DuckDB oracle can spell the identical plan. */
  def stripBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
      minDocs: Int): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("__pos", "__line")))
    val freq = lines.groupBy(col("__line"))
      .agg(countDistinct(col(idCol)).as("__nd"))
    val kept = lines.join(freq, Seq("__line"))
      .withColumn("__keep", col("__nd") < minDocs)
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(when(col("__keep"),
              struct(col("__pos"), col("__line"))).otherwise(null))),
            s => s.getField("__line")),
          "\n").as("clean_text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("__keep"), 0L).otherwise(1L)).as("n_dropped"))
    df.select(col(idCol))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"))
  }

  /** k-anonymity audit over quasi-identifier columns (Sweeney 2002): a
    * row is k-anonymous iff ≥ k rows share its full quasi-identifier
    * tuple; rows in smaller groups would be SUPPRESSED before a privacy-
    * gated release. Returns one row per quasi-identifier group:
    * (quasiCols..., group_n, suppressed) — the caller aggregates this
    * into per-source suppression reports or joins it back to flag rows.
    *
    * Scale shape: one map-side-combined count over the quasi tuple —
    * the |groups|-row frame is the audit artifact; the corpus is never
    * re-shuffled. */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2)
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("group_n"))
      .withColumn("suppressed", col("group_n") < k)
  }
}
