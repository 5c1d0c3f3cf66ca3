package graft

import org.apache.spark.sql.functions._

import graft.ops.Scrub

/** PII redaction and cross-document boilerplate-line removal (the corpus
  * scrubbing wave). */
class ScrubSpec extends SparkSpec {
  import spark.implicits._

  test("normalizeNfc: composes decomposed sequences; ASCII and composed text untouched") {
    val decomposed = "caf" + "e\u0301"          // e + COMBINING ACUTE
    val composed = "caf\u00e9"                   // precomposed e-acute
    val hangulDecomposed = "\u1100\u1161"      // choseong G + jungseong A
    val df = Seq(
      (1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, hangulDecomposed))
      .toDF("id", "text")
    val out = Scrub.normalizeNfc(df, "text")
      .select($"id", $"nfc_text", $"nfc_changed", $"nfc_chars_delta")
      .as[(Long, String, Boolean, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, composed, true, 1L)))
    assert(out(2L) == ((2L, composed, false, 0L)))
    assert(out(3L) == ((3L, "plain ascii", false, 0L)))
    // NFC composes the jamo pair into the single syllable block 가 (U+AC00)
    assert(out(4L) == ((4L, "\uac00", true, 1L)))
    // idempotence: normalizing the normalized output is the identity
    val again = Scrub.normalizeNfc(
      Scrub.normalizeNfc(df, "text").select($"id", $"nfc_text".as("text")), "text")
    assert(again.filter($"nfc_changed").count() == 0L)
  }

  test("normalizeNfc plans map-side only and its kernel stays in whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(graft.expr.TextExprs.nfcNormalize(col("text")).as("t"))
      .agg(sum(length($"t")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange") || plan.contains("Exchange SinglePartition"),
      s"unexpected wide shuffle:\n$plan")
    val sources = org.apache.spark.sql.graftbridge.Bridge.compileWholeStageCodegen(df)
    assert(sources.exists(_.contains("graft.expr.NormalizeKernels")),
      "nfc kernel call not in generated code")
  }

  test("redactPii: masks emails then phones; stage counts never double-report") {
    val df = Seq(
      (1L, "mail alice.smith@corp.example.org or call +1-555-0100-200 now"),
      (2L, "digits 123456789 inside an email a123456789@host.com only"),
      (3L, "no pii here at all"))
      .toDF("id", "text")
    val out = Scrub.redactPii(df, "text")
      .select($"id", $"n_emails", $"n_phones", $"red_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1L && out(1L)._3 == 1L)
    assert(out(1L)._4 == "mail [EMAIL] or call [PHONE] now")
    // the digit run belongs to the email; phone stage must not re-count it
    assert(out(2L)._2 == 1L && out(2L)._3 == 1L,
      s"standalone digits are a phone, email digits are not: ${out(2L)}")
    assert(out(2L)._4 == "digits [PHONE] inside an email [EMAIL] only")
    assert(out(3L) == ((3L, 0L, 0L, "no pii here at all")))
  }

  test("redactPii plans map-side only: no exchange") {
    val plan = Scrub.redactPii(Seq((1L, "x")).toDF("id", "text"), "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("stripBoilerplateLines: cross-doc lines drop, unique lines survive in order") {
    val footer = "subscribe now"
    val d = Seq(
      (1L, s"alpha one\n$footer\nalpha two"),
      (2L, s"beta one\n$footer"),
      (3L, s"$footer\ngamma one"),
      (4L, "delta only"))
      .toDF("doc_id", "text")
    val out = Scrub.stripBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, "alpha one\nalpha two", 2L, 1L)), "order must be preserved")
    assert(out(2L) == ((2L, "beta one", 1L, 1L)))
    assert(out(3L) == ((3L, "gamma one", 1L, 1L)))
    assert(out(4L) == ((4L, "delta only", 1L, 0L)))
  }

  test("stripBoilerplateLines: frequency counts DISTINCT docs, not occurrences") {
    // "echo" appears 3 times but in only ONE doc: repetition inside a
    // single document is that document's own content, not boilerplate
    val d = Seq(
      (1L, "echo\necho\necho"),
      (2L, "foxtrot"),
      (3L, "golf"))
      .toDF("doc_id", "text")
    val out = Scrub.stripBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out(0) == ((1L, "echo\necho\necho", 3L, 0L)))
  }

  test("stripBoilerplateLines: all-boilerplate doc survives as an empty row") {
    val d = Seq(
      (1L, "legal"), (2L, "legal"), (3L, "legal"),
      (4L, "legal\nreal content"))
      .toDF("doc_id", "text")
    val out = Scrub.stripBoilerplateLines(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == 4, "operator must be total over input rows")
    assert(out(0) == ((1L, "", 0L, 1L)))
    assert(out(3) == ((4L, "real content", 1L, 1L)))
  }
}
