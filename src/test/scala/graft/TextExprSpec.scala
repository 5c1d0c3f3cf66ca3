package graft

import org.apache.spark.sql.functions._

import graft.expr.TextExprs
import graft.functions.TextFns

/** The fused shingling kernel must equal the builtin HOF spelling exactly
  * (the oracle SQL is written against that spec). */
class TextExprSpec extends SparkSpec {
  import spark.implicits._

  test("WordShingles equals builtin wordShingles on fixture documents") {
    val docs = io.Tables.documents(spark, sfDir)
    Seq(2, 8).foreach { n => // 2 = the MinHash unit; 8 = q76's decontamination gram
      val both = docs.select(
        TextFns.wordShingles($"text", n).as("builtin"),
        TextExprs.wordShingles($"text", n).as("fused"))
      val bad = both.filter(not($"builtin" === $"fused")).count()
      assert(bad == 0, s"n=$n")
    }
  }

  test("WordShingles edge cases match builtin") {
    val df = Seq("", "   ", "one", "a  b\t c\nd", "ONE Two one two", "héllo WÖRLD x")
      .toDF("text")
    val rows = df.select(
      TextFns.wordShingles($"text", 2).as("builtin"),
      TextExprs.wordShingles($"text", 2).as("fused")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString)
    }
  }

  test("CharShingles equals builtin charShingles on fixture documents") {
    val docs = io.Tables.documents(spark, sfDir)
    val both = docs.select(
      TextFns.charShingles($"text", 4).as("builtin"),
      TextExprs.charShingles($"text", 4).as("fused"))
    assert(both.filter(not($"builtin" === $"fused")).count() == 0)
  }

  test("CharShingles edge cases match builtin (short, unicode, blank)") {
    val df = Seq("", "ab", "abcd", "  AB cd  EF ", "中文字符测试abc", "ａｂｃｄｅ")
      .toDF("text")
    df.select(
      TextFns.charShingles($"text", 4).as("builtin"),
      TextExprs.charShingles($"text", 4).as("fused")).collect()
      .foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r.toString))
  }

  test("WordShingles null in, null out") {
    val df = Seq(Option.empty[String], Some("x y z")).toDF("text")
    val out = df.select(TextExprs.wordShingles($"text", 2)).collect()
    assert(out.exists(_.isNullAt(0)) && out.exists(!_.isNullAt(0)))
  }
}
