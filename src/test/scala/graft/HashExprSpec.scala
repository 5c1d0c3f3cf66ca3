package graft

import org.apache.spark.sql.functions._

import graft.expr.HashExprs
import graft.functions.{HashFns, TextFns}

/** The fused MinHash band-key kernel must produce exactly the band keys of
  * the pure-builtin spelling (md5Long → affine permutations → concat_ws
  * band slices) — the oracle SQL is written against that spec. */
class HashExprSpec extends SparkSpec {
  import spark.implicits._

  test("MinHashBandKeys equals the builtin minHash pipeline band keys") {
    val docs = io.Tables.documents(spark, sfDir).limit(200)
    val sh = docs.select($"doc_id", TextFns.wordShingles($"text", 2).as("sh"))
    val k = 12; val bands = 4; val rows = 3
    val builtin = sh
      .select($"doc_id", HashFns.minHashBase($"sh").as("hb"))
      .select($"doc_id", HashFns.minHashSigFromBase($"hb", k).as("sig"))
      .select($"doc_id", HashFns.bandSigs($"sig", bands, rows).as("keys"))
    val fused = sh.select($"doc_id",
      HashExprs.minHashBandKeys($"sh", HashFns.minHashCoeffs(k), bands).as("keys"))
    val b = builtin.as[(Long, Seq[String])].collect().toMap
    val f = fused.as[(Long, Seq[String])].collect().toMap
    assert(f.keySet == b.keySet)
    f.foreach { case (id, keys) => assert(keys == b(id), s"doc $id") }
  }

  test("MinHashBandKeys null/empty semantics") {
    val df = Seq(
      (1L, Seq("a b", "b c")),
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])).toDF("id", "sh")
    val out = df.select($"id",
      HashExprs.minHashBandKeys($"sh", HashFns.minHashCoeffs(4), 2).as("keys"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(out(1L).exists(_.size == 2))
    assert(out(2L).isEmpty) // empty shingle set → null
    assert(out(3L).isEmpty) // null array → null
  }
}
