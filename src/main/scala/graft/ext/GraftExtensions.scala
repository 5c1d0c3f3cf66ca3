package graft.ext

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expr.{BpeMergePair, CharShingles, CosineSim, DotProduct, MinHashBandKeys, SimHashMd5, WordShingles, ZInterleave}
import graft.functions.HashFns

/** SQL surface for the custom kernels: `spark.sql("SELECT cosine_sim(a, b)")`.
  *
  * Two registration paths, same builders:
  *  - `spark.sql.extensions=graft.ext.GraftExtensions` at session build
  *    (the standard library-extension hook), or
  *  - `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, info, builder) triples for every SQL-exposed kernel. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("dot_product",
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("word_shingles",
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => WordShingles(args(0), intArg(args(1), "shingle size"))),
    ("char_shingles",
      new ExpressionInfo(classOf[CharShingles].getName, "char_shingles"),
      (args: Seq[Expression]) => CharShingles(args(0), intArg(args(1), "shingle size"))),
    ("minhash_band_keys",
      new ExpressionInfo(classOf[MinHashBandKeys].getName, "minhash_band_keys"),
      (args: Seq[Expression]) => MinHashBandKeys(args(0),
        HashFns.minHashCoeffs(intArg(args(1), "num hashes")),
        intArg(args(2), "bands"))),
    ("simhash_md5",
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      (args: Seq[Expression]) => SimHashMd5(args(0))),
    ("z_interleave",
      new ExpressionInfo(classOf[ZInterleave].getName, "z_interleave"),
      (args: Seq[Expression]) => ZInterleave(args(0), args(1))),
    ("bpe_merge_pair",
      new ExpressionInfo(classOf[BpeMergePair].getName, "bpe_merge_pair"),
      (args: Seq[Expression]) => BpeMergePair(args(0), args(1), args(2))))

  /** Register every kernel as a temp SQL function on a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, builder)
    }
}
