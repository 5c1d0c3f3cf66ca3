package graft.expr

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row-loop bodies of the hash kernels as STATIC forwarders (same rationale
  * as [[ShingleKernels]]): generated stages call them directly, so the
  * fused kernels no longer sever whole-stage codegen. */
object HashKernels {

  private val md: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First 8 hex chars of md5 as an unsigned long — the portable bucket
    * hash shared with the DuckDB oracle ('0x' || substr(md5(s),1,8)). */
  private def md5Prefix(digest: MessageDigest, s: UTF8String): Long = {
    digest.reset()
    val d = digest.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** k running-minima update for one base hash — the permutation step
    * shared (verbatim, so the documented byte-identity cannot drift) by
    * [[minHashBandKeys]] and [[weightedMinHashBandKeys]]. */
  private def updateMins(h: Long, a: Array[Long], b: Array[Long],
      mins: Array[Long]): Unit = {
    val p = 2147483647L
    var j = 0
    while (j < a.length) {
      val v = (a(j) * h + b(j)) % p
      if (v < mins(j)) mins(j) = v
      j += 1
    }
  }

  /** `bands` '_'-joined decimal band keys from the finished minima —
    * the emission tail shared by both band-key kernels. */
  private def bandKeysOf(mins: Array[Long], bands: Int): ArrayData = {
    val rows = mins.length / bands
    val keys = new Array[Any](bands)
    var bIdx = 0
    while (bIdx < bands) {
      val sb = new java.lang.StringBuilder(32)
      var r = 0
      while (r < rows) {
        if (r > 0) sb.append('_')
        sb.append(mins(bIdx * rows + r))
        r += 1
      }
      keys(bIdx) = UTF8String.fromString(sb.toString)
      bIdx += 1
    }
    new GenericArrayData(keys)
  }

  /** MinHash band keys: k running minima of (a_k·h + b_k) mod p over the
    * shingles, grouped into `bands` '_'-joined decimal keys. Returns null
    * for an empty / all-null shingle set (no signature). */
  def minHashBandKeys(arr: ArrayData, a: Array[Long], b: Array[Long],
      bands: Int): ArrayData = {
    val p = 2147483647L
    val n = arr.numElements()
    val mins = Array.fill(a.length)(Long.MaxValue)
    val digest = md.get()
    var i = 0
    var any = false
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        updateMins(md5Prefix(digest, arr.getUTF8String(i)) % p, a, b, mins)
      }
      i += 1
    }
    if (!any) return null
    bandKeysOf(mins, bands)
  }

  /** MinHash band keys over a COMPACT tf vector as PARALLEL arrays
    * (terms `array<string>`, tfcs `array<long>`, aligned): each entry
    * contributes the virtual shingles `term#1 … term#tfc` — hashed
    * incrementally (term bytes, '#', decimal rep digits) so the repeat
    * expansion never allocates an array — then the same k running minima
    * and '_'-joined band keys as [[minHashBandKeys]]. Byte-identical to
    * running [[minHashBandKeys]] over the materialized expansion: the
    * digest input IS the UTF-8 bytes of `term#rep`. Null for an
    * empty/absent vector (no signature). */
  def weightedMinHashBandKeys(terms: ArrayData, tfcs: ArrayData,
      a: Array[Long], b: Array[Long], bands: Int): ArrayData = {
    val p = 2147483647L
    val n = terms.numElements()
    val mins = Array.fill(a.length)(Long.MaxValue)
    val digest = md.get()
    var any = false
    var i = 0
    while (i < n) {
      val termBytes = terms.getUTF8String(i).getBytes
      val tfc = tfcs.getLong(i)
      var rep = 1L
      while (rep <= tfc) {
        any = true
        digest.reset()
        digest.update(termBytes)
        digest.update('#'.toByte)
        digest.update(java.lang.Long.toString(rep)
          .getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        val d = digest.digest()
        val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % p
        updateMins(h, a, b, mins)
        rep += 1L
      }
      i += 1
    }
    if (!any) return null
    bandKeysOf(mins, bands)
  }

  /** Jump consistent hash (Lamping & Veach, "A Fast, Minimal Memory,
    * Consistent Hash Algorithm", 2014 — public literature): maps a 64-bit
    * key to a shard in [0, numShards) such that growing the shard count
    * n_old → n_new relocates exactly the minimal fraction of keys (a key
    * moves only ever to a NEW shard, with probability 1 − n_old/n_new),
    * in O(log n) expected iterations, zero memory, zero digests — the
    * deploy-path answer to [[graft.ops.Shard.rendezvousShard]]'s
    * O(numShards) digests per row.
    *
    * The arithmetic is spelled EXACTLY like the paper (64-bit LCG with
    * wraparound; `(b+1) * (2^31 / ((key >>> 33) + 1))` in IEEE doubles,
    * that association) and identically in the DuckDB oracle's recursive
    * CTE, so the hash-compare is bit-exact: both engines' doubles are
    * IEEE-754 and the operand order is pinned. */
  def jumpHash(key: Long, numShards: Int): Long = {
    var k = key
    var b = -1L
    var j = 0L
    while (j < numShards) {
      b = j
      k = k * 2862933555777941757L + 1L // unsigned-64 wraparound LCG
      j = ((b + 1) * (2147483648.0 / (((k >>> 33) + 1).toDouble))).toLong
    }
    b
  }

  /** 32-bit md5-prefix SimHash majority vote; null/empty token array → 0
    * for the zero votes and the degenerate all-bits-set empty case exactly
    * like the HOF reference spelling (see [[SimHashMd5]]). */
  def simHashMd5(arr: ArrayData): Long = {
    if (arr == null) return 0L
    val n = arr.numElements()
    val ones = new Array[Int](32)
    val digest = md.get()
    var i = 0
    var total = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        total += 1
        val h = md5Prefix(digest, arr.getUTF8String(i))
        var j = 0
        while (j < 32) {
          if (((h >>> j) & 1L) != 0L) ones(j) += 1
          j += 1
        }
      }
      i += 1
    }
    // bit set iff ones >= zeros — including the degenerate all-bits-set
    // empty-array case, mirroring the HOF reference spelling exactly
    var out = 0L
    var j = 0
    while (j < 32) {
      if (2 * ones(j) >= total) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Fused MinHash+LSH band-key kernel.
  *
  * Spec (shared verbatim with the DuckDB oracle SQL in Queries2.q14Sql):
  *   h(s)    = ('0x' || substr(md5(s), 1, 8))::BIGINT % p   (p = 2^31 − 1)
  *   sig_k   = min over shingles of (a_k · h + b_k) % p
  *   band_j  = sig[j·rows .. j·rows+rows) joined with '_' (decimal strings)
  *
  * The built-in spelling (transform(md5 → conv → %) → k × array_min ×
  * transform → concat_ws over slices) evaluates every step as an
  * interpreted higher-order function — ~25 boxed virtual calls per shingle.
  * This kernel is one Java loop per row: md5 once per shingle (first 4
  * digest bytes ARE the first 8 hex chars), then k running minima; it
  * generates code (one static call), so the stage stays whole-stage-codegen.
  */
case class MinHashBandKeys(child: Expression, coeffs: Seq[(Long, Long)], bands: Int)
    extends UnaryExpression {

  require(coeffs.size % bands == 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val aArr: Array[Long] = coeffs.map(_._1).toArray
  private lazy val bArr: Array[Long] = coeffs.map(_._2).toArray

  override def nullSafeEval(input: Any): Any =
    HashKernels.minHashBandKeys(input.asInstanceOf[ArrayData], aArr, bArr, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expr.HashKernels.minHashBandKeys($c, $aRef, $bRef, $bands);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused 32-bit md5-prefix SimHash kernel.
  *
  * Spec (shared verbatim with the DuckDB oracle CTE in Queries2.SimHashCte):
  *   h(t)  = ('0x' || substr(md5(t), 1, 8))::BIGINT          (per token)
  *   bit j = set iff ones_j ≥ zeros_j over all tokens (dups counted)
  *
  * The built-in spelling (transform(md5 → conv) then 32 × size(filter(...)))
  * is interpreted HOF evaluation — 32 passes over a boxed array per row.
  * This kernel is one md5 per token and one 32-counter vote loop; identical
  * values (spec-asserted bitwise against the HOF form), codegen'd. */
case class SimHashMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // null array → 0, mirroring the HOF spelling (each bit's vote predicate
  // is null, so every when() takes the otherwise(0) branch) and the DuckDB
  // CTE (NULL list → bitv 0 per bit)
  override def eval(input: InternalRow): Any =
    HashKernels.simHashMd5(child.eval(input).asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = graft.expr.HashKernels.simHashMd5(
        ${childGen.isNull} ? null : ${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused WEIGHTED MinHash+LSH band-key kernel over the compact tf vector
  * as parallel (terms, tfcs) arrays
  * ([[HashKernels.weightedMinHashBandKeys]]) — [[MinHashBandKeys]]'
  * sibling for [[graft.ops.Dedup.weightedMinHashLshPairs]], where
  * materializing the `term#k` repeat expansion as an array column is
  * exactly the row width the operator exists to avoid. */
case class WeightedMinHashBandKeys(left: Expression, right: Expression,
    coeffs: Seq[(Long, Long)], bands: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(coeffs.size % bands == 0)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  private lazy val aArr: Array[Long] = coeffs.map(_._1).toArray
  private lazy val bArr: Array[Long] = coeffs.map(_._2).toArray

  override def nullSafeEval(terms: Any, tfcs: Any): Any =
    HashKernels.weightedMinHashBandKeys(terms.asInstanceOf[ArrayData],
      tfcs.asInstanceOf[ArrayData], aArr, bArr, bands)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("wminhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("wminhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, (t, c) => s"""
      ${ev.value} = graft.expr.HashKernels.weightedMinHashBandKeys($t, $c, $aRef, $bRef, $bands);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd [[HashKernels.jumpHash]] over a LongType key — the loop has a
  * data-dependent trip count (O(log n) expected, n worst case), so it lives
  * in a kernel call rather than an unrolled expression tree; the call sits
  * inside whole-stage codegen like the shingle kernels. */
case class JumpConsistentHash(child: Expression, numShards: Int)
    extends UnaryExpression {

  require(numShards >= 1, s"numShards must be >= 1, got $numShards")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"jump_hash needs a LongType key, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    HashKernels.jumpHash(input.asInstanceOf[Long], numShards)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.HashKernels.jumpHash($c, $numShards)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExprs {
  /** Column wrapper for [[MinHashBandKeys]]. */
  def minHashBandKeys(shingles: Column, coeffs: Seq[(Long, Long)], bands: Int): Column =
    ExpressionUtils.column(
      MinHashBandKeys(ExpressionUtils.expression(shingles), coeffs, bands))

  /** Column wrapper for [[WeightedMinHashBandKeys]]. */
  def weightedMinHashBandKeys(terms: Column, tfcs: Column,
      coeffs: Seq[(Long, Long)], bands: Int): Column =
    ExpressionUtils.column(
      WeightedMinHashBandKeys(ExpressionUtils.expression(terms),
        ExpressionUtils.expression(tfcs), coeffs, bands))

  /** Column wrapper for [[SimHashMd5]]. */
  def simHashMd5(tokens: Column): Column =
    ExpressionUtils.column(SimHashMd5(ExpressionUtils.expression(tokens)))

  /** Column wrapper for [[JumpConsistentHash]]. */
  def jumpHash(key: Column, numShards: Int): Column =
    ExpressionUtils.column(
      JumpConsistentHash(ExpressionUtils.expression(key), numShards))
}
