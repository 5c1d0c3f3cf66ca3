package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{Bridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Codegen'd dense-vector kernels over `array<float>` / `array<double>`.
  *
  * The higher-order-function spellings in [[graft.functions.VectorFns]] are
  * oracle-friendly but allocate an intermediate array per evaluation
  * (`zip_with` materializes the products) and re-evaluate both norms for
  * every pair in a similarity join. [[CosineSim]] is the BENCH promotion
  * SURVEY.md §7.2 M7 plans: a single fused loop, no allocation, generated
  * straight into whole-stage codegen — bitwise-identical double arithmetic
  * to the HOF form (same left-to-right accumulation order), so oracle
  * results are unchanged.
  */
object VectorExprs {

  /** Column wrapper for [[CosineSim]]. */
  def cosine(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSim(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** Column wrapper for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(ExpressionUtils.expression(a),
      ExpressionUtils.expression(b)))

  /** Column wrapper for [[SignRpBuckets]]. */
  def signRpBuckets(vec: Column, planes: Array[Array[Double]],
      bitsPerTable: Int, quantScale: Double): Column =
    ExpressionUtils.column(SignRpBuckets(ExpressionUtils.expression(vec),
      planes, bitsPerTable, quantScale))

  /** Deterministic ±1 (Rademacher) hyperplanes, `numPlanes × dim`, from a
    * seeded java LCG — reproducible across JVMs and inlinable into oracle
    * SQL as literals. */
  def rademacherPlanes(numPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(numPlanes)(Array.fill(dim)(if (rnd.nextBoolean()) 1.0 else -1.0))
  }
}

/** Shared loop-codegen scaffolding for two-array kernels. Null semantics
  * mirror the HOF forms: null input array → null, length mismatch → null
  * (zip_with pads with null, poisoning the fold), any null element → null.
  */
trait VectorKernel { self: BinaryExpression =>

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemGetter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case ArrayType(DoubleType, _) => "getDouble"
    case t => throw new IllegalArgumentException(
      s"${getClass.getSimpleName} needs array<float|double>, got $t")
  }

  protected def elemAt(a: ArrayData, e: Expression, i: Int): Double =
    e.dataType match {
      case ArrayType(FloatType, _) => a.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => a.getDouble(i)
      case t => throw new IllegalArgumentException(s"bad element type $t")
    }
}

/** Fused cosine similarity: dot(a,b) / (||a|| * ||b||); 0.0 when either norm
  * is 0 (matches VectorFns.cosine / the reference's Qdrant COSINE metric,
  * reference: PLATFORM-contextual-Chunking.py:137-144). */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernel {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elemAt(a, left, i); val y = elemAt(b, right, i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (getA, getB) = (elemGetter(left), elemGetter(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb"); val x = ctx.freshName("x")
      val y = ctx.freshName("y"); val denom = ctx.freshName("denom")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = (double) $a.$getA($i);
         |    final double $y = (double) $b.$getB($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    ${ev.value} = $denom == 0.0 ? 0.0 : $dot / $denom;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection LSH bucket keys — the deterministic, engine-
  * portable alternative to MLlib's BucketedRandomProjectionLSH (whose
  * internal Gaussian draws no SQL engine can replicate).
  *
  * Each input element is quantized to an integer-valued double
  * (`floor(x * quantScale + 0.5)`) and dotted with ±1 hyperplanes, so every
  * product and partial sum is an integer far below 2^53: the arithmetic is
  * EXACT, order-independent, and bitwise-reproducible in any engine — which
  * is what makes the whole LSH pipeline hash-checkable against DuckDB.
  * Output: one key per table; key = bitmask of `dot(q, plane) >= 0` over
  * that table's `bitsPerTable` consecutive planes.
  *
  * One fused pass per row (quantize once, then planes × dim multiply-adds),
  * generated into whole-stage codegen; planes ride along as a reference
  * object, not a per-row literal.
  */
case class SignRpBuckets(child: Expression, planes: Array[Array[Double]],
    bitsPerTable: Int, quantScale: Double)
    extends UnaryExpression {
  require(planes.nonEmpty && planes.length % bitsPerTable == 0,
    s"planes(${planes.length}) must be a multiple of bitsPerTable($bitsPerTable)")

  private val numTables = planes.length / bitsPerTable

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def elemAt(a: ArrayData, i: Int): Double = child.dataType match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case ArrayType(DoubleType, _) => a.getDouble(i)
    case t => throw new IllegalArgumentException(s"bad element type $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    val q = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      q(i) = math.floor(elemAt(a, i) * quantScale + 0.5)
      i += 1
    }
    val keys = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        val p = planes(t * bitsPerTable + b)
        val d = math.min(n, p.length)
        var dot = 0.0
        var j = 0
        while (j < d) { dot += q(j) * p(j); j += 1 }
        if (dot >= 0.0) key |= (1L << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = child.dataType match {
      case ArrayType(FloatType, _) => "getFloat"
      case ArrayType(DoubleType, _) => "getDouble"
      case t => throw new IllegalArgumentException(s"bad element type $t")
    }
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val q = ctx.freshName("q"); val keys = ctx.freshName("keys")
      val t = ctx.freshName("t"); val b = ctx.freshName("b")
      val p = ctx.freshName("p"); val dot = ctx.freshName("dot")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val key = ctx.freshName("key")
      s"""
         |final int $n = $a.numElements();
         |final double[] $q = new double[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $q[$i] = java.lang.Math.floor(((double) $a.$getter($i)) * ${quantScale}D + 0.5D);
         |}
         |if (!${ev.isNull}) {
         |  final long[] $keys = new long[$numTables];
         |  for (int $t = 0; $t < $numTables; $t++) {
         |    long $key = 0L;
         |    for (int $b = 0; $b < $bitsPerTable; $b++) {
         |      final double[] $p = $planesRef[$t * $bitsPerTable + $b];
         |      final int $d = java.lang.Math.min($n, $p.length);
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $d; $j++) $dot += $q[$j] * $p[$j];
         |      if ($dot >= 0.0) $key |= (1L << $b);
         |    }
         |    $keys[$t] = $key;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused dot product: sum_i a_i * b_i (double, left-to-right). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorKernel {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      dot += elemAt(a, left, i) * elemAt(b, right, i)
      i += 1
    }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (getA, getB) = (elemGetter(left), elemGetter(right))
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $dot += ((double) $a.$getA($i)) * ((double) $b.$getB($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $dot;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
