package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
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
