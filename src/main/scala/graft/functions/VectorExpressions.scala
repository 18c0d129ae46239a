package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding-similarity hot path.
  *
  * The declarative alternative — `aggregate(zip_with(a, b, (x, y) ->
  * x*y), 0D, (acc, v) -> acc + v)` — is semantically identical but
  * runs the lambda interpreter per element: on an all-pairs similarity
  * scan (|V|²/2 pairs × dim multiply-adds) that interpreter dispatch
  * IS the query cost. These expressions generate a tight primitive
  * loop inside whole-stage codegen instead; same ascending-index
  * summation order, so results are bit-identical to the built-in
  * composition (and to the DuckDB oracle's `list_reduce`).
  */
case class DotProductFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  /** Mismatched dimensions are corrupt data, not a shorter loop:
    * truncating to the common prefix would rank a bad row with a
    * plausible-looking score. Return null so it surfaces. */
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFloat =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a float vector: sqrt of the self dot product. */
case class NormFloat(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_norm"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getFloat(i).toDouble * x.getFloat(i).toDouble; i += 1 }
    math.sqrt(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => {
      val fn = ctx.addNewFunction("graftVecNorm",
        s"""
           |private double graftVecNorm(org.apache.spark.sql.catalyst.util.ArrayData arr) {
           |  int n = arr.numElements();
           |  double s = 0.0;
           |  for (int i = 0; i < n; i++) {
           |    s += (double) arr.getFloat(i) * (double) arr.getFloat(i);
           |  }
           |  return java.lang.Math.sqrt(s);
           |}
         """.stripMargin)
      s"$fn($a)"
    })

  override protected def withNewChildInternal(newChild: Expression): NormFloat =
    copy(child = newChild)
}
