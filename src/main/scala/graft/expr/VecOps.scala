package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native vector math over `ARRAY<FLOAT>` embedding columns.
  *
  * The similarity-search operators need a dot product / cosine over the
  * 64-dim `embeddings.embedding` column at 100 TB scale. A SQL
  * `aggregate(zip_with(...))` composition works but materializes an
  * intermediate array per row and runs through interpreted higher-order
  * functions; this expression does a tight primitive loop, accumulating in
  * double (index order, deterministic), and stays inside whole-stage
  * codegen via a static method call.
  */
object VecMath {
  /** Sequential (index-order) dot product, accumulated in double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def norm(a: ArrayData): Double = {
    var s = 0.0
    var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  /** cosine(a,b) = dot/(|a||b|); 0.0 for zero vectors (no NaN). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val d = norm(a) * norm(b)
    if (d == 0.0) 0.0 else dot(a, b) / d
  }
}

sealed abstract class FloatVecBinary extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
}

case class DotProduct(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecMath.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

case class CosineSimilarity(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "vec_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecMath.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.VecMath.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

object VecFunctions {
  import graft.Cols
  def vec_dot(a: Column, b: Column): Column =
    Cols.column(DotProduct(Cols.expr(a), Cols.expr(b)))
  def vec_cosine(a: Column, b: Column): Column =
    Cols.column(CosineSimilarity(Cols.expr(a), Cols.expr(b)))
}
