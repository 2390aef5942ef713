package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector dot product as a native Catalyst expression.
  *
  * The composed form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)` over
  * `cast(array<double>)`) is semantically right but allocates three
  * intermediate arrays per evaluation — ruinous when the evaluation
  * count is the LSH candidate stream (~L × corpus collisions) rather
  * than the corpus itself. This expression is one allocation-free
  * fused loop, specialized per element type so `array<float>`
  * embeddings are read directly (no cast pass).
  *
  * Arithmetic parity: each element is widened float→double (exact)
  * and products are accumulated left-to-right in double — the same
  * IEEE operation sequence as the cast + zip_with + left-fold
  * composition, so round-6 cosines are bit-identical to the old form
  * and to the DuckDB oracle.
  *
  * Null handling: a null ARRAY yields null (BinaryExpression's
  * null-safe contract); null ELEMENTS are not supported (embedding
  * columns are dense by construction — enforced by the type check
  * accepting only float/double element types, and by the fixtures).
  */
object DotCodegen {
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** `graft_dot(a, b)` → double: allocation-free dot product of two
  * float/double array columns. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // bound after resolution (dataType is unavailable before analysis)
  private lazy val method: String = (elem(left), elem(right)) match {
    case (FloatType, FloatType)   => "dotFF"
    case (DoubleType, DoubleType) => "dotDD"
    case (FloatType, DoubleType)  => "dotFD"
    case (DoubleType, FloatType)  => "dotDF"
  }

  // mismatched lengths yield NULL — parity with the composed
  // zip_with/aggregate form, where the shorter side null-pads and the
  // null propagates through the fold ("dot of mismatched vectors is
  // undefined", not a silent truncation)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else method match {
      case "dotFF" => DotCodegen.dotFF(x, y)
      case "dotDD" => DotCodegen.dotDD(x, y)
      case "dotFD" => DotCodegen.dotFD(x, y)
      case "dotDF" => DotCodegen.dotDF(x, y)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotCodegen.$method($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
