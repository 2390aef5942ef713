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
  * null-safe contract); a null ELEMENT or a length mismatch also
  * yields null — matching the composed form, where a null element
  * poisons the fold. The element-null guard is one pass over the
  * null bitmap per array, paid before the fused loop.
  */
object DotCodegen {
  /** Any null element? One pass over the null bitmap — the guard that
    * keeps the fused loop's results identical to the composed
    * zip_with/aggregate form, where a null element nulls the fold. */
  def anyNull(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

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

  // mismatched lengths and null ELEMENTS yield NULL — parity with the
  // composed zip_with/aggregate form, where the shorter side null-pads
  // (or the null element poisons the product) and the null propagates
  // through the fold. Not silent truncation, not read-null-as-zero.
  override def nullable: Boolean = true

  // dispatch bound once at first evaluation, not per row
  private lazy val fn: (ArrayData, ArrayData) => Double =
    method match {
      case "dotFF" => DotCodegen.dotFF
      case "dotDD" => DotCodegen.dotDD
      case "dotFD" => DotCodegen.dotFD
      case "dotDF" => DotCodegen.dotDF
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() ||
      DotCodegen.anyNull(x) || DotCodegen.anyNull(y)) null
    else fn(x, y)
  }

  // NOTE: no line may BEGIN with "||" — the codegen formatter treats
  // leading pipes as margin characters and strips them, silently
  // corrupting the emitted Java
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements() ||
          graft.functions.DotCodegen.anyNull($a) ||
          graft.functions.DotCodegen.anyNull($b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.DotCodegen.$method($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
