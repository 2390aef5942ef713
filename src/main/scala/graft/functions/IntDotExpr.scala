package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Integer vector dot product / squared norm as native Catalyst
  * expressions — the int8-quantization twin of [[DotProduct]].
  *
  * The quantized similarity paths (`sim_ivf_quantized`,
  * `sim_quantized_top1`) score candidates with exact integer
  * arithmetic: `aggregate(zip_with(a, b, _*_), 0L, _+_)` and
  * `aggregate(transform(a, x*x), 0L, _+_)`. Those composed forms are
  * semantically right but allocate intermediate arrays per candidate
  * pair — the identical churn `graft_dot` eliminated from the float
  * paths (SCALE.md r3), and the candidate stream is the evaluation
  * count, not the corpus. These expressions are one allocation-free
  * fused loop each.
  *
  * Arithmetic parity: element products and sums are plain 64-bit Long
  * operations, associativity-free exact integers — identical to the
  * composed form and to the DuckDB oracle's BIGINT math for any
  * int8-quantized input (|x| ≤ 127, so |dot| ≤ 127²·dim — overflow is
  * unreachable at any real dimension).
  *
  * Null handling matches the composed forms: null ARRAY → null;
  * null ELEMENT → null (the null poisons the fold); length mismatch →
  * null (zip_with null-pads the shorter side, poisoning the fold).
  */
object IntDotCodegen {

  def idotLL(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getLong(i)
      i += 1
    }
    s
  }

  def idotII(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    s
  }

  def idotLI(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      s += a.getLong(i) * b.getInt(i).toLong
      i += 1
    }
    s
  }

  def idotIL(a: ArrayData, b: ArrayData): Long = idotLI(b, a)

  def inorm2L(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      s += x * x
      i += 1
    }
    s
  }

  def inorm2I(a: ArrayData): Long = {
    val n = a.numElements()
    var s = 0L
    var i = 0
    while (i < n) {
      val x = a.getInt(i).toLong
      s += x * x
      i += 1
    }
    s
  }
}

/** `graft_idot(a, b)` → long: allocation-free integer dot product of
  * two int/long array columns. */
case class IntDotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_idot"

  private def elem(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(IntegerType | LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int|bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  // bound after resolution (dataType is unavailable before analysis)
  private lazy val method: String = (elem(left), elem(right)) match {
    case (LongType, LongType)       => "idotLL"
    case (IntegerType, IntegerType) => "idotII"
    case (LongType, IntegerType)    => "idotLI"
    case (IntegerType, LongType)    => "idotIL"
  }

  // mismatched lengths and null ELEMENTS yield NULL — parity with the
  // composed zip_with/aggregate form (see class doc)
  override def nullable: Boolean = true

  private lazy val fn: (ArrayData, ArrayData) => Long =
    method match {
      case "idotLL" => IntDotCodegen.idotLL
      case "idotII" => IntDotCodegen.idotII
      case "idotLI" => IntDotCodegen.idotLI
      case "idotIL" => IntDotCodegen.idotIL
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements() ||
      DotCodegen.anyNull(x) || DotCodegen.anyNull(y)) null
    else fn(x, y)
  }

  // NOTE: no line may BEGIN with "||" — the codegen formatter treats
  // leading pipes as margin characters and strips them
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      if ($a.numElements() != $b.numElements() ||
          graft.functions.DotCodegen.anyNull($a) ||
          graft.functions.DotCodegen.anyNull($b)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.IntDotCodegen.$method($a, $b);
      }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_inorm2(a)` → long: allocation-free integer squared norm of
  * an int/long array column (one pass instead of transform+fold). */
case class IntNorm2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_inorm2"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType | LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<int|bigint> argument, got ${other.simpleString}")
  }

  private lazy val method: String =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case LongType    => "inorm2L"
      case IntegerType => "inorm2I"
    }

  // a null ELEMENT yields NULL — parity with the composed
  // transform+aggregate form, where the null poisons the fold
  override def nullable: Boolean = true

  private lazy val fn: ArrayData => Long =
    method match {
      case "inorm2L" => IntDotCodegen.inorm2L
      case "inorm2I" => IntDotCodegen.inorm2I
    }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (DotCodegen.anyNull(x)) null else fn(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      if (graft.functions.DotCodegen.anyNull($a)) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = graft.functions.IntDotCodegen.$method($a);
      }""")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
