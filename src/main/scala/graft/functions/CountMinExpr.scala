package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_countmin_estimate` — Count-Min frequency lookup as a native
  * Catalyst expression over a BROADCAST sketch, the probe-side twin of
  * [[CountMinAgg]] (which builds the sketch) and the same shape as
  * [[BloomContains]]: the sketch rides as a `Broadcast` handle (never
  * a plan literal), is unwrapped once per task, and the probe itself
  * is `estimateCount` over the key's UTF-8 bytes — byte-identical to
  * the String overload (which delegates to the binary path on UTF-8
  * bytes) without materializing a `java.lang.String` per row.
  *
  * This replaces the closure UDF that re-deserialized the ~5 KB
  * serialized sketch ON EVERY ROW; at heavy-hitter scale the probe
  * side is |distinct keys| rows, so per-row deserialization was the
  * dominant cost.
  *
  * Null semantics: standard null-intolerant unary contract (null key →
  * null estimate).
  */
case class CountMinEstimate(child: Expression, sketch: Broadcast[CountMinSketch])
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_countmin_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${child.dataType.simpleString}")

  @transient private lazy val localSketch: CountMinSketch = sketch.value

  override def nullSafeEval(key: Any): Any =
    localSketch.estimateCount(key.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("graftCmBc", sketch,
      "org.apache.spark.broadcast.Broadcast")
    val cm = ctx.addMutableState("org.apache.spark.util.sketch.CountMinSketch",
      "graftCmSketch")
    nullSafeCodeGen(ctx, ev, key => s"""
      if ($cm == null) {
        $cm = (org.apache.spark.util.sketch.CountMinSketch) $bc.value();
      }
      ${ev.value} = $cm.estimateCount((Object) $key.getBytes());
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
