package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains` — Bloom-filter membership probe as a native
  * Catalyst expression over a BROADCAST filter (VERDICT r3 #2: the one
  * corpus-hot-path closure UDF, now inside WholeStageCodegen).
  *
  * The filter rides as a `Broadcast` handle held by the expression —
  * NOT as a child literal: a serialized multi-megabyte sketch embedded
  * in the plan would be hashed and compared on every plan
  * canonicalization and re-shipped with every stage's task binary,
  * while a broadcast ships once per executor and the expression
  * serializes as a few bytes. This is the same shape as Spark's own
  * optimizer-injected `BloomFilterMightContain` (runtime row-group
  * filters), and the same reason neither has a SQL-registrable form:
  * a runtime broadcast handle has no SQL-literal spelling.
  *
  * Null semantics are the standard null-intolerant unary contract
  * (null key → null); operators that want "null is definitely absent"
  * (a Bloom filter cannot contain null) wrap the call in
  * `coalesce(..., false)` — see `DedupOps.bloomIncrementalOn`.
  *
  * The probe itself: `mightContainBinary` over the key's UTF-8 bytes —
  * byte-identical to `mightContainString` (which delegates to the
  * binary probe on UTF-8 bytes) but without materializing a
  * `java.lang.String` per row.
  */
case class BloomContains(child: Expression, filter: Broadcast[BloomFilter])
  extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string key, got ${child.dataType.simpleString}")

  // executor-local handle: resolved once per task from the broadcast,
  // not once per row
  @transient private lazy val localFilter: BloomFilter = filter.value

  override def nullSafeEval(key: Any): Any =
    localFilter.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bc = ctx.addReferenceObj("graftBloomBc", filter,
      "org.apache.spark.broadcast.Broadcast")
    // per-instance mutable slot: the broadcast is unwrapped on first
    // row, then probed directly — no Broadcast.value() call per row
    val bf = ctx.addMutableState("org.apache.spark.util.sketch.BloomFilter",
      "graftBloomFilter")
    nullSafeCodeGen(ctx, ev, key => s"""
      if ($bf == null) {
        $bf = (org.apache.spark.util.sketch.BloomFilter) $bc.value();
      }
      ${ev.value} = $bf.mightContainBinary($key.getBytes());
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
