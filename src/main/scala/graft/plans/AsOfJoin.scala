package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** AS-OF join as a first-class operator (SURVEY.md §2.7 X9, the
  * (c)-level custom-operator path: LogicalPlan + Strategy + SparkPlan).
  *
  * Semantics: for every left row, attach the single right row with the
  * same key and the greatest `rightTime <= leftTime` (ties on
  * rightTime broken by the greatest `rightTieBreak`); no match → right
  * columns NULL. This is the standard event-timeline enrichment ("the
  * order in effect at the time of the event").
  *
  * Why a custom operator: composed Spark needs either a non-equi
  * theta-join (quadratic blow-up per key) or a union+window trick
  * (ops.EventOps.asofJoin — an extra union and full-width window
  * state). This node declares ClusteredDistribution on the key and
  * (key, time) sort order for BOTH children, so Catalyst's
  * EnsureRequirements plans exactly one hash exchange + sort per side
  * — identical cost shape to a sort-merge join — and execution is a
  * single forward merge scan per partition: O(n+m), no per-key state
  * beyond one held row, spill-free, skew handled the same way SMJ
  * partitions are. At 100 TB this is the only shape that survives.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightTieBreak: Attribute,
    toleranceMicros: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute,
    rightKey: Attribute, rightTime: Attribute,
    rightTieBreak: Attribute,
    toleranceMicros: Option[Long] = None) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition both sides on the key (one exchange each, reused by
    * downstream consumers of the same partitioning). */
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  /** In-partition merge order; the tie-break makes "last held wins"
    * deterministic when several right rows share a timestamp. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTieBreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val project = UnsafeProjection.create(outAttrs, outAttrs)

      // tolerance compares internal Long time values (timestamp /
      // timestamp_ntz micros, or a raw long column) — the API layer
      // rejects other time types when a tolerance is set
      val tol = toleranceMicros

      new Iterator[InternalRow] {
        private var pendingRight: InternalRow = null // read but not consumed
        private var held: InternalRow = null         // best match so far
        private var heldKey: Any = null
        private var heldTime: Long = 0L

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = if (l.isNullAt(lKeyIdx)) null else l.get(lKeyIdx, keyType)
          val lt = if (l.isNullAt(lTimeIdx)) null else l.get(lTimeIdx, timeType)
          if (lk != null && lt != null) {
            // advance the right side up to (lk, lt)
            var continue = true
            while (continue && (pendingRight != null || rIter.hasNext)) {
              if (pendingRight == null) pendingRight = rIter.next()
              val rk = if (pendingRight.isNullAt(rKeyIdx)) null
                else pendingRight.get(rKeyIdx, keyType)
              val rt = if (pendingRight.isNullAt(rTimeIdx)) null
                else pendingRight.get(rTimeIdx, timeType)
              if (rk == null || rt == null) {
                pendingRight = null // unjoinable right row
              } else {
                val c = keyOrd.compare(rk, lk)
                if (c < 0) {
                  pendingRight = null // behind the current key
                } else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                  held = pendingRight.copy() // newest match so far
                  // re-extract the key from the COPIED row: `rk` may
                  // alias a buffer the right iterator reuses (sort
                  // spill reader / unsafe projection), so for
                  // string/binary/decimal keys it can be overwritten
                  // before the compare below uses it
                  heldKey = held.get(rKeyIdx, keyType)
                  if (tol.isDefined) {
                    heldTime = held.get(rTimeIdx, timeType)
                      .asInstanceOf[Number].longValue()
                  }
                  pendingRight = null
                } else {
                  continue = false // ahead of (lk, lt): keep for later
                }
              }
            }
          }
          // lt != null: a null-time left row matches nothing (the SQL
          // `rightTime <= leftTime` is unknown for NULL), it must not
          // inherit the previous row's held match
          val matched = held != null && lk != null && lt != null &&
            keyOrd.compare(heldKey, lk) == 0 &&
            (tol.isEmpty ||
              lt.asInstanceOf[Number].longValue() - heldTime <= tol.get)
          project(joined(l, if (matched) held else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
