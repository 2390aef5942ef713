package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed (two-phase) prefix sum.
  *
  * `Window.partitionBy(group).orderBy(key)` computes a running total
  * with ONE task per group — the single-partition shape that dies
  * when a group is corpus-sized (a window over an entire 100 TB
  * source shard runs on one core). This is the classic scalable
  * alternative:
  *
  *  1. bucket rows by a fixed-width range of the (numeric) order key —
  *     data-independent, so no repartition/sampling pass is needed;
  *  2. local running sum within (group, bucket) — a parallel window
  *     over many small partitions;
  *  3. per-bucket subtotals (tiny: one row per bucket) get their own
  *     running offsets via a window over the subtotal FRAME — the
  *     only sequential step, O(n / bucketWidth) rows per group;
  *  4. broadcast the offsets back and add.
  *
  * The result is bit-identical to the naive global window (addition
  * of non-negative longs is associative; bucket boundaries are
  * deterministic functions of the key), so DuckDB oracles written
  * against `SUM(...) OVER (PARTITION BY group ORDER BY key)` still
  * hash-match.
  */
object PrefixSum {

  /** Adds `outCol` = running sum of `valueCol` over rows ordered by
    * `orderCol` within each combination of `groupCols` (INCLUSIVE of
    * the current row). `orderCol` must be numeric and unique per
    * group; `valueCol` must be long-typed (cast upstream).
    *
    * `bucketWidth` trades parallelism against offset-table size: the
    * sequential phase sees one row per `bucketWidth` key-range per
    * group. With the default 64 Ki width, a 10-billion-row shard
    * yields a ~150k-row offset table — trivially windowable — while
    * each bucket stays small enough for one task.
    */
  def runningSum(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueCol: String,
      outCol: String,
      bucketWidth: Long = 65536L): DataFrame =
    runningSums(df, groupCols, orderCol, Seq(valueCol -> outCol),
      bucketWidth)

  /** Multi-column form: N running sums over ONE pass of the window/
    * subtotal/offset machinery (an N-sum caller chaining
    * [[runningSum]] N times pays the whole three-phase plan N times —
    * the stat_ks_test CDF pair measured ~2× for its two sums). */
  def runningSums(
      df: DataFrame,
      groupCols: Seq[String],
      orderCol: String,
      valueOutCols: Seq[(String, String)],
      bucketWidth: Long = 65536L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(valueOutCols.nonEmpty, "need at least one value column")
    val grp: Seq[Column] = groupCols.map(col)
    val bucket = floor(col(orderCol).cast("long") / bucketWidth)

    // Phase 2: parallel local running sums within (group, bucket).
    val localW = Window
      .partitionBy(grp :+ col("_psum_bucket"): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueOutCols.zipWithIndex.foldLeft(
      df.withColumn("_psum_bucket", bucket)) {
      case (acc, ((vc, _), i)) =>
        acc.withColumn(s"_psum_local_$i", sum(col(vc)).over(localW))
    }

    // Phase 3: running offsets over the bucket-subtotal frame. The
    // window here is per-group single-task but only over ~one row per
    // bucketWidth keys — the reduced frame, not the data.
    val offW = Window
      .partitionBy(grp: _*)
      .orderBy(col("_psum_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = valueOutCols.zipWithIndex.foldLeft(
      local.groupBy(grp :+ col("_psum_bucket"): _*)
        .agg(sum(col(valueOutCols.head._1)).as("_psum_subtotal_0"),
          valueOutCols.zipWithIndex.tail.map { case ((vc, _), i) =>
            sum(col(vc)).as(s"_psum_subtotal_$i") }: _*)) {
      case (acc, (_, i)) =>
        acc.withColumn(s"_psum_offset_$i",
          coalesce(sum(col(s"_psum_subtotal_$i")).over(offW), lit(0L)))
          .drop(s"_psum_subtotal_$i")
    }

    // Phase 4: broadcast the tiny offset table back onto the data.
    valueOutCols.zipWithIndex.foldLeft(
      local.join(broadcast(offsets), groupCols :+ "_psum_bucket")) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out,
          col(s"_psum_local_$i") + col(s"_psum_offset_$i"))
          .drop(s"_psum_local_$i", s"_psum_offset_$i")
    }.drop("_psum_bucket")
  }
}
