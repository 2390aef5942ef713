package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Arbitrary stateful streaming (`flatMapGroupsWithState`) — the
  * custom-state API the session/window builtins can't express:
  * per-user running aggregates kept in a typed state store, emitted on
  * every update. With a finite source and one microbatch this emits
  * exactly one summary per user, which the DuckDB oracle can check
  * against a plain GROUP BY — correctness of the stateful path, not
  * just plumbing.
  *
  * Scale notes: state is partitioned by group key across the state
  * store (one per shuffle partition); memory is O(|active users|), and
  * event-time timeouts (not used in this finite demo) bound state for
  * unbounded streams.
  */
object StatefulOps {

  case class UserState(n: Long, totalCents: Long)
  case class UserSummary(user_id: Long, n_events: Long, sum_value: Double)

  // only the projected columns are declared — in particular NOT `ts`,
  // whose physical encoding varies across fixture generations; a
  // fixed user schema over it silently misreads (the events-reader
  // lesson). A future ts consumer must go through the footer-probe
  // dispatch (Tables.rawNanosCols), like cdcUpsert does for orders.
  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Per-user event count + exact value sum via custom state. Values
    * are accumulated in integer cents so the emitted double equals the
    * oracle's decimal-exact sum. */
  def userTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // no nanosAsLong set: ts is not in the declared schema at all
    val src = StreamSource.tableStream(spark, sfDir, "events", eventsSchema)
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .as[(Long, Long)]

    val summarized = src
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) => {
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var n = prev.n
          var cents = prev.totalCents
          rows.foreach { case (_, c) => n += 1; cents += c }
          state.update(UserState(n, cents))
          Iterator.single(UserSummary(user, n, cents.toDouble / 100.0))
        })

    // noDataBatch=false: a NoTimeout flatMapGroupsWithState has no
    // timeouts to fire and update mode emits nothing without input —
    // the trailing batch is provably a no-op here (r9 floor trim)
    StreamingSessions.runToCompletion(spark, summarized.toDF(),
        "stream_user_totals", mode = "update", noDataBatch = false)
      .orderBy(col("user_id"))
  }

  /** Streaming QUANTILE-sketch maintenance — the streaming twin of
    * `agg_quantile_union` and the state-store face of the mergeable-
    * sketch discipline: each micro-batch folds its order prices into
    * the per-month [[graft.functions.QSketch]] held in typed state and
    * emits the updated sketch BYTES (update mode — the last emission
    * per month is the final sketch, the cdcUpsert pattern with a seq
    * tie-break). The drained sketches then run through the IDENTICAL
    * quarter-merge + grading tail as the batch query
    * (`OlapOps.quantileGradeFromMonthly`) — the serving side cannot
    * tell who built the sketch, which is the stored-sketch promise.
    *
    * Grades against the SAME oracle as the batch form. Scale: state is
    * one ~k·log(n/k)-double sketch per open month, partitioned across
    * the store; real deployments close months with event-time
    * timeouts and persist the final bytes next to the partition. */
  def quantileRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nanos = graft.Tables.rawNanosCols(spark, s"$sfDir/orders.parquet")
      .contains("o_orderdate")
    if (nanos)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", if (nanos) LongType else TimestampNTZType)))
    val src = StreamSource.tableStream(spark, sfDir, "orders", ordersSchema)
      .withColumn("ts",
        if (nanos) timestamp_micros(expr("o_orderdate div 1000"))
        else col("o_orderdate").cast("timestamp"))
    val keyed = src.select(
        unix_micros(date_trunc("month", col("ts"))).as("mk"),
        col("o_totalprice").as("v"))
      .as[(Long, Double)]
    quantileRollupOver(spark, keyed, graft.Tables.orders(spark, sfDir),
      "stream_quantile_sketches")
  }

  /** Core of [[quantileRollup]], parameterized for tests (the
    * cross-batch spec feeds a 3-file one-per-trigger source through
    * THIS code — the production state fold, not a copy): a keyed
    * (month-micros, value) stream folds into per-month QSketch state,
    * the drained latest-per-month sketches run the shared batch grade
    * tail against `orders`. */
  private[graft] def quantileRollupOver(spark: SparkSession,
      keyed: org.apache.spark.sql.Dataset[(Long, Double)],
      orders: DataFrame, sinkName: String): DataFrame = {
    import spark.implicits._
    val sketches = keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(
        (mk: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Array[Byte], Long)]) => {
          val (bytes, seq) = state.getOption.getOrElse(
            (null: Array[Byte], 0L))
          val sk = if (bytes == null) new graft.functions.QSketch(512)
            else graft.functions.QSketch.deserialize(bytes)
          rows.foreach(r => sk.update(r._2))
          val next = (sk.serialize, seq + 1)
          state.update(next)
          Iterator.single((mk, next._2, next._1))
        })
      .toDF("mk", "seq", "sk")
    // noDataBatch=false: NoTimeout sketch-fold state, update mode —
    // the trailing batch is a no-op (r9 floor trim)
    val sink = StreamingSessions.runToCompletion(spark, sketches, sinkName,
      mode = "update", noDataBatch = false)
    import org.apache.spark.sql.expressions.Window
    val wLatest = Window.partitionBy(col("mk"))
      .orderBy(col("seq").desc)
    val monthly = sink
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(timestamp_micros(col("mk")).cast("timestamp_ntz").as("month"),
        col("sk"))
    graft.ops.OlapOps.quantileGradeFromMonthly(monthly, orders)
  }

  /** Streaming HEAVY-HITTERS maintenance — the [[quantileRollup]]
    * pattern for the Misra–Gries summary, completing the streaming
    * side of the mergeable-sketch family: per-month MG state folds
    * priority keys across micro-batches, the drained latest sketches
    * merge to quarters through the SAME
    * `graft.functions.MGMergeAgg` the batch query uses, and the
    * result grades against `agg_topk_union`'s own oracle (the
    * priority domain sits under the summary capacity, so the
    * streamed counts are exact by the degenerate-exact property
    * regardless of batch boundaries). */
  def topkRollup(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nanos = graft.Tables.rawNanosCols(spark, s"$sfDir/orders.parquet")
      .contains("o_orderdate")
    if (nanos)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderpriority", StringType),
      StructField("o_orderdate", if (nanos) LongType else TimestampNTZType)))
    val src = StreamSource.tableStream(spark, sfDir, "orders", ordersSchema)
      .withColumn("ts",
        if (nanos) timestamp_micros(expr("o_orderdate div 1000"))
        else col("o_orderdate").cast("timestamp"))
    val keyed = src.select(
        unix_micros(date_trunc("month", col("ts"))).as("mk"),
        col("o_orderpriority").as("v"))
      .as[(Long, String)]
    val sketches = keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(
        (mk: Long, rows: Iterator[(Long, String)],
         state: GroupState[(Array[Byte], Long)]) => {
          val (bytes, seq) = state.getOption.getOrElse(
            (null: Array[Byte], 0L))
          val sk = if (bytes == null) new graft.functions.MGSketch(8)
            else graft.functions.MGSketch.deserialize(bytes)
          rows.foreach(r => sk.update(r._2))
          val next = (sk.serialize, seq + 1)
          state.update(next)
          Iterator.single((mk, next._2, next._1))
        })
      .toDF("mk", "seq", "sk")
    val sink = StreamingSessions.runToCompletion(spark, sketches,
      "stream_topk_sketches", mode = "update", noDataBatch = false)
    import org.apache.spark.sql.expressions.Window
    val wLatest = Window.partitionBy(col("mk"))
      .orderBy(col("seq").desc)
    val monthly = sink
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(timestamp_micros(col("mk")).cast("timestamp_ntz").as("month"),
        col("sk"))
    // SHARED quarter-merge + top-3 tail (the quantileGradeFromMonthly
    // discipline): batch and stream grade through one definition
    graft.ops.OlapOps.topkGradeFromMonthly(monthly)
  }

  case class CdcState(micros: Long, seq: Long, op: String, bal: Double)

  /** Streaming CDC upsert — the streaming twin of `cdc_read_mor`: the
    * derived change stream (same column-level derivation,
    * [[graft.ops.CdcOps.deriveChanges]]) consumed as a file stream,
    * with LATEST-CHANGE-PER-KEY maintained in typed state
    * (`flatMapGroupsWithState`) — the canonical streaming-upsert-view
    * pattern, where state is the materialized "current row" per key
    * and each micro-batch emits the keys it touched. The finite
    * source drains, then the emitted current-rows merge with the
    * static base snapshot in one batch step (latest emission per key
    * → the same winner-unless-delete CASE as the batch MERGE).
    *
    * Grades against the IDENTICAL oracle as the batch forms: streamed
    * state + static base must reproduce the batch MERGE bit-for-bit.
    * Scale: state is O(|touched keys|) per window of change history,
    * partitioned across the state store; at 100 TB the emitted
    * upserts feed `foreachBatch` MERGE INTO a real table instead of a
    * memory sink, and the store bounds memory via watermark/TTL on
    * the change time. */
  def cdcUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // schema-dispatch like every reader (Tables.normalizeTimestamps):
    // a NANOS-encoded o_orderdate must be declared long + div 1000; a
    // MICROS NTZ one is declared exactly, so a future encoding change
    // fails resolution loudly instead of misreading
    val nanos = graft.Tables.rawNanosCols(spark, s"$sfDir/orders.parquet")
      .contains("o_orderdate")
    if (nanos)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ordersSchema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", if (nanos) LongType else TimestampNTZType)))
    val src = StreamSource.tableStream(spark, sfDir, "orders", ordersSchema)
      .withColumn("chg_micros",
        if (nanos) expr("o_orderdate div 1000")
        else unix_micros(col("o_orderdate").cast("timestamp")))
    val changes = graft.ops.CdcOps.deriveChanges(src)
      .select(col("c_custkey"), col("op"), col("acctbal"),
        col("chg_micros"), col("seq"))
      .as[(Long, String, Double, Long, Long)]

    val upserts = changes
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout())(
        (key: Long, rows: Iterator[(Long, String, Double, Long, Long)],
         state: GroupState[CdcState]) => {
          var cur = state.getOption.orNull
          rows.foreach { case (_, op, bal, m, q) =>
            if (cur == null || m > cur.micros || (m == cur.micros && q > cur.seq))
              cur = CdcState(m, q, op, bal)
          }
          state.update(cur)
          Iterator.single((key, cur.micros, cur.seq, cur.op, cur.bal))
        })
      .toDF("c_custkey", "micros", "seq", "d_op", "d_bal")

    // noDataBatch=false: NoTimeout custom state, update mode — the
    // trailing batch is a no-op (r9 floor trim)
    val sink = StreamingSessions.runToCompletion(spark, upserts,
      "stream_cdc_upserts", mode = "update", noDataBatch = false)

    // batch tail: final state per key (last emission wins), merged
    // with the static base under the winner-unless-delete rule
    import org.apache.spark.sql.expressions.Window
    val wFinal = Window.partitionBy(col("c_custkey"))
      .orderBy(col("micros").desc, col("seq").desc)
    val latest = sink
      .withColumn("rn", row_number().over(wFinal))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("d_op"), col("d_bal"))
    graft.ops.CdcOps.mergeLatestWithBase(
        graft.Tables.customer(spark, sfDir)
          .select(col("c_custkey"), col("c_acctbal")),
        latest)
      .orderBy(col("c_custkey"))
  }
}
