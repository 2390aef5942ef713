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

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Per-user event count + exact value sum via custom state. Values
    * are accumulated in integer cents so the emitted double equals the
    * oracle's decimal-exact sum. */
  def userTotals(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream.schema(eventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
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

    // see StreamingSessions.runToCompletion: fewer state stores for
    // the bounded local demo
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val q = try {
      summarized.writeStream
        .outputMode("update")
        .format("memory")
        .queryName("stream_user_totals")
        .start()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    try q.processAllAvailable() finally q.stop()
    spark.table("stream_user_totals")
      .orderBy(col("user_id"))
  }
}
