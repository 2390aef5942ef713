package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Event-stream operators over the `events` table (X5/X6/X9 in
  * SURVEY.md §2.7): JSON extraction, tumbling-window aggregation,
  * gap-based sessionization, and as-of join against the orders
  * timeline.
  *
  * Scale notes: sessionization is a single shuffle on `user_id`
  * followed by in-partition window functions — no driver-side state.
  * The as-of join avoids a full non-equi cross product by unioning the
  * two sides and using a window, i.e. the classic distributed
  * merge-as-of: shuffle both sides once on the key, sort by time in
  * the partition, carry the last order forward with `last(..., true)`.
  */
object EventOps {

  /** X5: extract typed values from the JSON `props` column. */
  def jsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** X6 (tumbling): hourly counts + exact value sums per event type.
    * NB: `date_trunc` returns TIMESTAMP (local-tz) even for NTZ input —
    * cast back to NTZ so the written parquet stays naive like the
    * DuckDB oracle's. */
  def hourlyRollup(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** X6 (sliding): hour-long windows advancing every 30 minutes —
    * the OVERLAPPING-window member the tumbling [[hourlyRollup]] is
    * not; every event lands in exactly size/slide = 2 windows. The
    * engine's native `window()` generator does the fan-out (a
    * codegen'd projection that emits one row per covering window
    * BEFORE the partial aggregate, so map-side combine still bounds
    * the shuffle at the |windows|×|types| grain — the row
    * multiplication is a constant 2, never data-dependent). Windows
    * are epoch-aligned to multiples of the slide, which is what the
    * oracle replays arithmetically: the two covering starts are
    * floor(ts/slide)·slide and that minus one slide. Counts exact;
    * value sums take the exact-decimal route ([[hourlyRollup]]). */
  def slidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").cast("timestamp_ntz").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** X6 (sessions): gap>30min starts a new session. lag + cumulative
    * sum of session-start markers — the standard batch sessionizer. */
  def sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_sec"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** X9 as-of join: for each event, the most recent order of the same
    * customer at-or-before the event time. Implemented as the
    * union-merge as-of: tag both sides, shuffle once on the key, sort
    * by time within the partition, and carry the latest order forward
    * — O(n log n) per partition, no range cross-product, survives
    * 100× scale-up unlike a theta-join.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id").as("key"), col("ts"),
        col("event_id"), lit(1).as("is_event"),
        lit(null).cast(LongType).as("o_orderkey"))
    val ord = Tables.orders(s, d)
      .select(col("o_custkey").as("key"), col("o_orderdate").as("ts"),
        lit(null).cast(LongType).as("event_id"), lit(0).as("is_event"),
        col("o_orderkey"))
    // At equal timestamps the order sorts first (is_event asc) so it is
    // visible to the event: as-of is "at or before".
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("is_event"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("asof_orderkey", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 1)
      .select(col("event_id"), col("key").as("user_id"), col("ts"),
        col("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  /** X9 via the NATIVE as-of operator (graft.plans.AsOfJoin): one
    * exchange + sort per side, single merge scan — same oracle as the
    * composed form above. */
  def asofJoinNative(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    graft.plans.AsOf.join(ev, ord,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "o_custkey", rightTime = "o_orderdate",
        rightTieBreak = "o_orderkey")
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey").as("asof_orderkey"))
      .orderBy(col("event_id"))
  }

  /** X9 with a match-staleness bound (pandas merge_asof
    * `tolerance=`): the as-of match counts only if it is at most N
    * days older than the event — a stale match becomes NULL, which is
    * how timeline enrichment avoids attributing to long-dead context.
    * Same custom operator and plan shape; the bound is one extra
    * comparison in the merge scan, not a different join. N = 8400
    * days because the synthetic corpus's event→order gaps span
    * 8209–9311 days (events are years after the TPC-H order window),
    * so this bound exercises BOTH the keep and the null branch; in
    * production the same parameter would be hours or days. */
  def asofJoinTolerance(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("event_id"), col("user_id"), col("ts"))
    val ord = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    graft.plans.AsOf.join(ev, ord,
        leftKey = "user_id", leftTime = "ts",
        rightKey = "o_custkey", rightTime = "o_orderdate",
        rightTieBreak = "o_orderkey",
        toleranceMicros = Some(8400L * 86400L * 1000000L))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("o_orderkey").as("asof_orderkey_bounded"))
      .orderBy(col("event_id"))
  }

  /** X9 with `direction='nearest'` (the pandas merge_asof variant the
    * backward/forward pair doesn't cover): each CLICK event matches
    * the PURCHASE event of the same user with the SMALLEST absolute
    * time gap, ties going backward (the at-or-before match) — the
    * attribution question "which purchase is this click closest to".
    * Clicks and purchases INTERLEAVE in the fixture, so the forward
    * branch, the nearest comparison and the tie rule are all live
    * under the oracle gate (the first cut matched events to orders,
    * whose dates all precede every event — the forward branch was
    * hash-gate-vacuous; review finding). Same union-merge shape as
    * [[asofJoin]] — one shuffle on the key, one sort, and BOTH
    * directional carries read the same sorted frame (backward =
    * `last` over the preceding frame, forward = `first` over the
    * following frame): no second shuffle, no range join. Matches at
    * the exact click timestamp belong to the backward carry (right
    * rows sort before left rows at equal ts), so the forward side is
    * strictly after — mirroring the oracle's `<=`/`>` split. Tie
    * rules within a direction: backward takes the latest (ts, id),
    * forward the earliest. The gap is SIGNED: positive = the match
    * precedes the click, negative = it follows. */
  def asofJoinNearest(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    asofJoinNearestOn(
      ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts")),
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("o_custkey"), col("ts").as("o_orderdate"),
          col("event_id").as("o_orderkey")))
  }

  /** Core of [[asofJoinNearest]], parameterized for the planted spec. */
  private[graft] def asofJoinNearestOn(events: DataFrame,
      orders: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id").as("key"), col("ts"),
        col("event_id"), lit(1).as("is_event"),
        lit(null).cast(LongType).as("o_orderkey"))
    val ord = orders
      .select(col("o_custkey").as("key"), col("o_orderdate").as("ts"),
        lit(null).cast(LongType).as("event_id"), lit(0).as("is_event"),
        col("o_orderkey"))
    val tagged = ev.unionByName(ord)
      .withColumn("om", when(col("is_event") === 0,
        struct(col("ts").as("ots"), col("o_orderkey").as("okey"))))
    def w = Window.partitionBy(col("key"))
      .orderBy(col("ts"), col("is_event"), col("o_orderkey"))
    tagged
      .withColumn("bm", last(col("om"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("fm", first(col("om"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .filter(col("is_event") === 1)
      // nearest DECISION on exact microsecond gaps (ADVICE r13: the
      // events fixture carries sub-second residue on every timestamp,
      // and a whole-second-truncated comparison diverges from true-
      // instant merge_asof semantics); the REPORTED gap is the floor
      // of the true gap in seconds — both directions' gaps are
      // nonnegative by construction, so DIV is that floor.
      // the NTZ→LTZ cast relies on the repo-wide UTC session pin
      // (every entrypoint sets spark.sql.session.timeZone=UTC): under
      // a DST-observing zone the two operands of a difference can
      // convert under DIFFERENT offsets across a transition, shifting
      // gaps by the DST hour — "offsets cancel" is only true in a
      // fixed-offset zone (review finding)
      .withColumn("bgap_us",
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("bm.ots").cast("timestamp")))
      .withColumn("fgap_us",
        unix_micros(col("fm.ots").cast("timestamp")) -
          unix_micros(col("ts").cast("timestamp")))
      .withColumn("useB", col("bm").isNotNull &&
        (col("fm").isNull || col("bgap_us") <= col("fgap_us")))
      .select(col("event_id"), col("key").as("user_id"), col("ts"),
        when(col("useB"), col("bm.okey")).otherwise(col("fm.okey"))
          .as("nearest_id"),
        when(col("useB"), expr("bgap_us DIV 1000000"))
          .when(col("fm").isNotNull, -expr("fgap_us DIV 1000000"))
          .as("nearest_gap_sec"))
      .orderBy(col("event_id"))
  }

  /** X5 typed path: `from_json` with a declared schema (the idiomatic
    * form when the JSON shape is known — parses once into a struct,
    * no per-path re-parse like get_json_object). */
  def jsonTyped(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("parsed",
        from_json(col("props"), StructType(Seq(StructField("k", LongType)))))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("parsed.k")).as("sum_k"),
        count(col("parsed.k")).as("n_parsed"))
      .orderBy(col("event_type"))

  // ------------------------------------------ interval-overlap join

  /** Bucket width for the interval-overlap reduction: wide enough
    * that day-bounded spans explode into a handful of rows, narrow
    * enough that a bucket's population stays far below the corpus. */
  private val OvlBucketSec = 21600L // 6 h
  /** Busy-day floor: spans built only from user-days with ≥ this many
    * events, so the interval sets are the meaningful co-presence
    * candidates, not every drive-by singleton. */
  private val OvlMinEvents = 5

  /** Per-(user, day) activity spans — the interval sets the overlap
    * join consumes: [first event, last event] epoch seconds of each
    * busy user-day. Day-bounded by construction, so only same-day
    * spans can ever overlap. */
  private def userDaySpans(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        unix_timestamp(min(col("ts"))).as("lo"),
        unix_timestamp(max(col("ts"))).as("hi"))
      .filter(col("n") >= OvlMinEvents)
      .select(col("user_id"), col("lo"), col("hi"))

  /** INTERVAL × INTERVAL overlap self-join — co-presence: user pairs
    * whose busy-day activity spans intersect, ranked by total shared
    * seconds. Completes the non-equi family next to point-in-interval
    * ([[graft.ops.Relational.bandJoin]]) and as-of: a naive
    * formulation is a θ-self-join (`a.lo <= b.hi AND b.lo <= a.hi`)
    * that Spark plans as BroadcastNestedLoopJoin — O(n²) and
    * forbidden here by the PlanInvariants walker. The standard
    * distributed reduction instead: explode each span across the
    * fixed-width time chunks it touches, EQUI-join on the chunk
    * (hash, partitionable), keep exact-overlap survivors, and count
    * each qualifying pair ONCE via chunk ownership — only the chunk
    * containing the later start emits (that chunk lies inside both
    * spans, so both sides exploded into it; every other shared chunk
    * is suppressed). Overlap seconds are exact integer arithmetic on
    * epoch seconds; the DuckDB oracle runs the direct θ-join (its
    * IEJoin handles inequality joins natively) — the graded equality
    * is the proof the bucketing reduction loses and double-counts
    * nothing. At 100 TB chunk width tunes to the span distribution;
    * skew in a hot chunk is the salted/AQE story like any hash
    * join. */
  def intervalOverlap(s: SparkSession, d: String): DataFrame = {
    val spans = userDaySpans(s, d)
    val exploded = spans.withColumn("bk",
      explode(sequence((col("lo") / OvlBucketSec).cast("long"),
        (col("hi") / OvlBucketSec).cast("long"))))
    val a = exploded.select(col("user_id").as("user_a"),
      col("lo").as("a_lo"), col("hi").as("a_hi"), col("bk"))
    val b = exploded.select(col("user_id").as("user_b"),
      col("lo").as("b_lo"), col("hi").as("b_hi"), col("bk"))
    a.join(b, Seq("bk"))
      .filter(col("user_a") < col("user_b") &&
        col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi") &&
        (greatest(col("a_lo"), col("b_lo")) / OvlBucketSec).cast("long")
          === col("bk"))
      .select(col("user_a"), col("user_b"),
        (least(col("a_hi"), col("b_hi")) -
          greatest(col("a_lo"), col("b_lo"))).as("ovl"))
      .groupBy(col("user_a"), col("user_b"))
      .agg(count(lit(1)).as("n_overlaps"), sum(col("ovl")).as("overlap_sec"))
      .orderBy(col("overlap_sec").desc, col("user_a"), col("user_b"))
      .limit(20)
  }

  /** Time-range window frame: per-user rolling 24 h event count/sum —
    * RANGE frames over epoch seconds (engine-portable numeric form). */
  def rangeFrame(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch"))
      .rangeBetween(-86400L, 0L)
    Tables.events(s, d)
      .withColumn("epoch", unix_timestamp(col("ts")))
      .withColumn("n_24h", count(lit(1)).over(w))
      .withColumn("sum_24h", sum(col("value").cast(D18_2)).over(w).cast("double"))
      .select(col("event_id"), col("user_id"), col("n_24h"), col("sum_24h"))
      .orderBy(col("event_id"))
  }

  /** Hourly-count anomaly scan: flag (event_type, hour) buckets whose
    * count sits ≥ 2σ from the type's hourly mean — the monitoring
    * query an ingest pipeline runs over its own volume. Mean/variance
    * come from exact integer sums (n, Σx, Σx²) with the divisions and
    * sqrt done once per GROUP in both engines — identical IEEE
    * expression trees, so the z-scores (and the ≥ 2σ cut itself) are
    * bit-deterministic. The tiny per-type stats frame broadcasts back
    * onto the hourly counts: the wide data never shuffles twice. */
  def anomaly(s: SparkSession, d: String): DataFrame = {
    val hourly = Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
      .withColumn("mean",
        col("s").cast("double") / col("n_hours").cast("double"))
      .withColumn("variance",
        col("ss").cast("double") / col("n_hours").cast("double") -
          col("mean") * col("mean"))
      .select(col("event_type"), col("mean"), col("variance"))
    hourly.join(broadcast(stats), Seq("event_type"))
      .filter(col("variance") > 0.0)
      .withColumn("z",
        (col("n").cast("double") - col("mean")) / sqrt(col("variance")))
      .filter(abs(col("z")) >= 2.0)
      .select(col("event_type"), col("hour"), col("n"),
        round(col("z"), 6).as("z"))
      .orderBy(col("event_type"), col("hour"))
  }

  // gapfill is graded on a bounded user slice so the scaffold stays
  // human-sized at every SF (the fixture spans one month ≈ 720 hourly
  // slots per user; 5 users ≈ 3.6 k rows)
  private val GapfillMaxUser = 5L

  /** Time-series regularization: per-user hourly resample with LINEAR
    * INTERPOLATION of the gaps — the `resample().interpolate()` of
    * the time-series world, and the preprocessing step every
    * training pipeline over irregular telemetry runs before
    * fixed-step models see the data.
    *
    * Three distributed stages, no driver loops:
    *  1. hourly aggregate (exact decimal sums — ops/package.scala);
    *  2. per-user scaffold: `sequence(min_hour, max_hour, 1h)`
    *     exploded — the dense time axis generated ON the executors,
    *     sized |users| × span;
    *  3. one window pass per direction carrying the last/next known
    *     (hour, value) pair, then the interpolation arithmetic.
    *
    * Edges need no special case: the scaffold is bounded by each
    * user's own min/max KNOWN hour, so every gap has both neighbors.
    * The interpolation is evaluated as the identical IEEE expression
    * tree in Spark and the oracle — exact-decimal endpoints cast to
    * double once, integer hour offsets, one multiply, one divide —
    * so the filled values hash-match bit-for-bit.
    *
    * Scale shape: one exchange on `user_id` for the hourly agg; the
    * scaffold explode and both windows reuse that partitioning (the
    * join keys lead with user_id). State per task = one user's month,
    * independent of corpus size. */
  def gapfillInterp(s: SparkSession, d: String): DataFrame =
    gapfillOn(Tables.events(s, d).filter(col("user_id") < GapfillMaxUser))

  /** The resample+interpolate core over any (user_id, ts, value)
    * frame — exposed for the degenerate sweep (empty corpus,
    * single-event users: mn==mx makes a 1-slot scaffold with no gap,
    * which must not throw). */
  def gapfillOn(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("h"))
    val wPrev = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = byUser.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val hourly = ev
      .groupBy(col("user_id"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("h"))
      .agg(sum(col("value").cast(D18_2)).as("sv"))
    val scaffold = hourly.groupBy(col("user_id"))
      .agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      .select(col("user_id"),
        explode(sequence(col("mn"), col("mx"),
          expr("INTERVAL '1' HOUR"))).as("h"))
    scaffold.join(hourly, Seq("user_id", "h"), "left")
      .withColumn("prev_v", last(col("sv"), ignoreNulls = true).over(wPrev))
      .withColumn("prev_h",
        last(when(col("sv").isNotNull, col("h")), ignoreNulls = true).over(wPrev))
      .withColumn("next_v", first(col("sv"), ignoreNulls = true).over(wNext))
      .withColumn("next_h",
        first(when(col("sv").isNotNull, col("h")), ignoreNulls = true).over(wNext))
      .withColumn("value_filled",
        when(col("sv").isNotNull, col("sv").cast("double"))
          .otherwise(col("prev_v").cast("double") +
            (col("next_v").cast("double") - col("prev_v").cast("double")) *
              ((unix_timestamp(col("h")) - unix_timestamp(col("prev_h"))) / 3600L)
                .cast("double") /
              ((unix_timestamp(col("next_h")) - unix_timestamp(col("prev_h"))) / 3600L)
                .cast("double")))
      .withColumn("is_interpolated", col("sv").isNull)
      .select(col("user_id"), col("h"), col("value_filled"),
        col("is_interpolated"))
      .orderBy(col("user_id"), col("h"))
  }

  /** OHLC downsampling: per (hour, event_type), the open/high/low/
    * close of `value` — the standard irregular→bar resample. Open and
    * close are selected by a total order ((ts, event_id) — event_id
    * is unique, so ties are impossible) via min/max over a struct:
    * one partial-aggregating shuffle, no window sort. Values pass
    * through unaggregated (no float summation), so determinism needs
    * no decimal detour. */
  def resampleOhlc(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(struct(col("ts"), col("event_id"), col("value")))
          .getField("value").as("close"))
      .orderBy(col("hour"), col("event_type"))

  // ------------------------------------- Markov transitions (r9)

  /** First-order Markov transition matrix over per-user event
    * sequences — the SEQUENCE-mining family member (what follows
    * what), distinct from the co-occurrence/itemset families (what
    * appears together): for every (from → to) event-type pair, the
    * transition count and the row-normalized transition probability.
    *
    * One shuffle on `user_id` (the sessionizer's partitioning), lag
    * within the partition under the total order (ts, event_id) —
    * event_id is unique, so the successor relation is deterministic
    * even under timestamp ties. The normalization window partitions
    * by `from_type` over the ALREADY-AGGREGATED matrix (|types|²
    * rows, never the event grain), so no global or event-sized window
    * exists in the plan. Counts are exact integers; each probability
    * is one IEEE division of two exact longs, rounded to 9 digits
    * (the catalog's derived-float standard). */
  def markovTransitions(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val matrix = Tables.events(s, d)
      .withColumn("from_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    matrix
      .withColumn("p_trans",
        round(col("n_trans").cast("double") /
          sum(col("n_trans")).over(Window.partitionBy(col("from_type"))), 9))
      .orderBy(col("from_type"), col("to_type"))
  }

  // --------------------------------------- decayed trending (r9)

  /** Decay horizon in days: an event `age` days before the corpus
    * max date weighs 2^(H−age); anything older than H weighs 0. */
  private val DecayHorizonDays = 30

  /** Exponentially time-decayed popularity per event type — the
    * trending/recency-scoring operator every feed and "hot items"
    * dashboard runs, in pure INTEGER arithmetic: half-life decay with
    * the weight 2^(H−age_days) as an exact power-of-two long, summed
    * as longs, so the score hash-matches the DuckDB replay with no
    * float anywhere (the usual exp(−λ·age) formulation is
    * order-dependent double summation — ungradeable).
    *
    * The corpus max date and row count come from one aggregate
    * collected as driver scalars (the sanctioned scalar shape); the
    * row count feeds the overflow require — beyond ~8.6e9 events the
    * weighted sum could exceed a long and the accumulator would move
    * to DECIMAL(38,0). One scan + one partial-agg shuffle at the
    * |event types| grain. */
  def decayedTrend(s: SparkSession, d: String): DataFrame = {
    val h = DecayHorizonDays
    val head = Tables.events(s, d)
      .agg(max(to_date(col("ts"))).as("maxd"), count(lit(1)).as("n"))
      .head()
    val maxDay = head.getDate(0)
    require(head.getLong(1) < (Long.MaxValue >> (h + 1)),
      s"decayedTrend long accumulator needs n_events < 2^${62 - h}: " +
        "switch the score sum to DECIMAL(38,0)")
    Tables.events(s, d)
      .withColumn("age", datediff(lit(maxDay), to_date(col("ts"))))
      .withColumn("w", when(col("age") <= h,
          expr(s"shiftleft(cast(1 as bigint), $h - age)"))
        .otherwise(lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("w")).as("decayed_score"))
      .orderBy(col("decayed_score").desc, col("event_type"))
  }

  /** CUSUM change-point detection over the hourly series, per event
    * type — the level-shift locator every monitoring stack runs after
    * [[anomaly]] flags THAT something moved: WHERE it moved. The
    * classic statistic argmax_i |Σ_{j≤i}(x_j − x̄)| is a rational mean
    * away from integer; cross-multiplying by m (the hour count) makes
    * the deviation m·prefix_i − i·total an EXACT long (counts ≤ 2⁶³/m²
    * — comfortably true for hourly grains), so the argmax, its
    * tie-break (earliest hour), and the reported magnitude are all
    * integer-deterministic; the only float is the final normalized
    * magnitude dev/(m·total), one identical division rounded 9.
    *
    * All windows run at the AGGREGATED hourly grain partitioned by
    * type (≤ hours·types rows), never the event grain. */
  def changepoint(s: SparkSession, d: String): DataFrame = {
    val byType = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val cum = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val hourly = Tables.events(s, d)
      .groupBy(col("event_type"),
        date_trunc("hour", col("ts")).cast("timestamp_ntz").as("hour"))
      .agg(count(lit(1)).as("x"))
      .withColumn("prefix", sum(col("x")).over(cum))
      .withColumn("i", row_number().over(byType).cast("long"))
    val stats = hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("m"), sum(col("x")).as("total"))
    val dev = hourly.join(broadcast(stats), Seq("event_type"))
      .withColumn("dev", col("m") * col("prefix") - col("i") * col("total"))
    val best = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("dev")).desc, col("hour"))
    dev.withColumn("rn", row_number().over(best))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("m").as("n_hours"),
        col("hour").as("change_hour"), abs(col("dev")).as("max_abs_dev"),
        round(abs(col("dev")).cast("double") /
          (col("m") * col("total")).cast("double"), 9).as("rel_shift"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "events_changepoint" -> changepoint,
    "events_markov_transitions" -> markovTransitions,
    "events_decayed_trend" -> decayedTrend,
    "events_gapfill" -> gapfillInterp,
    "events_resample_ohlc" -> resampleOhlc,
    "json_extract" -> jsonExtract,
    "events_anomaly" -> anomaly,
    "json_typed" -> jsonTyped,
    "window_range_frame" -> rangeFrame,
    // deliberate twin of stream_hourly_rollup (VERDICT r4 #8): same
    // rows by design, DIFFERENT engines under grade — this one is the
    // batch hash-aggregate plan, the stream one drives watermark +
    // window-state machinery; identical output IS the streaming twin's
    // correctness contract, so both stay in the catalog
    "window_hourly_rollup" -> hourlyRollup,
    "events_sliding_window" -> slidingWindow,
    "sessionize_gap30m" -> sessionize,
    "join_interval_overlap" -> intervalOverlap,
    "join_asof_orders" -> asofJoin,
    "join_asof_nearest" -> asofJoinNearest,
    "join_asof_native" -> asofJoinNative,
    "join_asof_tolerance" -> asofJoinTolerance,
  )

  val oracles: Map[String, String] = Map(
    // the same cross-multiplied integer CUSUM; row_number tie-break
    // (|dev| desc, hour) identical
    "events_changepoint" ->
      """WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |c AS (SELECT event_type, hour, x,
        |    CAST(SUM(x) OVER (PARTITION BY event_type ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS prefix,
        |    CAST(row_number() OVER (PARTITION BY event_type
        |      ORDER BY hour) AS BIGINT) AS i
        |  FROM h),
        |st AS (SELECT event_type, COUNT(*) AS m,
        |    CAST(SUM(x) AS BIGINT) AS total
        |  FROM h GROUP BY 1),
        |d AS (SELECT c.event_type, c.hour, st.m, st.total,
        |    st.m * c.prefix - c.i * st.total AS dev
        |  FROM c JOIN st USING (event_type)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(dev) DESC, hour) AS rn FROM d)
        |SELECT event_type, m AS n_hours, hour AS change_hour,
        |  CAST(abs(dev) AS BIGINT) AS max_abs_dev,
        |  round(CAST(abs(dev) AS DOUBLE) / CAST(m * total AS DOUBLE), 9)
        |    AS rel_shift
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    // same lag chain under the same (ts, event_id) total order; the
    // probability is the identical two-long division rounded to 9
    "events_markov_transitions" ->
      """WITH tr AS (
        |  SELECT lag(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
        |    event_type AS to_type
        |  FROM events),
        |cnt AS (SELECT from_type, to_type, COUNT(*) AS n_trans
        |  FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_trans,
        |  round(CAST(n_trans AS DOUBLE) /
        |    SUM(n_trans) OVER (PARTITION BY from_type), 9) AS p_trans
        |FROM cnt ORDER BY from_type, to_type""".stripMargin,
    // same power-of-two integer weights off the same scalar max date
    // (here a scalar subquery where the engine collects an aggregate)
    "events_decayed_trend" ->
      s"""WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
         |w AS (SELECT event_type,
         |  CASE WHEN date_diff('day', CAST(ts AS DATE),
         |      (SELECT maxd FROM mx)) <= $DecayHorizonDays
         |    THEN CAST(1 AS BIGINT) << ($DecayHorizonDays -
         |      date_diff('day', CAST(ts AS DATE), (SELECT maxd FROM mx)))
         |    ELSE CAST(0 AS BIGINT) END AS w
         |  FROM events)
         |SELECT event_type, COUNT(*) AS n_events,
         |  CAST(SUM(w) AS BIGINT) AS decayed_score
         |FROM w GROUP BY event_type
         |ORDER BY decayed_score DESC, event_type""".stripMargin,
    // the DIRECT theta-self-join (DuckDB's IEJoin runs inequality
    // joins natively): graded equality proves the engine's bucketed
    // equi-join reduction loses and double-counts nothing
    "join_interval_overlap" ->
      s"""WITH spans AS (
        |  SELECT user_id,
        |    CAST(floor(epoch(MIN(ts))) AS BIGINT) AS lo,
        |    CAST(floor(epoch(MAX(ts))) AS BIGINT) AS hi
        |  FROM events GROUP BY user_id, CAST(ts AS DATE)
        |  HAVING COUNT(*) >= $OvlMinEvents)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |  COUNT(*) AS n_overlaps,
        |  CAST(SUM(LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo)) AS BIGINT)
        |    AS overlap_sec
        |FROM spans a JOIN spans b
        |  ON a.user_id < b.user_id AND a.lo <= b.hi AND b.lo <= a.hi
        |GROUP BY 1, 2
        |ORDER BY overlap_sec DESC, user_a, user_b LIMIT 20""".stripMargin,
    // mirror of gapfillInterp stage for stage; the interpolation line
    // is the IDENTICAL IEEE expression tree (decimal endpoints cast to
    // double once, integer hour offsets, multiply then divide) so the
    // filled doubles are bit-equal, not approximately equal
    "events_gapfill" ->
      s"""WITH hourly AS (
         |  SELECT user_id, date_trunc('hour', ts) AS h,
         |    SUM(CAST(value AS DECIMAL(18,2))) AS sv
         |  FROM events WHERE user_id < $GapfillMaxUser GROUP BY 1, 2),
         |bounds AS (
         |  SELECT user_id, MIN(h) AS mn, MAX(h) AS mx
         |  FROM hourly GROUP BY user_id),
         |scaffold AS (
         |  SELECT user_id,
         |    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
         |  FROM bounds),
         |j AS (
         |  SELECT s.user_id, s.h, hv.sv FROM scaffold s
         |  LEFT JOIN hourly hv ON hv.user_id = s.user_id AND hv.h = s.h),
         |f AS (
         |  SELECT user_id, h, sv,
         |    LAST_VALUE(sv IGNORE NULLS) OVER wp AS prev_v,
         |    LAST_VALUE(CASE WHEN sv IS NOT NULL THEN h END IGNORE NULLS)
         |      OVER wp AS prev_h,
         |    FIRST_VALUE(sv IGNORE NULLS) OVER wn AS next_v,
         |    FIRST_VALUE(CASE WHEN sv IS NOT NULL THEN h END IGNORE NULLS)
         |      OVER wn AS next_h
         |  FROM j
         |  WINDOW
         |    wp AS (PARTITION BY user_id ORDER BY h
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY user_id ORDER BY h
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, h,
         |  CASE WHEN sv IS NOT NULL THEN CAST(sv AS DOUBLE)
         |       ELSE CAST(prev_v AS DOUBLE) +
         |         (CAST(next_v AS DOUBLE) - CAST(prev_v AS DOUBLE)) *
         |         CAST(date_diff('hour', prev_h, h) AS DOUBLE) /
         |         CAST(date_diff('hour', prev_h, next_h) AS DOUBLE)
         |  END AS value_filled,
         |  (sv IS NULL) AS is_interpolated
         |FROM f ORDER BY user_id, h""".stripMargin,
    // open/close via the same (ts, event_id) total order the struct
    // min/max encodes; event_id is unique so rank 1 is unambiguous
    "events_resample_ohlc" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, ts,
        |    event_id, value
        |  FROM events),
        |r AS (
        |  SELECT hour, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY hour, event_type
        |      ORDER BY ts, event_id) AS ra,
        |    ROW_NUMBER() OVER (PARTITION BY hour, event_type
        |      ORDER BY ts DESC, event_id DESC) AS rd
        |  FROM e)
        |SELECT hour, event_type, COUNT(*) AS n,
        |  MAX(CASE WHEN ra = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MAX(CASE WHEN rd = 1 THEN value END) AS close
        |FROM r GROUP BY hour, event_type
        |ORDER BY hour, event_type""".stripMargin,
    "json_typed" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_parsed
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "window_range_frame" ->
      """SELECT event_id, user_id,
        |  COUNT(*) OVER w AS n_24h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_24h
        |FROM (SELECT event_id, user_id, value,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS epoch FROM events) t
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch
        |  RANGE BETWEEN 86400 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "json_extract" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "events_anomaly" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (
        |  SELECT event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n_hours,
        |    CAST(SUM(n) AS BIGINT) AS s,
        |    CAST(SUM(n * n) AS BIGINT) AS ss
        |  FROM hourly GROUP BY event_type),
        |st AS (
        |  SELECT event_type,
        |    CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE) AS mean,
        |    CAST(ss AS DOUBLE) / CAST(n_hours AS DOUBLE) -
        |      (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE)) *
        |      (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE)) AS variance
        |  FROM stats)
        |SELECT h.event_type, h.hour, h.n,
        |  round((CAST(h.n AS DOUBLE) - st.mean) / sqrt(st.variance), 6) AS z
        |FROM hourly h JOIN st USING (event_type)
        |WHERE st.variance > 0
        |  AND abs((CAST(h.n AS DOUBLE) - st.mean) / sqrt(st.variance)) >= 2.0
        |ORDER BY h.event_type, h.hour""".stripMargin,
    "window_hourly_rollup" ->
      s"""SELECT date_trunc('hour', ts) AS hour, event_type,
         |  COUNT(*) AS n, ${sql.dsum("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the two covering epoch-aligned starts, derived arithmetically —
    // equality proves the engine's window() fan-out assigns every
    // event to exactly the slide-aligned [start, start+1h) pair
    "events_sliding_window" ->
      s"""WITH w AS (SELECT event_type, value,
         |    make_timestamp((epoch_us(ts) // 1800000000) * 1800000000)
         |      AS s1
         |  FROM events),
         |b AS (
         |  SELECT event_type, value, s1 AS win_start FROM w
         |  UNION ALL
         |  SELECT event_type, value, s1 - INTERVAL 30 MINUTE FROM w)
         |SELECT win_start, event_type, COUNT(*) AS n,
         |  ${sql.dsum("value")} AS sum_value
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "sessionize_gap30m" ->
      """WITH marked AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |      OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
        |      THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS session_id
        |  FROM marked)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(ts) AS session_start,
        |  CAST(floor(epoch(MAX(ts))) - floor(epoch(MIN(ts))) AS BIGINT)
        |    AS duration_sec
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "join_asof_native" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  (SELECT o.o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
        |  AS asof_orderkey
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_orders" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  (SELECT o.o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
        |  AS asof_orderkey
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_tolerance" ->
      """SELECT e.event_id, e.user_id, e.ts,
        |  (SELECT o.o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |     AND o.o_orderdate >= e.ts - INTERVAL 8400 DAY
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
        |  AS asof_orderkey_bounded
        |FROM events e
        |ORDER BY e.event_id""".stripMargin,
    "join_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |r AS (SELECT user_id AS k, ts AS rts, event_id AS rid
        |  FROM events WHERE event_type = 'purchase'),
        |x AS (SELECT l.event_id, l.user_id, l.ts,
        |  (SELECT r.rid FROM r WHERE r.k = l.user_id AND r.rts <= l.ts
        |   ORDER BY r.rts DESC, r.rid DESC LIMIT 1) AS bk,
        |  (SELECT r.rts FROM r WHERE r.k = l.user_id AND r.rts <= l.ts
        |   ORDER BY r.rts DESC, r.rid DESC LIMIT 1) AS bts,
        |  (SELECT r.rid FROM r WHERE r.k = l.user_id AND r.rts > l.ts
        |   ORDER BY r.rts ASC, r.rid ASC LIMIT 1) AS fk,
        |  (SELECT r.rts FROM r WHERE r.k = l.user_id AND r.rts > l.ts
        |   ORDER BY r.rts ASC, r.rid ASC LIMIT 1) AS fts
        |  FROM l),
        |y AS (SELECT *, bk IS NOT NULL AND (fk IS NULL OR
        |    date_diff('microsecond', bts, ts)
        |      <= date_diff('microsecond', ts, fts))
        |    AS useb FROM x)
        |SELECT event_id, user_id, ts,
        |  CASE WHEN useb THEN bk ELSE fk END AS nearest_id,
        |  CAST(CASE WHEN useb
        |    THEN date_diff('microsecond', bts, ts) // 1000000
        |    WHEN fk IS NOT NULL
        |    THEN -(date_diff('microsecond', ts, fts) // 1000000)
        |    END AS BIGINT) AS nearest_gap_sec
        |FROM y ORDER BY event_id""".stripMargin,
  )
}
