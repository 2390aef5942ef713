package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-module operator inventories; each
  * SQL-expressible query has a matching DuckDB oracle in `oracleSql`
  * (same column names, deterministic ordering, exact arithmetic — see
  * `graft.ops` package doc).
  */
object SparkEntry {

  // Oracles are captured BY NAME (thunks), not by value: SimilarityOps
  // generates its trainer-derived oracles from constants that only
  // exist after the queries have run (Verify runs every query, then
  // dumps oracleSql), so each module's oracle map must be re-read at
  // dump time rather than frozen when this Seq is first forced.
  private lazy val modules: Seq[(String, Map[String, (SparkSession, String) => DataFrame], () => Map[String, String])] =
    Seq(
      ("Relational", ops.Relational.queries, () => ops.Relational.oracles),
      ("EventOps", ops.EventOps.queries, () => ops.EventOps.oracles),
      ("OlapOps", ops.OlapOps.queries, () => ops.OlapOps.oracles),
      ("TextOps", ops.TextOps.queries, () => ops.TextOps.oracles),
      ("DedupOps", ops.DedupOps.queries, () => ops.DedupOps.oracles),
      ("SimilarityOps", ops.SimilarityOps.queries, () => ops.SimilarityOps.oracles),
      ("MultimodalOps", ops.MultimodalOps.queries, () => ops.MultimodalOps.oracles),
      ("EtlParity", ops.EtlParity.queries, () => ops.EtlParity.oracles),
      ("ScalarFuncs", ops.ScalarFuncs.queries, () => ops.ScalarFuncs.oracles),
      ("Analytics", ops.Analytics.queries, () => ops.Analytics.oracles),
      ("LayoutOps", ops.LayoutOps.queries, () => ops.LayoutOps.oracles),
      ("CdcOps", ops.CdcOps.queries, () => ops.CdcOps.oracles),
      ("streaming", streamingQueries, () => streamingOracles),
    )

  /** The authoritative (module name → query names) inventory — the
    * ONE registration point. CatalogDump derives QUERIES.md's module
    * column from this instead of a hand-duplicated parallel list that
    * silently mislabeled queries of any newly added module. */
  def moduleInventory: Seq[(String, Set[String])] =
    modules.map { case (n, qs, _) => (n, qs.keySet) }

  /** Structured Streaming twins of the batch event queries (SURVEY.md
    * §7.2 M4). The hourly rollup is oracle-able (tumbling windows are
    * epoch-aligned = date_trunc). Session counts are oracle-able too:
    * `session_window` was probed empirically (TieProbeSpec pattern) —
    * an event EXACTLY gap-after the previous EXTENDS the session
    * (merge condition `next.ts <= prev_end`), i.e. a new session
    * starts iff the gap is STRICTLY exceeded, which is expressible as
    * `ts - lag(ts) > INTERVAL 30 MINUTE` in ANSI SQL. The fixtures
    * carry no sub-microsecond timestamp residue (DuckDB reads the
    * nanos parquet at full precision, Spark truncates to µs), so both
    * engines evaluate the same strict comparison on the same values. */
  private val streamingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_hourly_rollup" -> (streaming.StreamingSessions.hourlyCounts _),
    "stream_sessionize" -> (streaming.StreamingSessions.sessionCounts _),
    "stream_stateful_totals" -> (streaming.StatefulOps.userTotals _),
    "stream_dedup_users" -> (streaming.StreamingSessions.distinctUsers _),
    "stream_join_attrib" -> (streaming.StreamingSessions.purchaseAttribution _),
    "stream_enrich_static" -> (streaming.StreamingSessions.enrichStatic _),
    "stream_cdc_upsert" -> (streaming.StatefulOps.cdcUpsert _),
    "stream_dedup_neardup" -> (streaming.StreamingDedup.nearDupPairs _),
    "stream_quantile_rollup" -> (streaming.StatefulOps.quantileRollup _),
    "stream_topk_rollup" -> (streaming.StatefulOps.topkRollup _),
    "stream_late_drop" -> (streaming.StreamingSessions.lateDrop _),
    "stream_sliding_window" -> (streaming.StreamingSessions.slidingCounts _),
    "stream_sim_topk" -> (streaming.StreamingSearch.simTopk _),
  )
  private lazy val streamingOracles: Map[String, String] = Map(
    // identical statement to the batch IVF read: micro-batch queries
    // served from the stored index must reproduce the batch answer
    // exactly (stateless serving — arrival batching cannot matter)
    "stream_sim_topk" -> ops.SimilarityOps.oracles("sim_ivf_quantized"),
    // identical statement to the batch CDC forms: streamed per-key
    // state + static base must reproduce the batch MERGE exactly
    "stream_cdc_upsert" -> ops.CdcOps.mergeOracle,
    // identical statement to the batch sliding rollup: streamed
    // overlapping-window state must reproduce the batch fan-out
    "stream_sliding_window" -> ops.EventOps.oracles("events_sliding_window"),
    // identical statement to the batch MinHash-LSH: cross-batch
    // band-bucket state + the shared verify tail must reproduce the
    // batch candidate set exactly (no bucket overflows at fixture
    // scale, so arrival order cannot matter — see StreamingDedup)
    "stream_dedup_neardup" -> ops.DedupOps.oracles("dedup_minhash_lsh"),
    // identical statement to the batch sketch rollup: streamed
    // per-month sketch state merged to quarters must satisfy the same
    // exact-percentile + rank-tolerance contract
    "stream_quantile_rollup" -> ops.OlapOps.oracles("agg_quantile_union"),
    // identical statement to the batch top-k rollup: the streamed MG
    // state is exact here (domain under capacity), so the counts must
    // hash-match the plain GROUP BY + row_number oracle
    "stream_topk_rollup" -> ops.OlapOps.oracles("agg_topk_union"),
    "stream_hourly_rollup" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the OTHER half of the streaming contract: the engineered
    // second-file arrivals (all pre-1996) land years past the
    // watermark and are DROPPED — batch replay with the same cutoff
    // predicate (see StreamingSessions.lateDrop)
    "stream_late_drop" ->
      """SELECT make_timestamp(CAST(floor(epoch(o_orderdate) / 2592000)
        |    AS BIGINT) * 2592000 * 1000000) AS bucket,
        |  COUNT(*) AS n_orders,
        |  CAST(CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
        |    AS BIGINT) AS DOUBLE) / 100.0 AS sum_price
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // new session iff strictly more than the 30-min gap since the
    // user's previous event — session_window's empirically-verified
    // tie rule (exact-gap extends); session identity = running sum of
    // session-start markers, the standard batch sessionizer
    "stream_sessionize" ->
      """WITH d AS (
        |  SELECT user_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts))
        |SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions,
        |  COUNT(*) AS n_events
        |FROM d GROUP BY user_id ORDER BY user_id""".stripMargin,
    "stream_stateful_totals" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // streaming dropDuplicates state = batch DISTINCT key set; which
    // physical row survives differs by arrival order, the COUNT cannot
    "stream_dedup_users" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // inner interval join emits eagerly, so the streamed pair set
    // equals the batch join over the same bounds
    "stream_join_attrib" ->
      """SELECT COUNT(*) AS n_pairs, COUNT(DISTINCT p.user_id) AS n_users,
        |  CAST(CAST(SUM(CAST(round(p.value * 100) AS BIGINT)) AS BIGINT)
        |    AS DOUBLE) / 100.0 AS sum_value
        |FROM events p JOIN events v ON v.user_id = p.user_id
        |  AND p.event_type = 'purchase' AND v.event_type = 'view'
        |  AND v.ts <= p.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
        |""".stripMargin,
    // stream-static left join is stateless: streamed views ⋈ the
    // batch-computed spend-tier dim = the same batch join
    "stream_enrich_static" ->
      """WITH dim AS (
        |  SELECT user_id,
        |    CASE WHEN SUM(CAST(round(value * 100) AS BIGINT)) >= 50000
        |           THEN 'high'
        |         WHEN SUM(CAST(round(value * 100) AS BIGINT)) >= 10000
        |           THEN 'mid'
        |         ELSE 'low' END AS tier
        |  FROM events WHERE event_type = 'purchase' GROUP BY user_id)
        |SELECT COALESCE(d.tier, 'none') AS tier, COUNT(*) AS n_views,
        |  COUNT(DISTINCT v.user_id) AS n_users
        |FROM events v LEFT JOIN dim d ON d.user_id = v.user_id
        |WHERE v.event_type = 'view'
        |GROUP BY 1 ORDER BY tier""".stripMargin,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.map(_._2).reduce(_ ++ _)

  /** Sum of per-module query counts — equals `queries.size` unless two
    * modules declare the same name (silent overwrite; tested). */
  def declaredQueryCount: Int = modules.map(_._2.size).sum

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.map(_._3()).reduce(_ ++ _)

  /** SCALED oracle overrides for the sf1 sweep + their aux signature
    * dumps — see [[ops.ScaledOracles]]. Not part of the driver
    * contract: Verify writes them to side files
    * (`oracle_sql_scaled.json`, `.aux/`) only under
    * `SPARK_GRAFT_SCALED_ORACLES=1`, and only `verify_local.py
    * --scaled` reads them. */
  def oracleSqlScaled: Map[String, String] = ops.ScaledOracles.oracles
  def scaledOracleAux: Map[String, (SparkSession, String) => DataFrame] =
    ops.ScaledOracles.aux
}
