package graft.ops

import graft.{ArtifactStore, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Change-data-capture apply — the MERGE INTO / upsert half of the
  * lakehouse story that [[LayoutOps]]'s SCD2 history is the other half
  * of. SCD2 KEEPS every version queryable; CDC apply PRODUCES the
  * current snapshot from a base table plus a change stream of
  * upserts and deletes. The reference's monthly load does the
  * whole-table special case of this — each VM2Uniform drop REPLACEs a
  * state's table (`load.ts:76-84`, `copy.ts`: truncate-and-swap); CDC
  * apply is the general row-level form the same pipeline needs the
  * day the vendor ships daily deltas instead of monthly full drops.
  *
  * The change batch is derived DETERMINISTICALLY from `orders` so the
  * DuckDB oracle can replay it: every order is a change record against
  * its customer's balance, ordered by (o_orderdate, o_orderkey);
  * `o_orderkey % 7 == 0` marks a DELETE, and `o_orderkey % 13 == 0`
  * redirects the record to a key OUTSIDE the base snapshot
  * (`o_custkey + 1e7`) so the not-matched INSERT branch is exercised,
  * not just claimed. Latest change per key wins (upsert semantics);
  * a winning DELETE removes the row whether or not it existed.
  *
  * Two graded implementations of the SAME semantics (same oracle —
  * storage strategy must be invisible to results):
  *
  *  - `cdc_read_mor` — MERGE-ON-READ: base ∪ changes, one window
  *    ranked by (priority, change-time, seq), keep rank-1 non-deletes.
  *    ONE hash exchange on the key, no join at all: inserts, updates
  *    and deletes all resolve in the same rank pass. This is the shape
  *    Iceberg/Delta/Hudi MOR readers execute, and the 100 TB-friendly
  *    one: the snapshot side never rewrites, and with the base stored
  *    bucketed by key (Skew.writeBucketed) even its exchange
  *    disappears — only the (small) delta shuffles.
  *  - `cdc_merge_apply` — COPY-ON-WRITE compaction: the identical
  *    merge materialized once per corpus snapshot through the
  *    content-addressed [[ArtifactStore]] and served as a plain scan
  *    thereafter — what table maintenance does when read amplification
  *    starts to dominate write cost.
  *
  * The full-outer-join formulation (how MERGE INTO is usually drawn on
  * a whiteboard) is implemented too ([[applyByJoin]]) but only as the
  * spec's independent witness: Spark cannot broadcast a full outer
  * join, so at scale it costs the same shuffle as the union form while
  * needing a second one for the change-side pre-dedup window.
  */
object CdcOps {

  /** Insert-branch keys live 1e7 above the base key space (the base
    * fixture's custkeys are dense small ints at every SF). */
  private val InsertOffset = 10000000L

  /** Column-level change derivation, shared verbatim by the batch
    * reader and the streaming twin (`StatefulOps.cdcUpsert`) so the
    * two paths cannot drift. Input must carry `o_orderkey`,
    * `o_custkey`, `o_totalprice` and `chg_micros` (epoch micros of
    * the order date — a plain long so the streaming state can hold it
    * without timestamp-encoding concerns). `seq` (= o_orderkey,
    * unique) breaks same-instant ties. */
  def deriveChanges(df: DataFrame): DataFrame =
    df.select(
      when(col("o_orderkey") % 13 === 0, col("o_custkey") + InsertOffset)
        .otherwise(col("o_custkey")).as("c_custkey"),
      when(col("o_orderkey") % 7 === 0, lit("D")).otherwise(lit("U")).as("op"),
      col("o_totalprice").as("acctbal"),
      lit(1).as("pri"),
      col("chg_micros"),
      col("o_orderkey").as("seq"))

  /** The deterministic change stream derived from the batch orders
    * read. (NTZ→LTZ cast before `unix_micros` is identity under the
    * engine-wide UTC session tz every entry point sets.) */
  def changeBatch(s: SparkSession, d: String): DataFrame =
    deriveChanges(Tables.orders(s, d).withColumn("chg_micros",
      unix_micros(col("o_orderdate").cast("timestamp"))))

  /** Base snapshot lifted into the change-record shape at priority 0:
    * any real change outranks it in the merge window. */
  private def baseRecords(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      lit("U").as("op"),
      col("c_acctbal").as("acctbal"),
      lit(0).as("pri"),
      lit(0L).as("chg_micros"),
      lit(0L).as("seq"))

  /** The merge itself: rank every record for a key, keep the winner
    * unless it is a delete. Balances pass through untouched (no float
    * summation → bit-exact vs the oracle by construction).
    * `cutMicros`, when set, truncates the change LOG at that
    * position — the log is totally ordered by (chg_micros, seq), so a
    * micros bound is a log prefix and the merge of the prefix IS the
    * as-of-version snapshot. */
  private def mergedSnapshot(s: SparkSession, d: String,
      cutMicros: Option[Long] = None): DataFrame = {
    val w = Window.partitionBy(col("c_custkey"))
      .orderBy(col("pri").desc, col("chg_micros").desc, col("seq").desc)
    val changes = cutMicros.foldLeft(changeBatch(s, d))(
      (c, cut) => c.filter(col("chg_micros") < cut))
    baseRecords(s, d).unionByName(changes)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") === "U")
      .select(col("c_custkey"), col("acctbal"),
        when(col("pri") === 1, lit("cdc")).otherwise(lit("base")).as("origin"))
  }

  /** Merge-on-read: the snapshot computed at query time. */
  def readMergeOnRead(s: SparkSession, d: String): DataFrame =
    mergedSnapshot(s, d).orderBy(col("c_custkey"))

  /** Epoch micros of 1997-01-01T00:00:00 — the graded version cut
    * (mid-corpus at every SF: orders span 1992–1998). */
  private[graft] val VersionCutMicros = 852076800000000L

  /** TIME-TRAVEL read (VERDICT r8 #6): the snapshot AS OF a log
    * version — the read every CDC consumer eventually asks for
    * ("what did the table look like before yesterday's batch?").
    * A version here is a position in the totally-ordered change log
    * ((chg_micros, seq), unique by construction); reading as-of =
    * merging exactly the log prefix up to the cut over the unchanged
    * base snapshot, which is how MoR table formats implement time
    * travel: keep the log, re-merge any prefix on demand — no
    * history copies, no snapshot-per-version storage. The oracle
    * replays the identical prefix cut sequentially. Scale: the cut
    * predicate pushes into the log scan (at 100 TB the log is
    * time-partitioned, so old versions read fewer partitions, not
    * more), and the merge is the same single-exchange rank window as
    * `cdc_read_mor`. */
  def readVersion(s: SparkSession, d: String): DataFrame =
    mergedSnapshot(s, d, Some(VersionCutMicros)).orderBy(col("c_custkey"))

  /** Copy-on-write: the same snapshot compacted once per corpus
    * snapshot (fingerprint covers the whole sf dir — the build reads
    * both orders and customer) and served as a scan. */
  def mergeApply(s: SparkSession, d: String): DataFrame =
    ArtifactStore.parquet(s, "cdc_compacted_customer", d, version = 1) {
      mergedSnapshot(s, d)
    }.orderBy(col("c_custkey"))

  /** The textbook MERGE-as-full-outer-join formulation — the spec's
    * independent witness that the union-window merge is MERGE. Not
    * graded (same semantics, strictly worse plan: full outer joins
    * cannot broadcast, and the change side needs its own dedup window
    * first). */
  def applyByJoin(s: SparkSession, d: String): DataFrame = {
    val wLatest = Window.partitionBy(col("c_custkey"))
      .orderBy(col("chg_micros").desc, col("seq").desc)
    val latest = changeBatch(s, d)
      .withColumn("rn", row_number().over(wLatest))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("op").as("d_op"),
        col("acctbal").as("d_bal"))
    mergeLatestWithBase(
      Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
      latest)
  }

  /** Winner-unless-delete application of a latest-change-per-key
    * frame `(c_custkey, d_op, d_bal)` onto the base snapshot — ONE
    * definition of the merge rule, shared by the full-outer witness
    * above and the streaming twin's batch tail
    * (`StatefulOps.cdcUpsert`), so the two graded paths cannot
    * drift. */
  def mergeLatestWithBase(base: DataFrame, latest: DataFrame): DataFrame =
    base.join(latest, Seq("c_custkey"), "full_outer")
      .filter(coalesce(col("d_op"), lit("U")) === "U")
      .select(col("c_custkey"),
        coalesce(col("d_bal"), col("c_acctbal")).as("acctbal"),
        when(col("d_op").isNotNull, lit("cdc")).otherwise(lit("base"))
          .as("origin"))

  // ---------------------------------------------------------------- registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_read_mor" -> readMergeOnRead,
    "cdc_merge_apply" -> mergeApply,
    "cdc_read_version" -> readVersion,
  )

  // Both implementations grade against the one statement of the MERGE
  // semantics: replay the derived change stream over the base snapshot,
  // latest-per-key wins, winners that are deletes vanish.
  // public: the streaming twin (`stream_cdc_upsert`) grades against
  // the same statement — streamed state + static base must equal the
  // batch MERGE exactly
  val mergeOracle: String =
    s"""WITH chg AS (
       |  SELECT CASE WHEN o_orderkey % 13 = 0
       |              THEN o_custkey + $InsertOffset
       |              ELSE o_custkey END AS c_custkey,
       |    CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
       |    o_totalprice AS acctbal,
       |    1 AS pri, o_orderdate AS chg_ts, o_orderkey AS seq
       |  FROM orders),
       |allrec AS (
       |  SELECT c_custkey, 'U' AS op, c_acctbal AS acctbal,
       |    0 AS pri, TIMESTAMP '1970-01-01' AS chg_ts, 0 AS seq
       |  FROM customer
       |  UNION ALL SELECT * FROM chg),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
       |    ORDER BY pri DESC, chg_ts DESC, seq DESC) AS rn
       |  FROM allrec)
       |SELECT c_custkey, acctbal,
       |  CASE WHEN pri = 1 THEN 'cdc' ELSE 'base' END AS origin
       |FROM ranked WHERE rn = 1 AND op = 'U'
       |ORDER BY c_custkey""".stripMargin

  // the as-of oracle is the SAME merge statement over the log prefix:
  // sequential replay cut at the version boundary
  val oracles: Map[String, String] = Map(
    "cdc_read_mor" -> mergeOracle,
    "cdc_merge_apply" -> mergeOracle,
    "cdc_read_version" -> mergeOracle.replace(
      "  FROM orders)",
      "  FROM orders\n  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00')"),
  )
}
