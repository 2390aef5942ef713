package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for oracle-deterministic arithmetic.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the same SQL. Double summation is order-dependent, and Spark and
  * DuckDB will not sum partitions in the same order — so every money/
  * measure aggregate goes through exact DECIMAL arithmetic and is cast
  * to DOUBLE only once, at the end. The testdata's doubles all carry
  * ≤2 decimal digits, so DECIMAL(18,2) is lossless for them.
  */
package object ops {
  val D18_2: DecimalType = DecimalType(18, 2)
  val D3_2: DecimalType = DecimalType(3, 2)

  /** Fan a frame out to at least the cluster's parallelism ahead of a
    * CPU-heavy projection (signature/rolling-hash/LSH banding). A
    * small local scan is often a single parquet row group = ONE task,
    * which serializes the expensive per-row expression onto one core;
    * scan-splitting configs can't help because the row group is the
    * parallelism floor. At scale the scan's natural partitioning
    * already exceeds core count and this is a no-op — no shuffle is
    * added on the 100-TB path. Results are partitioning-independent
    * (all downstream consumers aggregate or join deterministically).
    *
    * Call with SCAN-ROOTED frames only: reading `df.rdd` plans the
    * frame a second time (cheap for a scan), and a frame with an
    * upstream Exchange could eagerly run shuffle stages under AQE at
    * plan-construction time. Every current caller passes a projected
    * table scan. */
  def fanOut(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }

  /** Run `body` with the given session confs set, restoring each
    * previous value (or unsetting) after — the engine-credit scoping
    * idiom shared by every armed-feature query (CBO, AQE skew/
    * coalesce, runtime Bloom, aggregate pushdown, bucketed scan) and
    * their plan-test controls. Single-sourced so the restore
    * semantics (capture via getOption, unset when previously absent)
    * cannot drift between copies. */
  def withConfs[T](s: org.apache.spark.sql.SparkSession,
      settings: (String, String)*)(body: => T): T = {
    val prev = settings.map { case (k, _) => k -> s.conf.getOption(k) }
    settings.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** Exact sum of a 2-decimal double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(D18_2)).cast("double")

  /** Exact average: decimal sum cast to double, divided by count —
    * both engines perform the identical single IEEE division. */
  def davg(c: Column): Column = sum(c.cast(D18_2)).cast("double") / count(lit(1))

  /** `x * (1 - d)` in exact decimals (revenue term). */
  def discounted(price: Column, disc: Column): Column =
    price.cast(D18_2) * (lit(1).cast(D3_2) - disc.cast(D3_2))

  /** SQL fragments for the DuckDB oracle, mirroring the above. */
  object sql {
    def dsum(c: String): String =
      s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
    def davg(c: String): String =
      s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)"
    def discountedSum(price: String, disc: String): String =
      s"CAST(SUM(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($disc AS DECIMAL(3,2)))) AS DOUBLE)"
  }
}
