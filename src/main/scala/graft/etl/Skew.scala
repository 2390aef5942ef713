package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew and co-location techniques for 100 TB joins (SURVEY.md §1.4 /
  * the scale mandate): salting for hot keys, bucketing for
  * exchange-free repeat joins.
  *
  * AQE's skew-join splitting handles most runtime skew; explicit
  * salting remains the tool when one key dominates so heavily that a
  * single key exceeds an executor (AQE can split a partition, not a
  * key's hash bucket on the build side of a broadcast-less join).
  */
object Skew {

  /** Salted equi-join of a skewed `big` side against `small`:
    * big rows get a deterministic salt in [0, buckets); small rows are
    * replicated once per salt; the join key becomes (key, salt), so a
    * hot key spreads over `buckets` reducers. Result equals the plain
    * inner join.
    *
    * The salt is a content hash (xxhash64 over `saltCols`, defaulting
    * to every column), not `monotonically_increasing_id()`: a
    * speculative or retried map task re-reading the same rows
    * re-derives the same salts, so reducer-side inputs are identical
    * across attempts (hashing the join key alone would not work — a
    * hot key's rows would all land in one bucket, defeating the
    * salt). Two caveats of content routing, both by design:
    * BIT-IDENTICAL rows share a bucket — they are one logical group
    * under any content-deterministic scheme, so a hot key consisting
    * of mass-identical copies stays a straggler (exact-dedup it
    * first; that is the pipeline's own first step). And on wide rows
    * hashing every column costs a pass over the row — pass the few
    * high-entropy columns as `saltCols` instead. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int, saltCols: Seq[String] = Nil): DataFrame = {
    val hashed = (if (saltCols.nonEmpty) saltCols else big.columns.toSeq).map(col)
    val salted = big.withColumn("__salt",
      pmod(xxhash64(hashed: _*), lit(buckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Write a table bucketed+sorted by `key` into the session catalog:
    * two tables bucketed the same way then join exchange-free (the
    * persistent co-location the reference approximated with 51
    * pre-partitioned per-state tables). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
