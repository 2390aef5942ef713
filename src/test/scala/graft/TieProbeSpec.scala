package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the `session_window` gap-boundary tie rule the
  * `stream_sessionize` DuckDB oracle encodes: an event arriving
  * EXACTLY gap-after the previous one EXTENDS the session (merge on
  * `next.ts <= prev_end`), so a new session starts only when the gap
  * is STRICTLY exceeded — `ts - lag(ts) > gap` in the oracle SQL. If
  * a Spark upgrade ever flips this to an exclusive bound, this spec
  * turns red before the driver's hash compare does. */
class TieProbeSpec extends AnyFunSuite {
  val spark = TestSpark.spark
  import spark.implicits._

  private def nSessions(microsecs: Seq[Long]): Int =
    microsecs.map(us => (1L, us)).toDF("user_id", "us")
      .withColumn("ts", timestamp_micros(col("us")))
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .collect().length

  test("exact-gap event extends the session (inclusive merge bound)") {
    assert(nSessions(Seq(0L, 1800L * 1000000L)) === 1)
  }

  test("one microsecond past the gap starts a new session") {
    assert(nSessions(Seq(0L, 1800L * 1000000L + 1L)) === 2)
  }

  test("one microsecond inside the gap extends the session") {
    assert(nSessions(Seq(0L, 1800L * 1000000L - 1L)) === 1)
  }
}
