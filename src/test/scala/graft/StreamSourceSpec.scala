package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression for the sf1-probe find (round 10): a streaming source
  * built as `.parquet(sfDir)` + `pathGlobFilter "<table>.parquet"`
  * reads the fixtures' single-FILE layout but silently matches ZERO
  * files when the table is a DIRECTORY of part files — the production
  * layout. [[graft.streaming.StreamSource]] dispatches on the actual
  * layout; this spec pins the directory half (the single-file half is
  * exercised by every streaming twin in the oracle gate). */
class StreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("directory-layout tables stream their FULL contents") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dirlayout")
    try {
      val events = Tables.events(spark, "/root/testdata/sf0.001")
      // directory-of-part-files layout, several files so a partial
      // listing (e.g. one lucky glob match) cannot fake a full read
      events.repartition(4).write.parquet(s"$tmp/events.parquet")
      val streamed = graft.streaming.StatefulOps.userTotals(spark, tmp.toString)
      val total = streamed.agg(sum(col("n_events"))).head().getLong(0)
      assert(total === events.count(),
        "streamed event total must equal the batch row count — a " +
          "shortfall means the source listed only part of the table")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
      }
      rm(tmp.toFile)
    }
  }
}
