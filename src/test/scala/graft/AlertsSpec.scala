package graft

import graft.etl.{AlertListener, AlertSink, Alerts, Manifest, Quality}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S12 alert transport: listener-delivered reconciliation alerts and
  * failure notifications, no network anywhere. */
class AlertsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def await(cond: => Boolean, ms: Long = 15000): Boolean = {
    val deadline = System.currentTimeMillis() + ms
    while (!cond && System.currentTimeMillis() < deadline) Thread.sleep(50)
    cond
  }

  test("AlertListener delivers count-mismatch alerts to the sink") {
    val sink = new AlertSink.Collecting
    val listener = new AlertListener(sink)
    spark.listenerManager.register(listener)
    try {
      // injected mismatch: manifest expects 500 lines for WY, the
      // "loaded" data has 2 rows, tolerance 10 ⇒ unreconciled
      val raw = Seq(("WY", "01--WY--f.tab"), ("WY", "01--WY--f.tab"))
        .toDF("state", "source_file")
      var manifest = Manifest.empty(spark)
      manifest = Manifest.register(manifest, "01--WY--f.tab", "WY", 500)
      val report = Alerts.observed(
        Quality.loadReport(raw, raw, manifest, tolerance = 10))
      // the direct contract: messages computed from the report
      val direct = Quality.alerts(report)
      assert(direct === Seq("Error: state WY loaded 2 rows, expected 500"))
      // the listener path: the collect above already ran an action
      // over the observed frame; delivery is async via the bus
      assert(await(sink.messages.nonEmpty), "listener never delivered")
      assert(sink.messages.contains("Error: state WY loaded 2 rows, expected 500"))
    } finally spark.listenerManager.unregister(listener)
  }

  test("AlertListener reports hard query failures") {
    val sink = new AlertSink.Collecting
    val listener = new AlertListener(sink)
    spark.listenerManager.register(listener)
    try {
      intercept[Exception] {
        // ANSI division by zero fails the action
        spark.range(1).select(expr("1/0").as("boom")).collect()
      }
      assert(await(sink.messages.exists(_.contains("failed"))),
        s"no failure alert: ${sink.messages}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("reconciled loads produce no alerts through the listener") {
    val sink = new AlertSink.Collecting
    val listener = new AlertListener(sink)
    spark.listenerManager.register(listener)
    try {
      val raw = Seq(("WY", "01--WY--f.tab"), ("WY", "01--WY--f.tab"))
        .toDF("state", "source_file")
      var manifest = Manifest.empty(spark)
      manifest = Manifest.register(manifest, "01--WY--f.tab", "WY", 2)
      val report = Alerts.observed(
        Quality.loadReport(raw, raw, manifest, tolerance = 10))
      assert(Quality.alerts(report).isEmpty)
      // give the bus a moment: no alert should arrive
      Thread.sleep(500)
      assert(sink.messages.isEmpty, sink.messages)
    } finally spark.listenerManager.unregister(listener)
  }
}
