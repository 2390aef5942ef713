package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Pluggable alert transport (SURVEY.md §2.1 S12). The reference posts
  * to Slack on load failure and count mismatch (utils.ts:99-133,
  * load.ts:244-254); the engine analog is a sink interface — real
  * deployments hand in a webhook/pager implementation, tests a
  * collecting one, and nothing in the engine ever talks to a network
  * itself. */
trait AlertSink {
  def send(message: String): Unit
}

object AlertSink {

  /** Default transport: stderr (the ops-console analog). */
  object Stderr extends AlertSink {
    override def send(message: String): Unit = System.err.println(message)
  }

  /** In-memory sink for tests and inspection. */
  class Collecting extends AlertSink {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    override def send(message: String): Unit = synchronized { buf += message }
    def messages: Seq[String] = synchronized { buf.toSeq }
  }
}

object Alerts {

  /** Observed-metric name [[AlertListener]] watches. */
  val metric = "graft_load_quality"

  /** Attach the reconciliation observation to a load report: whatever
    * action first runs over the returned frame (the publish count, the
    * report collect, ...) publishes the alert messages as an observed
    * metric as a free by-product of that action — no extra pass over
    * the data — and every registered [[AlertListener]] delivers them
    * to its sink. */
  def observed(report: DataFrame): DataFrame =
    report.observe(metric,
      sort_array(collect_list(when(!col("reconciled"),
        concat(lit("Error: state "), col("state"),
          lit(" loaded "), col("rows_loaded"),
          lit(" rows, expected "), col("expected_lines"))))).as("alerts"))
}

/** S12 transport hook: a `QueryExecutionListener` that forwards
  * reconciliation alerts (published via [[Alerts.observed]]) and hard
  * query failures to a pluggable [[AlertSink]]. Register once per
  * session: `spark.listenerManager.register(new AlertListener(sink))`.
  * Delivery is asynchronous (Spark's listener bus), mirroring the
  * reference's fire-and-forget Slack post. */
class AlertListener(sink: AlertSink) extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution,
      durationNs: Long): Unit =
    qe.observedMetrics.get(Alerts.metric).foreach { row =>
      row.getSeq[String](row.fieldIndex("alerts")).foreach(sink.send)
    }

  override def onFailure(funcName: String, qe: QueryExecution,
      exception: Exception): Unit =
    sink.send(s"Error: query '$funcName' failed: ${exception.getMessage}")
}
