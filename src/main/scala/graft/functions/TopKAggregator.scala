package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate. Ordering: higher score first, ties by
  * smaller id — matches the window/`row_number` formulation exactly
  * when scores are pre-rounded. */
case class Scored(score: Double, id: Long)

/** Bounded top-k as a typed `Aggregator` (SURVEY.md §2.8): each
  * partition keeps only its k best candidates and partials merge
  * k-vs-k, so a top-k-per-query search aggregates
  * O(k · partitions) rows instead of sorting every candidate score
  * through a window — at 100 TB candidate volume the window/sort
  * formulation shuffles everything, this shuffles k rows per group
  * per partition (a partial-aggregate, like sum).
  *
  * Use via `functions.udaf`: `udaf(new TopKAggregator(5))(col(score),
  * col(id))` in a plain `groupBy().agg(...)`.
  */
class TopKAggregator(k: Int)
  extends Aggregator[Scored, List[Scored], Seq[Scored]] {

  private def beats(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: List[Scored] = Nil

  override def reduce(buf: List[Scored], in: Scored): List[Scored] = {
    // NaN is incomparable to beats() (false BOTH ways), so without
    // this guard a NaN candidate would be spliced to the FRONT of a
    // full buffer by span() — at an arbitrary position, not a
    // defined rank. Note the engines' own ordering is the OPPOSITE
    // of dropping: Spark and DuckDB both sort NaN GREATER than every
    // double, so a window/row_number DESC formulation would rank a
    // NaN candidate FIRST (ADVICE r7). NaN scores are therefore out
    // of contract for this aggregator: the only producer is a
    // zero-norm embedding's cosine (0/0), which the fixtures exclude
    // and a caller must pre-filter — dropping here keeps the buffer
    // deterministic rather than emulating either engine's NaN rank.
    if (in.score.isNaN) buf
    else if (buf.sizeIs >= k && beats(buf.last, in)) buf
    else {
      val (front, back) = buf.span(beats(_, in))
      (front ::: in :: back).take(k)
    }
  }

  override def merge(a: List[Scored], b: List[Scored]): List[Scored] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[List[Scored]] =
    Encoders.kryo[List[Scored]]

  override def outputEncoder: Encoder[Seq[Scored]] =
    ExpressionEncoder[Seq[Scored]]()
}
