package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator: exact top-k most frequent values with
  * deterministic tie-breaking (count desc, value asc).
  *
  * The Aggregator[IN, BUF, OUT] surface from SURVEY.md §7.3 — partial
  * maps merge associatively on the executors (map-side combine), only
  * k rows leave the final merge. Exact (full map buffer) because the
  * intended domains are bounded (word vocabularies, categorical
  * columns); for unbounded domains swap the buffer for a SpaceSaving
  * sketch — the Aggregator contract stays identical.
  */
case class WordCount(value: String, n: Long)

class TopKWords(k: Int) extends Aggregator[String, Map[String, Long], Seq[WordCount]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    b.updated(v, b.getOrElse(v, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (acc, (w, n)) => acc.updated(w, acc.getOrElse(w, 0L) + n) }

  override def finish(m: Map[String, Long]): Seq[WordCount] =
    m.toSeq.sortBy { case (w, n) => (-n, w) }.take(k)
      .map { case (w, n) => WordCount(w, n) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Seq[WordCount]] =
    ExpressionEncoder[Seq[WordCount]]()
}
