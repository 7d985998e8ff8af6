package graft.plans

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed top-k aggregator: keeps the k highest-scoring (id, score)
  * pairs per group in a bounded min-heap.
  *
  * This is the scale path for similarity top-k: the window-function
  * formulation (`row_number() over (partition by query)`) must
  * shuffle and sort EVERY candidate row; this aggregator reduces each
  * map-side partition to ≤ k entries per group before the shuffle
  * (partial aggregation), so the exchange moves O(groups × k) rows
  * regardless of corpus size.
  *
  * Ties are broken by ascending id — deterministic and identical to
  * the window formulation's ORDER BY score DESC, id ASC.
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Long, Double), List[(Long, Double)], Seq[(Long, Double)]] {

  private val ord: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)] { case (id, s) => (-s, id) }

  override def zero: List[(Long, Double)] = Nil

  // sorted insert into a ≤k list — k is small, so linear insert beats
  // heap constant factors and keeps the buffer a plain encodable List
  private def insert(buf: List[(Long, Double)], x: (Long, Double)): List[(Long, Double)] = {
    val merged = (x :: buf).sorted(ord)
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[(Long, Double)], in: (Long, Double)): List[(Long, Double)] =
    insert(buf, in)

  override def merge(a: List[(Long, Double)], b: List[(Long, Double)]): List[(Long, Double)] = {
    val merged = (a ++ b).sorted(ord)
    if (merged.length > k) merged.take(k) else merged
  }

  override def finish(buf: List[(Long, Double)]): Seq[(Long, Double)] = buf.sorted(ord)

  override def bufferEncoder: Encoder[List[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(Long, Double)]]()

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
