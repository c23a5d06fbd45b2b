package graft.sim

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator for similarity ranking: keeps at most k
  * (score, neighbor) pairs ordered by (score desc, neighbor asc) — the same
  * total order as the row_number window it replaces, so results are
  * bit-identical.
  *
  * Scale shape (why not a window): `row_number().over(partitionBy(qid))`
  * shuffles EVERY scored row into #queries reducer partitions — with few
  * queries that is a full re-shuffle of |corpus|×|queries| rows into a
  * handful of hot reducers. As an Aggregator the map side reduces each
  * partition to ≤k rows per query before the exchange, so the shuffle
  * carries ≤ #partitions × #queries × k tiny buffers and no reducer is ever
  * hot. Buffers live as plain objects in ObjectHashAggregate; the kryo
  * encoder is hit only at the exchange.
  */
final class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[Long]] {

  require(k > 0, "k must be positive")

  // score desc, neighbor asc
  @inline private def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(b: List[(Double, Long)], x: (Double, Long)): List[(Double, Long)] =
    // b is sorted by `lt`, bounded at k — O(k) per row with tiny k
    if (b.sizeIs >= k && !lt(x, b.last)) b
    else {
      val (pre, post) = b.span(e => lt(e, x))
      (pre ::: x :: post).take(k)
    }

  override def zero: List[(Double, Long)] = Nil

  override def reduce(b: List[(Double, Long)], a: (Double, Long)): List[(Double, Long)] =
    insert(b, a)

  override def merge(b1: List[(Double, Long)], b2: List[(Double, Long)]): List[(Double, Long)] =
    b2.foldLeft(b1)(insert)

  /** Neighbors in rank order (rank = position + 1). */
  override def finish(r: List[(Double, Long)]): Seq[Long] = r.map(_._2)

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
