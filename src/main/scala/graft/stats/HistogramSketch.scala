package graft.stats

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Fixed-width histogram sketch as a typed Aggregator (SURVEY §7.3 — the
  * single custom Catalyst aggregate). Buffers are plain Array[Long]:
  * bounded memory per partition, associatively merged map-side before the
  * shuffle — the Dataset-native form of the treeAggregate in
  * BASELINE.json:6. Out-of-range values clamp to the edge buckets; nulls
  * are skipped.
  */
final class HistogramAgg(numBuckets: Int, bucketWidth: Long)
    extends Aggregator[java.lang.Long, Array[Long], Array[Long]] {

  def zero: Array[Long] = new Array[Long](numBuckets)

  def reduce(b: Array[Long], v: java.lang.Long): Array[Long] = {
    if (v != null) {
      val raw = v.longValue() / bucketWidth
      val idx = math.min(math.max(raw, 0L), (numBuckets - 1).toLong).toInt
      b(idx) += 1L
    }
    b
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numBuckets) { a(i) += b(i); i += 1 }
    a
  }

  def finish(r: Array[Long]): Array[Long] = r

  def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object HistogramSketch {
  /** Column form: histogram(col) → array<bigint> of bucket counts. */
  def histogram(numBuckets: Int, bucketWidth: Long): Column => Column = {
    val fn = udaf(new HistogramAgg(numBuckets, bucketWidth))
    (c: Column) => fn(c)
  }
}
