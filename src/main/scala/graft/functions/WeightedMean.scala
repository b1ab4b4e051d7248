package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed UDAF (SURVEY.md §2C): quantity-weighted mean price.
  *
  * Inputs arrive pre-scaled to exact unscaled longs (price in cents ×
  * qty in hundredths), so the buffer is pure integer arithmetic —
  * deterministic under any partition/merge order, which a naive
  * double-accumulating UDAF is not. reduce/merge are associative and
  * commutative; Spark applies it as partial aggregation (map-side
  * combine) + final merge, the same two-phase shape as built-in aggs.
  */
case class WmBuf(sumPQ: Long, sumQ: Long)

object WeightedMean extends Aggregator[WmIn, WmBuf, Double] {
  override def zero: WmBuf = WmBuf(0L, 0L)
  override def reduce(b: WmBuf, in: WmIn): WmBuf =
    WmBuf(b.sumPQ + in.pq, b.sumQ + in.q)
  override def merge(a: WmBuf, b: WmBuf): WmBuf =
    WmBuf(a.sumPQ + b.sumPQ, a.sumQ + b.sumQ)
  /** (sumPQ / 10^4) / (sumQ / 10^2) with each conversion correctly
    * rounded — matches CAST(SUM(DECIMAL) AS DOUBLE)/CAST(...) in the
    * oracle while unscaled sums stay below 2^53. */
  override def finish(b: WmBuf): Double =
    if (b.sumQ == 0L) Double.NaN
    else (b.sumPQ.toDouble / 1e4) / (b.sumQ.toDouble / 1e2)
  override def bufferEncoder: Encoder[WmBuf] = Encoders.product[WmBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

case class WmIn(pq: Long, q: Long)
