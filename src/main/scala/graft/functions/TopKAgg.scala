package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Custom typed UDAF (SURVEY.md §2C): bounded top-k accumulator.
  *
  * Keeps the k largest (score, id) pairs per group — the
  * partial-aggregation answer to "top-k per group" that never
  * materializes the whole group (a window + row_number sorts every row
  * in the partition; this buffer holds at most k entries per map-side
  * partial, and merge is an O(k log k) merge of two capped lists).
  * That is the shape that survives 100 TB: map-side partials shrink
  * each partition to k rows before the shuffle.
  *
  * Ordering is (score DESC, id ASC) with the unique id as tiebreak, so
  * the result is deterministic and oracle-comparable. Output is the
  * ids serialized comma-joined (the driver's comparator needs scalar
  * cells).
  */
case class TopKIn(score: Long, id: Long)

object TopKAgg {
  /** Build a k-bounded aggregator; k is fixed at plan time. */
  def apply(k: Int): Aggregator[TopKIn, Seq[TopKIn], String] =
    new Aggregator[TopKIn, Seq[TopKIn], String] {
      private def lt(a: TopKIn, b: TopKIn): Boolean =
        a.score > b.score || (a.score == b.score && a.id < b.id)
      // buffers stay sorted by (score desc, id asc) and capped at k
      override def zero: Seq[TopKIn] = Vector.empty
      override def reduce(b: Seq[TopKIn], in: TopKIn): Seq[TopKIn] =
        if (b.lengthCompare(k) >= 0 && lt(b.last, in)) b
        else (b :+ in).sortWith(lt).take(k)
      override def merge(a: Seq[TopKIn], b: Seq[TopKIn]): Seq[TopKIn] =
        (a ++ b).sortWith(lt).take(k)
      override def finish(r: Seq[TopKIn]): String =
        r.map(_.id).mkString(",")
      override def bufferEncoder: Encoder[Seq[TopKIn]] =
        ExpressionEncoder[Seq[TopKIn]]()
      override def outputEncoder: Encoder[String] = Encoders.STRING
    }
}
