package graft

import org.apache.spark.sql.functions._
import graft.functions.{TopKAgg, TopKIn}

/** Unit spec for the bounded top-k Aggregator (SURVEY §2C). */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("TopKAgg: caps at k, orders score desc with id tiebreak") {
    val topk = udaf(TopKAgg(3))
    val df = Seq(
      ("a", 10L, 1L), ("a", 30L, 2L), ("a", 20L, 3L),
      ("a", 30L, 4L), ("a", 5L, 5L),
      ("b", 1L, 9L))
      .toDF("g", "score", "id")
    val got = df.groupBy($"g").agg(topk($"score", $"id").as("top"))
      .as[(String, String)].collect().toMap
    // score 30 ties: id 2 before 4; then 20 (id 3); 10 and 5 cut
    assert(got("a") == "2,4,3")
    assert(got("b") == "9")
  }

  test("TopKAgg: reduce/merge agree with a full sort (property)") {
    val rnd = new scala.util.Random(42)
    val ins = Seq.fill(200)(TopKIn(rnd.nextInt(20).toLong, rnd.nextLong().abs))
    val agg = TopKAgg(5)
    // fold through reduce in arbitrary chunk splits, merge the partials
    val (l, r) = ins.splitAt(73)
    val merged = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce),
      r.foldLeft(agg.zero)(agg.reduce))
    val expect = ins.sortBy(i => (-i.score, i.id)).take(5)
    assert(agg.finish(merged) == expect.map(_.id).mkString(","))
  }
}
