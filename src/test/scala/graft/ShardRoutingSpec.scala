package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Messages
import graft.queries.Scratch

/** Producer shard-routing semantics (reference vendor/git.aqq.me/go/
  * nanachi/producer.go:143-164): an explicit x-shard pin publishes to
  * exactly that shard, an out-of-range pin clamps to maxShard, and
  * unpinned messages scatter across shards.
  */
class ShardRoutingSpec extends SparkSpec {
  import spark.implicits._

  private val maxShard = 3 // shards 0..3, ≙ dst.MaxShard

  private def shardDirs(out: String): Map[Int, Set[String]] = {
    val base = new java.io.File(out)
    base.listFiles().filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map { d =>
        val id = d.getName.stripPrefix("shard=").toInt
        id -> spark.read.text(d.getAbsolutePath).as[String].collect().toSet
      }.toMap
  }

  test("pinned messages land in exactly their pinned shard") {
    val out = Scratch.fresh("shard_pinned")
    val msgs = Seq(("m0", 2), ("m1", 2), ("m2", 0), ("m3", 1))
      .toDF("body", "xshard")
    Messages.publishSharded(msgs, out, maxShard, Some(col("xshard")))

    val dirs = shardDirs(out)
    assert(dirs(2) == Set("m0", "m1"))
    assert(dirs(0) == Set("m2"))
    assert(dirs(1) == Set("m3"))
    assert(!dirs.contains(3)) // nothing scattered into the unpinned shard
  }

  test("an out-of-range pin clamps to maxShard (producer.go:153-156)") {
    val out = Scratch.fresh("shard_clamped")
    val msgs = Seq(("over", 99), ("neg", -5)).toDF("body", "xshard")
    Messages.publishSharded(msgs, out, maxShard, Some(col("xshard")))

    val dirs = shardDirs(out)
    assert(dirs(maxShard) == Set("over"))
    assert(dirs(0) == Set("neg"))
  }

  test("unpinned messages scatter over shards; a null pin falls back to scatter") {
    val out = Scratch.fresh("shard_scatter")
    val msgs = (0 until 200).map(i => s"msg_$i").toDF("body")
    Messages.publishSharded(msgs, out, maxShard)

    val dirs = shardDirs(out)
    assert(dirs.keySet.subsetOf((0 to maxShard).toSet))
    assert(dirs.size > 1, "200 hashed messages must hit more than one shard")
    assert(dirs.values.map(_.size).sum == 200)

    // mixed pinned/null: nulls take the deterministic scatter shard
    val out2 = Scratch.fresh("shard_mixed")
    val mixed = Seq(("pinned", Some(1)), ("floating", None))
      .toDF("body", "xshard")
    Messages.publishSharded(mixed, out2, maxShard, Some(col("xshard")))
    val dirs2 = shardDirs(out2)
    assert(dirs2(1).contains("pinned"))
    assert(dirs2.values.flatten.toSet == Set("pinned", "floating"))
  }

  test("publish is one dynamic-partition write: replay lands identically") {
    val out = Scratch.fresh("shard_replay_a")
    val out2 = Scratch.fresh("shard_replay_b")
    val msgs = (0 until 50).map(i => s"replay_$i").toDF("body")
    Messages.publishSharded(msgs, out, maxShard)
    Messages.publishSharded(msgs, out2, maxShard)
    assert(shardDirs(out) == shardDirs(out2))
  }
}
