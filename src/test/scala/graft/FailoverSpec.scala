package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.pipeline.{FailoverJdbc, Retry}
import graft.queries.Scratch

/** Multi-host failover + retry-policy semantics (reference
  * etc/corrie.yml:16 alt_hosts, vendor/.../clickhouse/connect.go:41-64
  * open strategies, vendor/git.aqq.me/go/retrier/retrier.go:108-119
  * infinite transient retry).
  */
class FailoverSpec extends SparkSpec {

  private def derbyUrl(name: String, create: Boolean = true): String = {
    System.setProperty("derby.system.home", Scratch.path("derby_home"))
    new java.io.File(Scratch.path("derby_home")).mkdirs()
    s"jdbc:derby:${Scratch.path(name)}" + (if (create) ";create=true" else "")
  }

  test("in-order strategy falls through a dead primary to the first live alternate") {
    val dead = derbyUrl("derby_failover_missing", create = false)
    val alive = derbyUrl("derby_failover_alt")
    val conn = FailoverJdbc.connect(Seq(dead, alive))
    try assert(conn.isValid(5)) finally conn.close()
  }

  test("every host dead surfaces the last connect error") {
    val d1 = derbyUrl("derby_failover_m1", create = false)
    val d2 = derbyUrl("derby_failover_m2", create = false)
    intercept[java.sql.SQLException] { FailoverJdbc.connect(Seq(d1, d2)) }
  }

  test("rotate strategy spreads consecutive connects across live hosts (connOpenRandom)") {
    val a = derbyUrl("derby_failover_rot_a")
    val b = derbyUrl("derby_failover_rot_b")
    val seen = (1 to 4).map { _ =>
      val conn = FailoverJdbc.connect(Seq(a, b), FailoverJdbc.Rotate)
      try conn.getMetaData.getURL finally conn.close()
    }.toSet
    assert(seen.size == 2, s"4 rotated connects must touch both hosts, saw $seen")
  }

  test("unbounded retry policy retries past the bounded default (retrier.go:108-119)") {
    val calls = new AtomicInteger(0)
    // fails 8 times — strictly more than the bounded default of 5 —
    // then succeeds; unbounded must ride through all of them
    val got = Retry.withBackoff(attempts = Retry.Unbounded, baseMillis = 1L,
      jitter = identity) {
      if (calls.incrementAndGet() <= 8) sys.error("transient")
      "done"
    }
    assert(got == "done")
    assert(calls.get() == 9)

    // the bounded default still gives up at its cap
    val bounded = new AtomicInteger(0)
    intercept[RuntimeException] {
      Retry.withBackoff(baseMillis = 1L, jitter = identity) {
        bounded.incrementAndGet(); sys.error("always")
      }
    }
    assert(bounded.get() == 5)
  }
}
