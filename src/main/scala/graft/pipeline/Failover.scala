package graft.pipeline

import java.sql.{Connection, DriverManager, SQLException}
import java.util.concurrent.atomic.AtomicInteger

/** Multi-host JDBC failover (reference etc/corrie.yml:16 `alt_hosts` +
  * vendor/github.com/kshvakov/clickhouse/connect.go:41-64): a sink is
  * a LIST of equivalent endpoints, and opening a connection walks the
  * list until one dials, under one of two open strategies — `InOrder`
  * (always start at the primary) or `Rotate` (start at a
  * connection-counter-rotated offset, the reference's `connOpenRandom`
  * ident tick, so concurrent partitions spread across replicas).
  *
  * Failure of every host surfaces the LAST error — the caller's retry
  * policy ([[Retry.withBackoff]], unbounded option) then re-walks the
  * list, matching the reference's connect-retry layering.
  */
object FailoverJdbc extends Serializable {

  sealed trait Strategy extends Serializable
  /** connect.go `connOpenInOrder`: primary first, alts only on failure. */
  case object InOrder extends Strategy
  /** connect.go `connOpenRandom`: per-connect rotated starting host
    * (deterministic tick, not rand — same spread, replayable). */
  case object Rotate extends Strategy

  private val tick = new AtomicInteger(0)

  def connect(urls: Seq[String], strategy: Strategy = InOrder): Connection = {
    require(urls.nonEmpty, "failover url list must not be empty")
    val start = strategy match {
      case InOrder => 0
      case Rotate  => math.abs(tick.incrementAndGet() % urls.size)
    }
    var last: SQLException = null
    var i = 0
    while (i < urls.size) {
      val url = urls((start + i) % urls.size)
      try return DriverManager.getConnection(url)
      catch { case e: SQLException => last = e }
      i += 1
    }
    throw last
  }
}
