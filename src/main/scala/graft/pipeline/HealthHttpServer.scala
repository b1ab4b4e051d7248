package graft.pipeline

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Opt-in LITERAL HTTP probe surface — the reference serves
  * `/healthcheck` and `/status` over a real socket (main.go:31-44 via
  * the vendored kak-tus/healthcheck listener,
  * vendor/github.com/kak-tus/healthcheck/healthcheck.go:88-105).
  * [[Health]] re-expresses the probes as engine functions + a
  * queryable status table (the Spark-idiomatic surface); this wrapper
  * closes the literal contract for deployments that want a liveness
  * URL: bind, GET, `ok`/`nok` body.
  *
  * Status-code mapping follows the vendored lib's DECLARED map
  * (healthcheck.go:36-40: passing→200, warning→429, critical→500;
  * its literal code indexes the map off by one so a warning also
  * answers 200 in the reference binary — we implement the intent).
  * The probe callbacks run on the server's executor per request;
  * reader/writer concurrency lives inside [[Health.status]] exactly
  * like the reference's two goroutines (main.go:46-63).
  *
  * JDK-only (`com.sun.net.httpserver` ships with the JRE) — no new
  * dependency, honoring the offline build.
  */
final class HealthHttpServer(
    healthcheckProbe: () => (Health.State, String),
    statusProbe: () => (Health.State, String),
    listenPort: Int = 0) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", listenPort), 0)

  private def handler(f: () => (Health.State, String)): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        // a probe that throws is a failing probe, never a dead listener
        val (state, text) =
          try f()
          catch { case scala.util.control.NonFatal(_) => (Health.Warning, "nok") }
        val code = state match {
          case Health.Passing => 200
          case Health.Warning => 429
        }
        val bytes = text.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    }

  server.createContext("/healthcheck", handler(healthcheckProbe))
  server.createContext("/status", handler(statusProbe))
  server.setExecutor(null) // default executor; probes are short-lived

  /** Start listening; with `listenPort` 0 the OS assigns a free port
    * (read it back via [[port]]). */
  def start(): this.type = { server.start(); this }

  /** The bound port (useful with ephemeral `listenPort` 0). */
  def port: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)
}

object HealthHttpServer {

  /** The standard wiring (main.go:31-44): static-ok `/healthcheck`,
    * `/status` = concurrent reader ∧ writer probes over the pipeline's
    * actual source path and JDBC sink. */
  def forPipeline(
      spark: org.apache.spark.sql.SparkSession, sourcePath: String,
      sinkUrl: String, listenPort: Int = 0, attempts: Int = 10,
      pingIntervalMillis: Long = 1000L): HealthHttpServer =
    new HealthHttpServer(
      () => Health.healthcheck(),
      () => Health.status(spark, sourcePath, sinkUrl, attempts, pingIntervalMillis),
      listenPort)
}
