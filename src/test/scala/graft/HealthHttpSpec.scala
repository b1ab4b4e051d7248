package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import graft.pipeline.{Health, HealthHttpServer}
import graft.queries.Scratch

/** The literal HTTP probe surface: a real socket serving
  * GET /healthcheck and GET /status with the reference's bodies
  * (main.go:31-44 — static "ok"; status = reader ∧ writer → "ok"/"nok")
  * and the vendored healthcheck lib's declared code map
  * (passing→200, warning→429). */
class HealthHttpSpec extends SparkSpec {
  import spark.implicits._

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new URI(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setRequestMethod("GET")
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), StandardCharsets.UTF_8)
    is.close()
    (code, body)
  }

  test("/healthcheck answers 200 ok over a real socket (main.go:31-33)") {
    val srv = new HealthHttpServer(
      () => Health.healthcheck(), () => (Health.Passing, "ok")).start()
    try assert(get(srv.port, "/healthcheck") == ((200, "ok")))
    finally srv.stop()
  }

  test("/status reflects the live reader+writer probes (main.go:46-69)") {
    System.setProperty("derby.system.home", Scratch.path("derby_home"))
    new java.io.File(Scratch.path("derby_home")).mkdirs()
    val src = Scratch.fresh("health_http_src")
    Seq("x").toDF("body").write.mode("overwrite").text(src)
    val goodUrl = s"jdbc:derby:${Scratch.path("derby_health_http_db")};create=true"

    val up = HealthHttpServer.forPipeline(spark, src, goodUrl).start()
    try assert(get(up.port, "/status") == ((200, "ok")))
    finally up.stop()

    // dead sink → warning body "nok", code 429 (declared stateMap)
    val badUrl = s"jdbc:derby:${Scratch.path("no_such_http_db")};bootPassword=wrong"
    val down = HealthHttpServer.forPipeline(spark, src, badUrl,
      attempts = 2, pingIntervalMillis = 10L).start()
    try assert(get(down.port, "/status") == ((429, "nok")))
    finally down.stop()
  }

  test("a probe that throws answers as a failing probe, not a dead listener") {
    val srv = new HealthHttpServer(
      () => Health.healthcheck(),
      () => throw new RuntimeException("probe exploded")).start()
    try {
      assert(get(srv.port, "/status") == ((429, "nok")))
      // the listener itself stays alive for the next request
      assert(get(srv.port, "/healthcheck") == ((200, "ok")))
    } finally srv.stop()
  }
}
