package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** HTTP observability (SURVEY.md §2.1 S18). The reference embeds Jetty on
  * port 31081 with `/` (HTML status) and `/jmx` (MBean JSON dump,
  * `HttpServer.java:19-43`, `JmxServlet.java:37-257`). The rebuild serves
  * the [[StreamingPipeline.Metrics]] registry as JSON over the JDK's
  * built-in HTTP server — zero dependencies, same observable surface:
  *
  *   GET /health                  -> "ok"
  *   GET /status?target=<dir>     -> batch count, last-10 latencies,
  *                                   per-table-per-op event counts
  */
class StatusServer(port: Int = 31081) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/health", (ex: HttpExchange) => respond(ex, 200, "ok"))
  server.createContext("/status", (ex: HttpExchange) => {
    val target = Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").find(_.startsWith("target=")))
      .map(_.stripPrefix("target="))
    target match {
      case None => respond(ex, 400, """{"error":"missing ?target="}""")
      case Some(t) =>
        val decoded = java.net.URLDecoder.decode(t, "UTF-8")
        respond(ex, 200, statusJson(decoded))
    }
  })
  server.setExecutor(null) // single-threaded is plenty for a status page
  server.start()

  /** Bound port (useful when constructed with port 0 in tests). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)

  private def statusJson(target: String): String = {
    import StreamingPipeline.Metrics
    def q(s: String) = graft.util.Json.quote(s)
    val ops = Metrics.allOpCounts(target).toSeq.sortBy(_._1)
      .map { case ((table, op), n) => s"${q(s"$table.$op")}:$n" }
      .mkString("{", ",", "}")
    val lat = Metrics.recentLatenciesMs(target).mkString("[", ",", "]")
    s"""{"target":${q(target)},"batches":${Metrics.batchCount(target)},""" +
      s""""recent_latencies_ms":$lat,"op_counts":$ops}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type",
      if (body.startsWith("{")) "application/json" else "text/plain")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
