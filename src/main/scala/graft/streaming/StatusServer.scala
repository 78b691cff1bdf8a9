package graft.streaming

import java.lang.management.ManagementFactory
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import javax.management.ObjectName
import javax.management.openmbean.{CompositeData, TabularData}

/** HTTP observability (SURVEY.md §2.1 S18). The reference embeds Jetty on
  * port 31081 with `/` (HTML status tables, `StatusServlet.java:32-104`) and
  * `/jmx` (a generic platform-MBean JSON dump with composite/tabular
  * handling, `JmxServlet.java:37-257`). The rebuild serves the same
  * observable surface over the JDK's built-in HTTP server — zero
  * dependencies:
  *
  *   GET /health                  -> "ok"
  *   GET /status?target=<dir>     -> batch count, last-10 latencies,
  *                                   per-table-per-op event counts
  *                                   (JSON, or an HTML table page when the
  *                                   request prefers `Accept: text/html` —
  *                                   the reference's `toHtmlTable` surface)
  *   GET /jmx[?qry=<pattern>]     -> ANY platform MBean matching the
  *                                   ObjectName pattern (default `*:*`),
  *                                   attributes serialized to JSON with
  *                                   composite / tabular / array values
  *                                   expanded recursively
  */
class StatusServer(port: Int = 31081) {
  private val mbeans = ManagementFactory.getPlatformMBeanServer
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/health", (ex: HttpExchange) => respond(ex, 200, "ok", "text/plain"))
  server.createContext("/status", (ex: HttpExchange) => {
    val target = param(ex, "target")
    val wantsHtml = Option(ex.getRequestHeaders.getFirst("Accept")).exists(prefersHtml)
    target match {
      case None if wantsHtml => respond(ex, 400, "<html><body>missing ?target=</body></html>", "text/html")
      case None => respond(ex, 400, """{"error":"missing ?target="}""", "application/json")
      case Some(t) =>
        val decoded = java.net.URLDecoder.decode(t, "UTF-8")
        if (wantsHtml) respond(ex, 200, statusHtml(decoded), "text/html")
        else respond(ex, 200, statusJson(decoded), "application/json")
    }
  })
  server.createContext("/jmx", (ex: HttpExchange) => {
    val qry = param(ex, "qry").map(java.net.URLDecoder.decode(_, "UTF-8")).getOrElse("*:*")
    try respond(ex, 200, jmxJson(new ObjectName(qry)), "application/json")
    catch {
      case _: javax.management.MalformedObjectNameException =>
        respond(ex, 400, s"""{"error":"malformed ObjectName pattern"}""", "application/json")
    }
  })
  server.setExecutor(null) // single-threaded is plenty for a status page
  server.start()

  /** Bound port (useful when constructed with port 0 in tests). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = server.stop(0)

  /** RFC-7231-style negotiation between the two /status representations:
    * each candidate's quality is the q-value of its MOST SPECIFIC matching
    * range (exact > type/\* > \*&#47;\* — Java's default header also sends a
    * bare `*`); HTML is served only when strictly preferred, so ties, a
    * missing header, and malformed parts all fall back to JSON. Browsers
    * (text/html leading, q=1) get HTML; curl (`*&#47;*`) and JSON API
    * clients get JSON; `text/html;q=0.1, application/json` gets JSON. */
  private[streaming] def prefersHtml(header: String): Boolean = {
    def quality(cType: String, cSub: String): (Int, Double) = {
      var best = (-1, 0.0) // (specificity, q)
      header.split(",").foreach { part =>
        val segs = part.trim.split(";")
        val range = segs(0).trim.toLowerCase(java.util.Locale.ROOT)
        val q = segs.drop(1).map(_.trim.toLowerCase(java.util.Locale.ROOT))
          .collectFirst { case p if p.startsWith("q=") =>
            try p.substring(2).toDouble catch { case _: NumberFormatException => 0.0 }
          }.getOrElse(1.0)
        val spec = range match {
          case r if r == s"$cType/$cSub" => 2
          case r if r == s"$cType/*" => 1
          case "*/*" | "*" => 0
          case _ => -1
        }
        if (spec > best._1 || (spec == best._1 && q > best._2)) {
          if (spec >= 0) best = (spec, q)
        }
      }
      best
    }
    quality("text", "html")._2 > quality("application", "json")._2
  }

  private def param(ex: HttpExchange, name: String): Option[String] =
    Option(ex.getRequestURI.getQuery)
      .flatMap(_.split("&").find(_.startsWith(name + "=")))
      .map(_.stripPrefix(name + "="))

  private def q(s: String) = graft.util.Json.quote(s)

  private def statusJson(target: String): String = {
    import StreamingPipeline.Metrics
    val ops = Metrics.allOpCounts(target).toSeq.sortBy(_._1)
      .map { case ((table, op), n) => s"${q(s"$table.$op")}:$n" }
      .mkString("{", ",", "}")
    val lat = Metrics.recentLatenciesMs(target).mkString("[", ",", "]")
    s"""{"target":${q(target)},"batches":${Metrics.batchCount(target)},""" +
      s""""recent_latencies_ms":$lat,"op_counts":$ops}"""
  }

  /** The reference's human-readable status page: one bordered table per
    * metric family (`StatusServlet.toHtmlTable`). */
  private def statusHtml(target: String): String = {
    import StreamingPipeline.Metrics
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def table(header: Seq[String], rows: Seq[Seq[String]]): String =
      "<hr><table border=1 cellpadding=5 cellspacing=0>" +
        header.map(h => s"<td><b>${esc(h)}</b></td>").mkString("<thead><tr>", "", "</tr></thead>") +
        rows.map(r => r.map(c => s"<td>${esc(c)}</td>").mkString("<tr>", "", "</tr>")).mkString +
        "</table>"
    val ops = Metrics.allOpCounts(target).toSeq.sortBy(_._1)
      .map { case ((table, op), n) => Seq(s"$table.$op", n.toString) }
    val lat = Metrics.recentLatenciesMs(target)
    "<!DOCTYPE html><html><title>graft replication</title><body>" +
      table(Seq("target", "batches"), Seq(Seq(target, Metrics.batchCount(target).toString))) +
      table(Seq("table.op", "count"), ops) +
      table(Seq("recent batch latencies (ms)"), Seq(Seq(lat.mkString(",")))) +
      "</body></html>"
  }

  /** Serialize every MBean matching the pattern, reference-`JmxServlet`
    * style: `{"beans":[{"name":...,"modelerType":<class>,<attr>:<value>...}]}`
    * with CompositeData -> object, TabularData -> array of objects, arrays
    * -> JSON arrays, and unreadable attributes skipped (never a 500). */
  private def jmxJson(pattern: ObjectName): String = {
    val beans = mbeans.queryNames(pattern, null).asScala.toSeq.sortBy(_.toString).flatMap { oname =>
      try {
        val info = mbeans.getMBeanInfo(oname)
        val attrs = info.getAttributes.toSeq.filter(_.isReadable).flatMap { a =>
          try Some(s"${q(a.getName)}:${jsonVal(mbeans.getAttribute(oname, a.getName))}")
          catch { case _: Throwable => None } // attribute getter threw; skip it
        }
        Some((Seq(
          s""""name":${q(oname.toString)}""",
          s""""modelerType":${q(info.getClassName)}""") ++ attrs)
          .mkString("{", ",", "}"))
      } catch { case _: Throwable => None } // bean vanished mid-iteration
    }
    beans.mkString("""{"beans":[""", ",", "]}")
  }

  private def jsonVal(v: Any): String = v match {
    case null => "null"
    case n: java.lang.Number =>
      val s = n.toString
      // NaN/Infinity are not valid JSON literals
      if (s.contains("NaN") || s.contains("Infinity")) q(s) else s
    case b: java.lang.Boolean => b.toString
    case cd: CompositeData =>
      cd.getCompositeType.keySet.asScala.toSeq.sorted
        .map(k => s"${q(k)}:${jsonVal(cd.get(k))}").mkString("{", ",", "}")
    case td: TabularData =>
      td.values.asScala.toSeq.map(jsonVal).mkString("[", ",", "]")
    case a if a.getClass.isArray =>
      (0 until java.lang.reflect.Array.getLength(a))
        .map(i => jsonVal(java.lang.reflect.Array.get(a, i))).mkString("[", ",", "]")
    case s => q(s.toString)
  }

  private def respond(ex: HttpExchange, code: Int, body: String, ctype: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", s"$ctype; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }
}
