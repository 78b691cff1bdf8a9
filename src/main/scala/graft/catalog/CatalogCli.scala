package graft.catalog

import java.io.{BufferedReader, PrintStream}

import org.apache.spark.sql.SparkSession

/** Catalog management console (SURVEY.md EP2). The reference ships a jline
  * shell (`Mysql2HbaseCliDriver.scala:15-129`) with verbs add / list /
  * delete / map / unmap over the HBase-stored mapping registry; this is the
  * same verb set over [[Catalog]], driven by any Reader/PrintStream so
  * tests can script it. Run interactively via
  * `runMain graft.catalog.CatalogCli <storeDir>`.
  */
object CatalogCli {

  val help: String =
    """commands:
      |  add <mapping-json>        validate + persist a table mapping
      |  list                      list all mappings
      |  list <db.table>           show one mapping's JSON
      |  delete <db.table>         remove a mapping
      |  map <db.table> <dir>      register sparkTableName over a CDC target dir
      |  unmap <db.table>          drop the registered view
      |  help                      this text
      |  quit | exit               leave""".stripMargin

  /** One command; returns false when the session should end. */
  def processLine(cat: Catalog, spark: SparkSession, line: String, out: PrintStream): Boolean = {
    val trimmed = line.trim
    val (verb, rest) = trimmed.split("\\s+", 2) match {
      case Array(v) => (v.toLowerCase, "")
      case Array(v, r) => (v.toLowerCase, r.trim)
      case _ => ("", "")
    }
    try verb match {
      case "" => true
      case "quit" | "exit" => false
      case "help" => out.println(help); true
      case "add" =>
        val m = cat.add(rest)
        out.println(s"added ${m.qualifiedName} (spark table ${m.sparkTableName})"); true
      case "list" if rest.isEmpty =>
        val ms = cat.list()
        if (ms.isEmpty) out.println("(no mappings)")
        else ms.foreach(m => out.println(
          s"${m.qualifiedName} -> ${m.sparkTableName} " +
            s"[pk: ${m.pkCols.mkString(",")}; ${m.cols.size} cols]"))
        true
      case "list" =>
        cat.get(rest) match {
          case Some(m) => out.println(Catalog.toJson(spark, m))
          case None => out.println(s"no mapping $rest")
        }
        true
      case "delete" =>
        out.println(if (cat.delete(rest)) s"deleted $rest" else s"no mapping $rest"); true
      case "map" =>
        rest.split("\\s+", 2) match {
          case Array(name, dir) =>
            cat.map(name, dir.trim)
            out.println(s"mapped $name -> queryable as ${cat.get(name).get.sparkTableName}")
          case _ => out.println("usage: map <db.table> <targetDir>")
        }
        true
      case "unmap" =>
        cat.unmap(rest); out.println(s"unmapped $rest"); true
      case other =>
        out.println(s"unknown command '$other' — try help"); true
    } catch {
      case e: Exception => out.println(s"error: ${e.getMessage}"); true
    }
  }

  def run(cat: Catalog, spark: SparkSession, in: BufferedReader, out: PrintStream): Unit = {
    var continue = true
    while (continue) {
      out.print("graft> ")
      out.flush()
      val line = in.readLine()
      continue = line != null && processLine(cat, spark, line, out)
    }
  }

  /** The interactive form of [[run]] — a readline REPL (the reference's
    * jline shell, `Mysql2HbaseCliDriver.scala:15-129`) over the SAME verb
    * dispatch: line editing, in-session history, and tab completion of the
    * verb set, via the jline Spark already ships. Takes a prebuilt
    * [[org.jline.terminal.Terminal]] so the spec can drive the REAL reader
    * over piped streams (jline's stream terminals run a pty pump whose
    * close races a draining reader, so test feeds keep the input open and
    * end with an explicit ctrl-D — exactly what a user sends). */
  def runJline(cat: Catalog, spark: SparkSession,
      terminal: org.jline.terminal.Terminal): Unit = {
    import org.jline.reader.{EndOfFileException, LineReaderBuilder, UserInterruptException}
    import org.jline.reader.impl.completer.StringsCompleter
    val reader = LineReaderBuilder.builder()
      .terminal(terminal)
      .completer(new StringsCompleter(
        "add", "list", "delete", "map", "unmap", "help", "quit", "exit"))
      .build()
    val out = new PrintStream(terminal.output(), true)
    var continue = true
    while (continue) {
      val line =
        try reader.readLine("graft> ")
        catch {
          case _: EndOfFileException => null    // ctrl-D: leave
          case _: UserInterruptException => ""  // ctrl-C: clear the line
        }
      continue = line != null && processLine(cat, spark, line, out)
    }
  }

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: CatalogCli <storeDir>")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cat = new Catalog(spark, args(0))
    // a real terminal gets the readline REPL; piped stdin (scripting)
    // keeps the plain loop so `echo 'list' | CatalogCli` stays exact
    if (System.console() != null) {
      val terminal = org.jline.terminal.TerminalBuilder.builder().system(true).build()
      try runJline(cat, spark, terminal) finally terminal.close()
    } else run(cat, spark,
      new BufferedReader(new java.io.InputStreamReader(System.in)), System.out)
    spark.stop()
  }
}
