package graft

import graft.pipeline.RedshiftScript

/** Execution-level (not verb-level) corpus coverage: the verb-recognition
  * metric counts a statement as covered when its verb maps to an
  * interpreter action, but a SELECT/CTAS/INSERT body still has to make it
  * through `spark.sql`. This spec runs every such reference SQL body
  * through `translate` (QUALIFY rewrite, `_rs` dialect forms, identifier
  * quoting) and Spark's parser — parse only, no analysis, so missing
  * tables don't matter — and pins the parse-success rate. This is the
  * honest "can the engine run the reference's SQL" number reported in
  * COVERAGE.md.
  */
class ParseCoverageSpec extends SparkSpec {

  test("translated reference SQL bodies parse through Spark's parser (≥90%)") {
    val root = java.nio.file.Paths.get("/root/reference")
    assume(java.nio.file.Files.exists(root))
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".sql") && java.nio.file.Files.isRegularFile(p))
      .toSeq

    val parser = spark.sessionState.sqlParser
    // body extraction per statement class; statements whose bodies never
    // go through spark.sql (DML verbs, DDL, no-ops) are out of scope here
    def bodyOf(stmt: String): Option[String] = {
      val s = RedshiftScript.stripLeadingComments(stmt.trim)
      val up = s.toUpperCase
      s match {
        case _ if up.startsWith("SELECT") || up.startsWith("WITH") => Some(s)
        case RedshiftScript.CreateRe(_, _, _, body) => Some(body)
        case RedshiftScript.CreateViewRe(_, body) => Some(body)
        case RedshiftScript.CreateMvRe(_, body) => Some(body)
        case RedshiftScript.InsertRe(_, colList, rawBody) =>
          val (_, b) = RedshiftScript.parseInsert(colList, rawBody)
          Option(b).filter(_.nonEmpty)
        case _ => None
      }
    }

    var total = 0
    var ok = 0
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    files.foreach { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)
      RedshiftScript.splitStatements(txt).foreach { st =>
        bodyOf(st).foreach { body =>
          total += 1
          val translated = RedshiftScript.translate(body, Some("2024-06-01"))
          try {
            parser.parsePlan(translated)
            ok += 1
          } catch {
            case e: Exception =>
              // full failing bodies land in /tmp for offline triage
              val dump = java.nio.file.Paths.get("/tmp/parse_failures")
              java.nio.file.Files.createDirectories(dump)
              java.nio.file.Files.writeString(
                dump.resolve(s"${failures.size}_${f.getFileName}"), translated)
              if (failures.size < 60) {
                val msg = Option(e.getMessage).getOrElse("?")
                val head = msg.linesIterator.take(2).mkString(" | ").take(150)
                // show the offending translated line when the parser names it
                val excerpt = "line (\\d+)".r.findFirstMatchIn(msg).flatMap { m =>
                  translated.linesIterator.toSeq.lift(m.group(1).toInt - 1)
                }.map(_.trim.take(130)).getOrElse("")
                failures += ((f.getFileName.toString, s"$head ===> $excerpt"))
              }
          }
        }
      }
    }
    val rate = ok.toDouble / total
    info(f"bodies=$total parsed=$ok rate=${rate * 100}%.1f%%")
    failures.foreach { case (f, m) => info(s"  [$f] $m") }
    assert(total > 2000, s"sample unexpectedly small: $total")
    assert(rate >= 0.90, f"parse rate ${rate * 100}%.1f%%")
  }
}
