package graft

import graft.pipeline.RedshiftScript
import java.nio.file.{Files, Paths}

/** Scratch triage main for single-script parse defects (not a test):
  * splits a reference script, translates each statement through the
  * dialect layer, and PARSES it (no execution, no fixtures) — prints
  * the translated text around the failure for every statement the
  * parser rejects.
  *
  * {{{ sbt "Test/runMain graft.ProbeScript <script.sql>" }}}
  */
object ProbeScript {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val text = new String(Files.readAllBytes(Paths.get(args.head)),
      java.nio.charset.StandardCharsets.UTF_8)
    val stmts = RedshiftScript.splitStatements(text)
    println(s"${stmts.size} statements")
    stmts.zipWithIndex.foreach { case (st, i) =>
      val body = RedshiftScript.stripLeadingComments(st)
      val translated =
        try RedshiftScript.translate(body, Some("2024-06-15"))
        catch { case e: Exception =>
          println(s"-- stmt $i: TRANSLATE THREW ${e.getMessage}"); body }
      // only raw-SQL-ish statements parse; DDL verbs go through their own
      // regex paths — approximate by trying anything containing SELECT
      if (translated.toUpperCase.contains("SELECT")) {
        try { spark.sessionState.sqlParser.parsePlan(extractQuery(translated)); () }
        catch {
          case e: Exception =>
            val msg = String.valueOf(e.getMessage)
            println(s"== stmt $i PARSE FAIL ==")
            println(msg.take(300))
            val LineRe = "line (\\d+)".r
            LineRe.findFirstMatchIn(msg).foreach { m =>
              val ln = m.group(1).toInt
              val lines = extractQuery(translated).split("\n", -1)
              val lo = math.max(0, ln - 4); val hi = math.min(lines.length, ln + 3)
              (lo until hi).foreach(j => println(f"${j + 1}%4d| ${lines(j)}"))
            }
        }
      }
    }
    spark.stop()
  }

  /** Peel a CTAS/VIEW header off so the parser sees the query body the
    * runner would hand to spark.sql.
    */
  private def extractQuery(t: String): String = {
    val CtasAs =
      "(?is)^\\s*CREATE\\s+(?:TEMP(?:ORARY)?\\s+)?\\s*TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?[\\w.\"]+(.*?)\\bAS\\b(.*)$".r
    val View =
      "(?is)^\\s*CREATE\\s+(?:OR\\s+REPLACE\\s+)?(?:MATERIALIZED\\s+)?VIEW\\s+[\\w.\"]+\\s+AS\\b(.*)$".r
    t match {
      case View(q) => q
      case CtasAs(_, q) => q
      case _ => t
    }
  }
}
