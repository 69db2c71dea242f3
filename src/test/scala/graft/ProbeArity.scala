package graft

import graft.pipeline.RedshiftScript
import java.nio.file.{Files, Paths}

/** Scratch triage main (not a test): for an INSERT statement in a
  * script, print the parsed column-list arity vs the translated body's
  * top-level select-list arity, and the items around any mismatch.
  *
  * {{{ sbt "Test/runMain graft.ProbeArity <script.sql>" }}}
  */
object ProbeArity {
  def main(args: Array[String]): Unit = {
    val text = new String(Files.readAllBytes(Paths.get(args.head)),
      java.nio.charset.StandardCharsets.UTF_8)
    RedshiftScript.splitStatements(text)
      .map(RedshiftScript.stripLeadingComments).foreach {
        case RedshiftScript.InsertRe(name, cl, rawBody) =>
          val (cols, body) = RedshiftScript.parseInsert(cl, rawBody)
          val translated = RedshiftScript.translate(body, Some("2024-06-15"))
          val selIdx = RedshiftScript.topKeywordIndex(translated, "SELECT")
          val listText = RedshiftScript.splitTopKeyword(
            translated.substring(selIdx + 6), "FROM")._1
          val items = RedshiftScript.splitTop(listText)
          println(s"target=$name colList=${cols.map(_.size)} bodyItems=${items.size}")
          cols.foreach { cs =>
            val aliases = items.map { it =>
              "(?is)\\s+as\\s+(\\w+)\\s*$".r.findFirstMatchIn(it.trim)
                .map(_.group(1).toLowerCase)
                .getOrElse("(\\w+)\\s*$".r.findFirstMatchIn(it.trim)
                  .map(_.group(1).toLowerCase).getOrElse("?"))
            }
            cs.map(_.toLowerCase).zipAll(aliases, "<missing>", "<missing>")
              .zipWithIndex.foreach { case ((c, a), i) =>
                if (!a.contains(c) && !c.contains(a))
                  println(f"  $i%3d col=$c alias=$a item=${items.lift(i).map(_.trim.take(90))}")
              }
          }
        case _ => ()
      }
  }
}
