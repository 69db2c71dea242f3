package graft

import graft.pipeline.RedshiftScript
import java.nio.file.{Files, Paths}

/** Scratch triage main (not a test): shows what the scalar-subquery
  * first()-wrap rewriter does to a script's statements.
  *
  * {{{ sbt "Test/runMain graft.ProbeWrap <script.sql>" }}}
  */
object ProbeWrap {
  def main(args: Array[String]): Unit = {
    val text = new String(Files.readAllBytes(Paths.get(args.head)),
      java.nio.charset.StandardCharsets.UTF_8)
    RedshiftScript.splitStatements(text).zipWithIndex.foreach { case (st, i) =>
      val body = RedshiftScript.stripLeadingComments(st)
      val translated =
        try RedshiftScript.translate(body, Some("2024-06-15"))
        catch { case e: Exception => println(s"stmt $i TRANSLATE THREW"); body }
      val wrapped = RedshiftScript.wrapScalarSubqueriesInFirst(translated)
      println(s"== stmt $i changed=${wrapped != translated}")
      if (wrapped != translated)
        println(wrapped.take(3000))
    }
  }
}
