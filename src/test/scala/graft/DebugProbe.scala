package graft

import graft.pipeline.{RedshiftScript, Templates}
import java.nio.file.{Files, Paths}

/** Scratch triage main (not a test): applies the Runner's textual
  * repair functions one at a time to a script's first statement and
  * prints what each changed — isolates which transformation mangles a
  * statement without running the whole layer harness.
  *
  * {{{ sbt "Test/runMain graft.DebugProbe <file.sql> [unresolvedName,…]" }}}
  */
object DebugProbe {
  def main(args: Array[String]): Unit = {
    val path = Paths.get(args.head)
    val unresolved: Set[String] =
      args.lift(1).map(_.split(",").map(_.toLowerCase).toSet).getOrElse(Set.empty)
    val text = Templates.render(new String(Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8))
    // third arg: pick the first statement CONTAINING this substring
    // (case-insensitive); default = the first statement
    val stmts = RedshiftScript.splitStatements(text)
    val chosen = args.lift(2) match {
      case Some(sub) => stmts.find(_.toLowerCase.contains(sub.toLowerCase))
        .getOrElse(stmts.head)
      case None => stmts.head
    }
    val tr = RedshiftScript.translate(chosen, Some("2024-06-15"))
    val d = RedshiftScript.dedupeSelectItems(tr)
    println(s"DEDUPE-CHANGED: ${d != tr}")
    val w = RedshiftScript.substituteAliasesInWhere(d, unresolved)
    println(s"WHERE-CHANGED: ${w != d}")
    val ww = RedshiftScript.substituteAliasesInWindows(w)
    println(s"WINDOWS-CHANGED: ${ww != w}")
    println("RESULT-BEGIN")
    println(ww)
    println("RESULT-END")
  }
}
