package graft

import graft.pipeline.RedshiftScript

/** Scratch triage main (not a test): does substituteAliasesInWindows
  * rewrite a given script's lateral window aliases?
  */
object ProbeWindowAlias {
  def main(args: Array[String]): Unit = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), java.nio.charset.StandardCharsets.UTF_8)
    RedshiftScript.splitStatements(text)
      .map(RedshiftScript.stripLeadingComments).foreach { st =>
        val tr = RedshiftScript.translate(st, Some("2024-06-15"))
        val out = RedshiftScript.substituteAliasesInWindows(tr)
        println(s"changed=${out != tr}")
        if (out != tr) {
          val i = out.zip(tr).indexWhere(p => p._1 != p._2)
          println("  at: " + out.substring(math.max(0, i - 60), math.min(out.length, i + 120)).replace('\n', ' '))
        } else {
          "(?i)over\\s*\\(".r.findAllMatchIn(tr).foreach { m =>
            println("  window: " + tr.substring(m.start, math.min(tr.length, m.start + 100)).replace('\n', ' '))
          }
        }
      }
  }
}
