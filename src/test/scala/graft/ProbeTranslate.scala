package graft

import graft.pipeline.RedshiftScript

/** Scratch triage main: translate a SQL fragment (arg or stdin file) and
  * print the result, for chasing dialect-rewrite defects. No session.
  */
object ProbeTranslate {
  def main(args: Array[String]): Unit = {
    val text =
      if (args.nonEmpty && java.nio.file.Files.exists(java.nio.file.Paths.get(args.head)))
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(args.head)),
          java.nio.charset.StandardCharsets.UTF_8)
      else args.mkString(" ")
    println("=== TRANSLATED ===")
    println(RedshiftScript.translate(text, Some("2024-06-15")))
  }
}

/** Scratch: apply rewriteStarGroupByOrdinal to a file and diff-count. */
object ProbeStarGroup {
  def main(args: Array[String]): Unit = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), java.nio.charset.StandardCharsets.UTF_8)
    val out = RedshiftScript.rewriteStarGroupByOrdinal(text)
    println(s"changed=${out != text}")
    out.split("\n").zip(text.split("\n")).zipWithIndex
      .filter { case ((a, b), _) => a != b }
      .take(6).foreach { case ((a, b), i) => println(s"$i: $b  =>  $a") }
  }
}

/** Scratch: print full rewriteStarGroupByOrdinal output. */
object ProbeStarGroup2 {
  def main(args: Array[String]): Unit = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(args.head)), java.nio.charset.StandardCharsets.UTF_8)
    println(RedshiftScript.rewriteStarGroupByOrdinal(text))
  }
}
