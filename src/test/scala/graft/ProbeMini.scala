package graft

import java.nio.file.{Files, Paths}

/** Scratch triage main: converge a SINGLE reference script as its own
  * mini-layer with full harness logging — the tightest loop for chasing
  * one script's repair path.
  *
  * {{{ sbt "Test/runMain graft.ProbeMini <script.sql> [script2.sql ...]" }}}
  */
object ProbeMini {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val scripts = args.toSeq.map { p =>
      Paths.get(p).getFileName.toString ->
        new String(Files.readAllBytes(Paths.get(p)),
          java.nio.charset.StandardCharsets.UTF_8)
    }
    val layer = new LayerHarness.Layer(spark, scripts, Some("2024-06-15"),
      log = m => println(s"harness: $m"))
    val failures = layer.converge()
    failures.foreach { case (n, e) =>
      println(s"FAILED $n :: ${e.replaceAll("\\s+", " ").take(700)}")
    }
    println("NFAIL=" + failures.size)
    spark.stop()
  }
}
