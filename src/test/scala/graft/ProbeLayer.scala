package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Scratch triage main for layer convergence (not a test): runs
  * [[LayerHarness]] over any reference layer directory and prints the
  * residual failures with full error text.
  *
  * {{{ sbt "Test/runMain graft.ProbeLayer <layer-dir> [broken.sql,...]" }}}
  */
object ProbeLayer {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val layerDir = Paths.get(args.headOption
      .getOrElse("/root/reference/Datawarehouse-ETL/4_dwh_core"))
    val broken = args.lift(1).map(_.split(",").toSet).getOrElse(
      Set("reporting_churn_store_commercial.sql"))
    val scripts = Files.list(layerDir).iterator.asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.getFileName.toString)
      .map(p => p.getFileName.toString -> new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    // third arg: comma-separated `schema.table.column` never-placements
    val never: Set[(String, String)] = args.lift(2) match {
      case Some(a) => a.split(",").toSet
        .filter((s0: String) => s0.count(_ == '.') == 2)
        .map { s0: String =>
          val i = s0.lastIndexOf('.')
          (s0.substring(0, i), s0.substring(i + 1))
        }
      case None => Set.empty
    }
    val layer = new LayerHarness.Layer(spark, scripts, Some("2024-06-15"),
      broken = broken, neverCols = never,
      log = m => println(s"harness: $m"))
    val failures =
      try layer.converge()
      catch {
        case e: Throwable =>
          println("THREW: " + e.getClass.getName)
          println(String.valueOf(e.getMessage).take(800))
          e.getStackTrace.take(20).foreach(f => println("  at " + f))
          Map("<<threw>>" -> String.valueOf(e.getMessage).take(200))
      }
    failures.foreach { case (n, e) =>
      println(s"FAILED $n :: ${e.replaceAll("\\s+", " ").take(500)}")
    }
    println("NFAIL=" + failures.size)
    spark.stop()
  }
}
