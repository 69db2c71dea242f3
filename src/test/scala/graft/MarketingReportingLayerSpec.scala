package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Runs the reference's marketing reporting mart VERBATIM:
  * `/root/reference/Datawarehouse-ETL/11_marketing_reporting/` top-level
  * scripts (~59 files, 13.3k lines) — the largest mart directory. The
  * centrepiece is `marketing.marketing_cost_daily_base_data.sql` (1,232
  * lines): a UNION-ALL of a dozen channel cost feeds range-joined onto
  * the session/order attribution spine — the heaviest text-level stress
  * of the range/interval join path (J6) in the corpus.
  *
  * Subdirectories (Affiliate_Automation, Braze Datamart,
  * Partnership_Automation) are separate DAG feeds, staged as fixtures
  * when referenced.
  */
class MarketingReportingLayerSpec extends SparkSpec {

  private val layerDir =
    Paths.get("/root/reference/Datawarehouse-ETL/11_marketing_reporting")
  private val Pinned = "2024-06-15"

  test("the 11_marketing_reporting layer runs verbatim, twice") {
    assume(Files.exists(layerDir))
    val scripts = Files.list(layerDir).iterator.asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.getFileName.toString)
      .map(p => p.getFileName.toString -> new String(Files.readAllBytes(p)))

    val Broken = Set.empty[String]

    val layer = new LayerHarness.Layer(spark, scripts, Some(Pinned),
      broken = Broken, log = m => info(s"harness: $m"))
    val failures = layer.converge()
    println(layer.summaryJson("11_marketing_reporting", failures))
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty)

    val root = Files.createTempDirectory("graft-marketing").toString
    val rerun = layer.runAll(root)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty)
  }
}
