package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Runs the reference's SPV Pricing_V2 layer VERBATIM:
  * `/root/reference/Datawarehouse-ETL/9_SPV/Pricing_V2/` — 11 scripts
  * (940 lines) of the asset-pricing pipeline: MM/Saturn price outlier
  * removal via windowed MEDIAN coefficients
  * (`00_step_outlier_removal_1.sql:159-185`), ranked dedup, used-asset
  * price mastering, finco valuations, and the final pricing policy mart.
  *
  * This is the heaviest percentile workload in the reference — windowed
  * `MEDIAN() OVER (PARTITION BY sku, condition)`, `LAG/LEAD IGNORE
  * NULLS` forward/backward fills, `SIMILAR TO` regex filters and
  * GETDATE()-relative windows all in one chain — so it exercises the
  * W8 percentile rewrite and ignore-nulls fills against real text.
  *
  * `10_pricing_policy_v2.sql` DROPs the trans_dev intermediates after
  * publishing, so idempotent rerun only holds for the whole layer in
  * script order (00 recreates what 10 dropped) — exactly how the
  * reference's Airflow DAG sequences it.
  */
class SpvPricingLayerSpec extends SparkSpec {

  private val layerDir =
    Paths.get("/root/reference/Datawarehouse-ETL/9_SPV/Pricing_V2")
  private val Pinned = "2024-06-15"

  test("the 9_SPV/Pricing_V2 layer runs verbatim, twice") {
    assume(Files.exists(layerDir))
    val scripts = Files.list(layerDir).iterator.asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.getFileName.toString)
      .map(p => p.getFileName.toString -> new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))

    val layer = new LayerHarness.Layer(spark, scripts, Some(Pinned),
      log = m => info(s"harness: $m"))
    val failures = layer.converge()
    println(layer.summaryJson("9_SPV/Pricing_V2", failures))
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty)

    // rerun: idempotent as a whole layer in script order
    val root = Files.createTempDirectory("graft-spv-pricing").toString
    val rerun = layer.runAll(root)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty)
  }
}
