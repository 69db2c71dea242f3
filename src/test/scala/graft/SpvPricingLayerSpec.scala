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

    // rerun half: idempotent as a whole layer in script order
    val (failures, rerun, summary) = LayerHarness.runSeeded(
      spark, "spv_pricing_v2", scripts, Some(Pinned),
      log = m => info(s"harness: $m"))
    println(summary)
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty)
  }

  /** The REST of 9_SPV beyond Pricing_V2: the numbered SPV valuation
    * chain (`1_union_all_sources` → outlier removal → avg-3-lowest →
    * price-per-sku → asset market value → sold-asset valuation →
    * `7_0_final_output`), the Mozenda scrape-source normalizers, and
    * the legacy `Pricing/` pipeline — 19 scripts.
    */
  test("the 9_SPV valuation chain + Mozenda + legacy Pricing run verbatim, twice") {
    val base = Paths.get("/root/reference/Datawarehouse-ETL/9_SPV")
    assume(Files.exists(base))
    val scripts = java.nio.file.Files.walk(base).iterator.asScala
      .filter(f => f.toString.endsWith(".sql") && Files.isRegularFile(f))
      .filterNot(_.toString.contains("/Pricing_V2/"))
      .toSeq.sortBy(_.toString)
      .map(p => base.relativize(p).toString ->
        new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
    assert(scripts.size >= 19, s"expected the full chain, got ${scripts.size}")
    // schema-drifted IN THE REFERENCE: the legacy Pricing/ pipeline reads
    // `prep.itemid` (`Pricing/1_pricing_outlier_removal.sql:127`) from
    // `ods_spv_historical.union_sources`, but the chain's own
    // `1_union_all_sources.sql:9` builds that table with `item_id` — the
    // legacy script no longer runs against the current schema on
    // Redshift either; its output stages as a fixture.
    val broken = Set("Pricing/1_pricing_outlier_removal.sql")
    val (failures, rerun, summary) = LayerHarness.runSeeded(
      spark, "9_SPV", scripts, Some(Pinned), broken,
      log = m => info(s"harness[spv]: $m"))
    println(summary)
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty)
  }
}
