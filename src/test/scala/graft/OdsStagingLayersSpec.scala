package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Runs two more reference staging layers VERBATIM:
  *
  *  - `0_ods_core/` — 12 scripts deriving the product/variant/store/
  *    supplier operational entities from raw api_production extracts;
  *    FIRST_VALUE-heavy (`00_variant.sql:81,88`) with the
  *    dedup-latest + catalog-join idioms.
  *  - `2_ods_risk/` + `2_ods_catman/` — decline reasons, manual review,
  *    live feeds, waiting list; smaller but exercises the same verbs on
  *    different source families.
  *
  * Each layer must converge to zero failures and re-run idempotently.
  */
class OdsStagingLayersSpec extends SparkSpec {

  private val Pinned = "2024-06-15"

  private def scriptsOf(dir: String): Seq[(String, String)] = {
    val p = Paths.get(dir)
    Files.list(p).iterator.asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.getFileName.toString)
      .map(f => f.getFileName.toString -> new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8))
  }

  private def runLayer(name: String, scripts: Seq[(String, String)],
      broken: Set[String] = Set.empty): Unit = {
    val (failures, rerun, summary) = LayerHarness.runSeeded(
      spark, name, scripts, Some(Pinned), broken,
      log = m => info(s"harness[$name]: $m"))
    println(summary)
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty, name)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty, name)
  }

  test("the 0_ods_core layer runs verbatim, twice") {
    val dir = "/root/reference/Datawarehouse-ETL/0_ods_core"
    assume(Files.exists(Paths.get(dir)))
    // 00_store.sql is broken IN THE REFERENCE: a dangling second THEN
    // with no WHEN (`00_store.sql:31-33` `THEN 'Grover - Germany'::text
    // THEN 'Grover - '::text + c.name`) — invalid in Redshift too; its
    // output table stages as a fixture like any pre-existing table
    runLayer("ods0", scriptsOf(dir), broken = Set("00_store.sql"))
  }

  test("the 2_ods_risk + 2_ods_catman layers run verbatim, twice") {
    val risk = "/root/reference/Datawarehouse-ETL/2_ods_risk"
    val catman = "/root/reference/Datawarehouse-ETL/2_ods_catman"
    assume(Files.exists(Paths.get(risk)))
    // 01_order_manual_review.sql is broken IN THE REFERENCE: statement 1
    // DROPs and rebuilds `ods_data_sensitive.order_manual_review_tmp`
    // with an explicit select list containing no `psp_reference`
    // (zero "psp" mentions before line 232), yet statement 2 reads
    // `omr.psp_reference` from it (line 340) — fails on a fresh Redshift
    // run too (producer/consumer column drift).
    // Also broken in the reference:
    //  - mietkauf_prices.sql: CTE `b` (`select max(datum) as datum,
    //    product_sku WHERE …` lines 4-12) and CTE `d` (lines 22-34) have
    //    NO FROM clause / an undefined alias `m` — unparseable anywhere.
    //  - 00_procurement_live_feed.sql: unclosed scalar subqueries and a
    //    `NOT EXISTS ( FROM … )` with no SELECT (lines 29-45).
    runLayer("ods2", scriptsOf(risk) ++ scriptsOf(catman),
      broken = Set("01_order_manual_review.sql", "mietkauf_prices.sql",
        "00_procurement_live_feed.sql"))
  }
}
