package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Runs two more reference dwh mart layers VERBATIM:
  *
  *  - `4_dwh_risk/` — 40+ scripts: approval funnel, credit-bureau
  *    reporting, asset-risk datamarts; heavy CASE/window/date-spine use
  *    over the order/asset spine.
  *  - `4_dwh_catman/` — 60+ scripts: daily fact asset, portfolio
  *    overview, utilization, pricing-history marts; the widest
  *    fact-table select lists in the corpus.
  *
  * Top-level `.sql` files only (subdirectories are separate DAG feeds).
  * Each layer must converge to zero failures and re-run idempotently.
  */
class DwhRiskCatmanLayerSpec extends SparkSpec {

  private val Pinned = "2024-06-15"

  private def scriptsOf(dir: String): Seq[(String, String)] = {
    val p = Paths.get(dir)
    Files.list(p).iterator.asScala
      .filter(_.toString.endsWith(".sql")).toSeq.sortBy(_.getFileName.toString)
      .map(f => f.getFileName.toString -> new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8))
  }

  private def runLayer(name: String, scripts: Seq[(String, String)],
      broken: Set[String] = Set.empty,
      neverCols: Set[(String, String)] = Set.empty): Unit = {
    val layer = new LayerHarness.Layer(spark, scripts, Some(Pinned),
      broken = broken, neverCols = neverCols,
      log = m => info(s"harness[$name]: $m"))
    val failures = layer.converge()
    println(layer.summaryJson(name, failures))
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty, name)
    val root = Files.createTempDirectory(s"graft-$name").toString
    val rerun = layer.runAll(root)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty, name)
  }

  test("the 4_dwh_risk layer runs verbatim, twice") {
    val dir = "/root/reference/Datawarehouse-ETL/4_dwh_risk"
    assume(Files.exists(Paths.get(dir)))
    // Broken IN THE REFERENCE (fail on a fresh Redshift run too):
    //  - credit_bureau_spain_shipaddress.sql: the `_nornalized_address`
    //    CTE reads `FROM` directly followed by a bare `SELECT` with no
    //    derived-table parentheses (lines 29-30) — unparseable anywhere;
    //    its target table stages as a fixture for credit_bureau_reporting.
    //  - risk_daily_monitoring.sql: the CTAS select list aliases BOTH
    //    `status = 'DECLINED'` and `status = 'FAILED FIRST PAYMENT'` to
    //    `declined_flag` (lines 217-218) — duplicate column names in
    //    CREATE TABLE AS are rejected by Redshift as well.
    // master.customer has no subscription_id in the warehouse — the
    // unqualified `subscription_id` in v_b2b_payments_report's base_ CTE
    // resolves to subscription_historical; without the exclusion the
    // guess/drop machinery fights itself to a standstill on it
    runLayer("dwh_risk", scriptsOf(dir),
      broken = Set("credit_bureau_spain_shipaddress.sql",
        "risk_daily_monitoring.sql"),
      neverCols = Set("master.customer" -> "subscription_id"))
  }

  test("the 4_dwh_catman layer runs verbatim, twice") {
    val dir = "/root/reference/Datawarehouse-ETL/4_dwh_catman"
    assume(Files.exists(Paths.get(dir)))
    runLayer("dwh_catman", scriptsOf(dir))
  }
}
