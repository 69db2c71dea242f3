package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Runs the reference's three Airflow repos' SQL corpora VERBATIM
  * (after deterministic template rendering — Airflow renders Jinja /
  * python-format slots before the warehouse sees the text, and
  * [[graft.pipeline.Templates]] reproduces that step with pinned
  * values):
  *
  *  - `ds-airflow-prod` — 33 data-science extract/load scripts
  *    (anomaly detection, cancellation forecasting, churn prediction,
  *    labels incl. the `ON CONFLICT DO UPDATE` upsert, data monitor).
  *  - `data-airflow-prod` — 84 integration scripts (reverse-ETL CRM
  *    conversion uploads, Braze campaign/canvas details, Intercom
  *    conversation exports, UPS/ixopay/voucherify stages, Mozenda
  *    scrape normalizers, pricing-API input lists, manual-review US).
  *  - `bi-airflow-prod` — 236 BI scripts (stg_data_curation, marketing
  *    costs, the Luxco spv monthly V2 + mid-month chains, P&L
  *    unpivots, live reporting, manual payment automation).
  *
  * Same contract as the Datawarehouse-ETL layer suites: converge to
  * zero failures (broken-in-reference pins documented) and re-run the
  * whole corpus idempotently.
  */
class AirflowLayersSpec extends SparkSpec {

  private val Pinned = "2024-06-15"

  private def scriptsOf(repo: String): Seq[(String, String)] = {
    val p = Paths.get(s"/root/reference/$repo")
    val files: Seq[Path] = Files.walk(p).iterator.asScala
      .filter(f => f.toString.endsWith(".sql") && Files.isRegularFile(f)).toSeq
    files.sortBy(_.toString).map { f =>
      val raw = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
      p.relativize(f).toString -> graft.pipeline.Templates.render(raw)
    }
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

  test("the ds-airflow-prod SQL corpus runs verbatim, twice") {
    assume(LayerHarness.wipEnabled, "WIP layer \u2014 set GRAFT_WIP_LAYERS=1")
    assume(Files.exists(Paths.get("/root/reference/ds-airflow-prod")))
    runLayer("ds_airflow", scriptsOf("ds-airflow-prod"))
  }

  test("the data-airflow-prod SQL corpus runs verbatim, twice") {
    assume(LayerHarness.wipEnabled, "WIP layer \u2014 set GRAFT_WIP_LAYERS=1")
    assume(Files.exists(Paths.get("/root/reference/data-airflow-prod")))
    runLayer("data_airflow", scriptsOf("data-airflow-prod"))
  }

  // bi-airflow-prod split by subtree so convergence cost and failure
  // triage stay local: the Luxco spv monthly chains, the stg_data
  // curation set, marketing costs + P&L, and the remaining dags
  private def biScripts(pred: String => Boolean): Seq[(String, String)] = {
    assume(Files.exists(Paths.get("/root/reference/bi-airflow-prod")))
    scriptsOf("bi-airflow-prod").filter { case (n, _) => pred(n) }
  }

  test("the bi-airflow-prod luxco spv chains run verbatim, twice") {
    assume(LayerHarness.wipEnabled, "WIP layer \u2014 set GRAFT_WIP_LAYERS=1")
    runLayer("bi_airflow_luxco", biScripts(n => n.contains("luxco")))
  }

  test("the bi-airflow-prod stg_data_curation set runs verbatim, twice") {
    assume(LayerHarness.wipEnabled, "WIP layer \u2014 set GRAFT_WIP_LAYERS=1")
    runLayer("bi_airflow_curation", biScripts(n => n.contains("stg_data_curation")))
  }

  test("the bi-airflow-prod marketing costs + P&L run verbatim, twice") {
    assume(LayerHarness.wipEnabled, "WIP layer \u2014 set GRAFT_WIP_LAYERS=1")
    runLayer("bi_airflow_marketing",
      biScripts(n => n.contains("marketing") || n.contains("P&L")))
  }

  test("the remaining bi-airflow-prod dags run verbatim, twice") {
    assume(LayerHarness.wipEnabled, "WIP layer \u2014 set GRAFT_WIP_LAYERS=1")
    runLayer("bi_airflow_rest", biScripts(n =>
      !n.contains("luxco") && !n.contains("stg_data_curation") &&
        !n.contains("marketing") && !n.contains("P&L")))
  }
}
