package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Runs the reference's remaining Datawarehouse-ETL directories VERBATIM
  * — the export/external edges of the warehouse:
  *
  *  - `90_Hightouch/` — 10 reverse-ETL source marts (catman trackers,
  *    product livefeed, store ranking, adyen pending payments views).
  *  - `91_External/` recursive — 35 scripts across Aircall, Braze,
  *    Catman commercial targets, Gmail partner tracking, Intercom (the
  *    conversation-parts chain), Legal IntraStat, Google_sheets loads
  *    and the SFTP delta-load pair (`CREATE TEMP TABLE … (LIKE …)`).
  *  - `92_DDL/S3_backup_tables/` — 5 wide GA-ecommerce CREATE TABLE
  *    DDLs (atomic schema).
  *  - `95_machine_learning/userid_session_id_matching/` — the MD5
  *    row-id transform + `${START_FROM}`-windowed DELETE/INSERT load,
  *    rendered by [[graft.pipeline.Templates]] the way the shell
  *    wrapper would.
  *  - `5_dwh_widgets/` recursive — 8 product-request widget views
  *    (top-N per store with ROW_NUMBER over submitted-order counts).
  *
  * Each set must converge to zero failures and re-run idempotently;
  * scripts broken IN the reference are pinned and excluded.
  */
class MiscLayersSpec extends SparkSpec {

  private val Pinned = "2024-06-15"
  private val Root = "/root/reference/Datawarehouse-ETL"

  private def scriptsOf(dir: String): Seq[(String, String)] = {
    val p = Paths.get(dir)
    val files: Seq[Path] = Files.walk(p).iterator.asScala
      .filter(f => f.toString.endsWith(".sql") && Files.isRegularFile(f)).toSeq
    files.sortBy(_.toString).map { f =>
      val raw = new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8)
      p.relativize(f).toString -> graft.pipeline.Templates.render(raw)
    }
  }

  private def runLayer(name: String, dirs: Seq[String],
      broken: Set[String] = Set.empty,
      neverCols: Set[(String, String)] = Set.empty): Unit = {
    val scripts = dirs.flatMap { d =>
      val dir = s"$Root/$d"
      assume(Files.exists(Paths.get(dir)), dir)
      scriptsOf(dir).map { case (n, t) => s"$d/$n" -> t }
    }
    val (failures, rerun, summary) = LayerHarness.runSeeded(
      spark, name, scripts, Some(Pinned), broken, neverCols,
      log = m => info(s"harness[$name]: $m"))
    println(summary)
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty, name)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty, name)
  }

  test("the 90_Hightouch reverse-ETL layer runs verbatim, twice") {
    runLayer("hightouch", Seq("90_Hightouch"))
  }

  test("the 91_External layer runs verbatim, twice") {
    runLayer("external", Seq("91_External"), broken = Set(
      // mangled in the reference: the INSERT header and SELECT keyword
      // were deleted, leaving a bare column list — unrunnable on
      // Redshift too
      "91_External/Google_sheets/load_pmf_survey_result.sql",
      // syntax error IN the reference: a CASE arm with two THEN clauses
      // (`when team_name = '…' then '…' then team_name`) — Redshift
      // rejects it too
      "91_External/Intercom/v_intercom_admin_id_teams.sql"),
      // master.customer provably lacks subscription_id (3_master/
      // customer.sql's customer_final carries only customer_acquisition_
      // subscription_id) — the unqualified `subscription_id` in
      // Braze/custom_subscription_attributes.sql:10 belongs to
      // master.subscription, exactly as Redshift resolves it
      neverCols = Set(("master.customer", "subscription_id")))
  }

  test("the 92_DDL + 95_machine_learning layers run verbatim, twice") {
    runLayer("ddl_ml", Seq("92_DDL", "95_machine_learning"))
  }

  test("the 5_dwh_widgets layer runs verbatim, twice") {
    runLayer("widgets", Seq("5_dwh_widgets"))
  }
}
