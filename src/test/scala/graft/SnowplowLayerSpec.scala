package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Runs the ENTIRE `7_snowplow` clickstream layer VERBATIM — all 61
  * scripts, recursively, in the reference DAG's stage order (the numeric
  * directory prefixes encode it):
  *
  *  - `0_atomic_kafka/` — the INSERT-append loaders into the atomic
  *    event store (`events.sql` is a 131-column positional INSERT).
  *  - `1_page_view/` — web-page-context dedup, event enrichment, scroll
  *    depth, useragent/timing contexts, url parse + store/page-type
  *    mapping, user decode, page views (+ `_incremental` variants, the
  *    high-water idiom), the scratch-table DROP, and the
  *    recommendation-engine joins.
  *  - `2_sessions/` — marketing details, the session rollup
  *    (`01_sessions.sql`, previously covered solo by
  *    SnowplowSessionsSpec), session event features, Order_Mapping
  *    (events→url→customer→session-order conversions).
  *  - `3_users/` + `4_impression_and_product/` + `6_structured_events/`
  *    — user mapping commits, impression/product marts, web vitals.
  *
  * Layer must converge to zero failures (scripts broken IN the
  * reference excluded and pinned below) and re-run idempotently as a
  * whole, in order — same contract as the other layer suites.
  */
class SnowplowLayerSpec extends SparkSpec {

  private val Pinned = "2024-06-15"

  private def scriptsOf(dir: String): Seq[(String, String)] = {
    val p = Paths.get(dir)
    val files: Seq[Path] = Files.walk(p).iterator.asScala
      .filter(f => f.toString.endsWith(".sql") && Files.isRegularFile(f)).toSeq
    files.sortBy(_.toString)
      .map(f => p.relativize(f).toString ->
        new String(Files.readAllBytes(f), java.nio.charset.StandardCharsets.UTF_8))
  }

  test("the 7_snowplow layer runs verbatim, twice") {
    val dir = "/root/reference/Datawarehouse-ETL/7_snowplow"
    assume(Files.exists(Paths.get(dir)))
    val scripts = scriptsOf(dir)
    assert(scripts.size >= 60, s"expected the full layer, got ${scripts.size}")
    val broken = Set(
      // broken IN THE REFERENCE: 03_commit.sql selects `anonymous_id`
      // from web.page_views_snowplow, but the table as (re)built by
      // 1_page_view/17_page_view.sql (and appended by the positional
      // `INSERT … SELECT *` in 17_page_view_incremental.sql) has no such
      // column anywhere in the corpus — the commit script's 55-column
      // list is stale relative to the table definition and fails on
      // Redshift identically. Its two `*_previous_day` outputs have no
      // downstream consumers.
      "2_sessions/03_commit.sql")
    val (failures, rerun, summary) = LayerHarness.runSeeded(
      spark, "7_snowplow", scripts, Some(Pinned), broken,
      // the Airbyte exclusion list is a one-column publisher list
      // (every reference read is `LOWER(b.publisher)`); frozen, so the
      // repair never parks a span's unqualified session columns on it —
      // each mis-add there made the real owner ambiguous and started a
      // pin war in 2_sessions/00_marketing_details.sql
      neverCols = Set(
        ("staging_airbyte_bi.affiliate_excluded_publishers", "*")),
      log = m => info(s"harness[snowplow]: $m"))
    println(summary)
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty)
  }
}
