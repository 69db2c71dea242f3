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
      .map(f => f.getFileName.toString -> new String(Files.readAllBytes(f)))
  }

  private def runLayer(name: String, scripts: Seq[(String, String)],
      broken: Set[String] = Set.empty): Unit = {
    val layer = new LayerHarness.Layer(spark, scripts, Some(Pinned),
      broken = broken, log = m => info(s"harness[$name]: $m"))
    val failures = layer.converge()
    println(layer.summaryJson(name, failures))
    failures.foreach { case (n, e) => info(s"FAILED $n: ${e.take(900)}") }
    assert(failures === Map.empty, name)
    val root = Files.createTempDirectory(s"graft-$name").toString
    val rerun = layer.runAll(root)
    rerun.foreach { case (n, e) => info(s"RERUN FAILED $n: ${e.take(900)}") }
    assert(rerun === Map.empty, name)
  }

  test("the 0_ods_core layer runs verbatim, twice") {
    val dir = "/root/reference/Datawarehouse-ETL/0_ods_core"
    assume(Files.exists(Paths.get(dir)))
    runLayer("ods0", scriptsOf(dir))
  }

  test("the 2_ods_risk + 2_ods_catman layers run verbatim, twice") {
    val risk = "/root/reference/Datawarehouse-ETL/2_ods_risk"
    val catman = "/root/reference/Datawarehouse-ETL/2_ods_catman"
    assume(Files.exists(Paths.get(risk)))
    runLayer("ods2", scriptsOf(risk) ++ scriptsOf(catman))
  }
}
