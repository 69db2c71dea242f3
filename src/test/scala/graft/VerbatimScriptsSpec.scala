package graft

import graft.pipeline.{Catalog, RedshiftScript}
import org.apache.spark.sql.functions._

/** Assorted single-file verbatim reference scripts beyond the layer runs —
  * each staged from small hand-built fixtures and executed byte-for-byte.
  */
class VerbatimScriptsSpec extends SparkSpec {

  private def root(): String =
    java.nio.file.Files.createTempDirectory("graft-verbatim").toString

  test("gdpr_personal_info.sql: DELETE + INSERT..WITH, listagg DISTINCT, window over aliases") {
    val path = java.nio.file.Paths.get(
      "/root/reference/Datawarehouse-ETL/8_monitoring/gdpr/gdpr_personal_info.sql")
    assume(java.nio.file.Files.exists(path))
    val script = java.nio.file.Files.readString(path)
    import spark.implicits._

    Catalog.replaceTable(Seq(1L, 2L).toDF("customer_id"),
      "staging_google_sheet", "gdpr_input")
    Catalog.replaceTable(
      Seq((1L, "Grover Finance II GmbH"), (1L, "Grover Finance I GmbH"),
        (1L, "Grover Finance II GmbH"), (2L, "SOMETHING ELSE"), (3L, "Grover Finance I GmbH"))
        .toDF("customer_id", "capital_source"),
      "ods_production", "payment_all")
    Catalog.replaceTable(
      Seq((1L, "DE", "10115", "Berlin", "Torstr 1", "DE", "10117", "Berlin", "Mittelstr 2", 100L),
        (1L, "DE", "10115", "Berlin", "Torstr 1", "DE", "10117", "Berlin", "Mittelstr 2", 99L),
        (3L, "AT", "1010", "Wien", "Ring 3", "AT", "1010", "Wien", "Ring 3", 50L))
        .toDF("customer_id", "billingcountry", "billingpostalcode", "billingcity",
          "billingstreet", "shippingcountry", "shippingpostalcode", "shippingcity",
          "shippingstreet", "order_id"),
      "ods_data_sensitive", "customer_order_pii")
    Catalog.replaceTable(
      Seq(
        (1L, "1990-01-01", "Ada", "L", "a@x.de", "+49", true,
          "DE", "berlin", "10115", "torstr", "1", "DE", "berlin", "10117"),
        (2L, "1985-05-05", "Bo", "M", "b@x.de", "+49", false,
          "DE", "hamburg", "20095", "weg", "2", "DE", "hamburg", "20095"),
        (9L, "2000-09-09", "Out", "side", "o@x.de", "+1", true,
          "US", "nyc", "10001", "st", "9", "US", "nyc", "10001"))
        .toDF("customer_id", "birthdate", "first_name", "last_name", "email",
          "phone_number", "email_subscribe", "billing_country", "billing_city",
          "billing_zip", "street", "house_number", "shipping_country",
          "shipping_city", "shipping_zip"),
      "ods_data_sensitive", "customer_pii")
    // the reverse-ETL target pre-exists (hightouch source table)
    Catalog.replaceTable(
      Seq.empty[(Long, String, String, String, String, String, Boolean, String, String, String)]
        .toDF("customer_id", "birthdate", "first_name", "last_name", "email",
          "phone_number", "email_subscribe", "billing_address", "shipping_address",
          "capital_source"),
      "hightouch_sources", "gdpr_personal_info")

    val res = new RedshiftScript.Runner(spark, root()).run(script)
    assert(res.ok, res.reports.filterNot(_.ok).mkString("; "))
    assert(res.reports.map(_.verb) === Seq("DELETE", "INSERT"))
    val out = spark.table("hightouch_sources.gdpr_personal_info").cache()
    assert(out.count() === 2) // only gdpr_input customers (1, 2); 9 excluded
    val c1 = out.filter(col("customer_id") === 1).collect()(0)
    // listagg DISTINCT over the CASE: the two Grover sources, deduped
    val cs = c1.getAs[String]("capital_source")
    assert(cs.split(", ").toSet === Set("Grover Finance I GmbH", "Grover Finance II GmbH"))
    // the PII address (rowno=1 over alias-partitioned window) wins COALESCE
    assert(c1.getAs[String]("billing_address") === "DE,10115,Berlin,Torstr 1")
    val c2 = out.filter(col("customer_id") === 2).collect()(0)
    assert(c2.getAs[String]("capital_source") === null) // non-Grover source → CASE null
    assert(c2.getAs[String]("billing_address").startsWith("DE, Hamburg")) // initcap fallback
    out.unpersist()

    // rerun: DELETE empties, INSERT rebuilds — idempotent
    val res2 = new RedshiftScript.Runner(spark, root()).run(script)
    assert(res2.ok, res2.reports.filterNot(_.ok).mkString("; "))
    assert(spark.table("hightouch_sources.gdpr_personal_info").count() === 2)
  }
}
