package graft

import graft.pipeline.RedshiftScript
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._

/** Scratch triage main (not a test) for the SFTP price-data commit cast
  * failure: stages typed fixtures by hand, runs the script statement by
  * statement, and prints every staged/overlay schema before COMMIT.
  */
object ProbeSaturn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    import spark.implicits._
    val root = Files.createTempDirectory("probe-saturn").toString

    def save(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = s"$root/${name.replace('.', '/')}"
      df.write.mode("overwrite").parquet(p)
      val Array(db, t) = name.split("\\.")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
      spark.sql(s"DROP TABLE IF EXISTS `$db`.`$t`")
      spark.catalog.createTable(s"`$db`.`$t`", p, "parquet")
    }

    if (!args.contains("harness")) {
    save("stg_external_apis_dl.saturn_price_data_new",
      Seq(("1", "t", "b", "c", "col", "w", "4006666", 9.99, 19.99, "3", "a"))
        .toDF("id", "title", "brand", "category", "color", "weight", "ean",
          "price", "crossedoutprice", "lieferzeit", "availability"))
    save("ods_production.variant",
      Seq(("4006666", "p1", "v1")).toDF("ean", "product_id", "variant_sku"))
    save("ods_production.product",
      Seq(("p1", "sku1")).toDF("product_id", "product_sku"))
    save("stg_external_apis.saturn_price_data",
      Seq(("9", "9", "t", "b", "c", "col", "w", "4006666", 1.0, 2.0, "3", "a"))
        .toDF("id", "artikelnummer", "title", "brand", "category", "color",
          "weight", "ean", "price", "crossedoutprice", "lieferzeit",
          "availability")
        .withColumn("valid_from", lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
        .withColumn("valid_to", lit(null).cast("timestamp_ntz"))
        .withColumn("is_current", lit(1)))
    }

    val text = new String(Files.readAllBytes(Paths.get(
      "/root/reference/Datawarehouse-ETL/91_External/SFTP/saturn_price_data.sql")),
      java.nio.charset.StandardCharsets.UTF_8)
    if (args.contains("harness")) {
      val layer = new LayerHarness.Layer(spark,
        Seq("saturn_price_data.sql" -> text), Some("2024-06-15"),
        log = m => println(s"harness: $m"))
      val failures = layer.converge()
      failures.foreach { case (n, e) =>
        println(s"FAILED $n :: ${e.replaceAll("\\s+", " ").take(400)}") }
      println("staged schema: " +
        spark.table("stg_external_apis.saturn_price_data").schema.map(f =>
          s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    } else {
      val runner = new RedshiftScript.Runner(spark, root, Some("2024-06-15"))
      val res = runner.run(text)
      res.reports.foreach { r =>
        println(s"== [${r.verb} ${r.target.getOrElse("")}] ok=${r.ok}")
        r.error.foreach(e => println("   ERR " + e.replaceAll("\\s+", " ").take(600)))
      }
      println("final table schema: " +
        spark.table("stg_external_apis.saturn_price_data").schema.map(f =>
          s"${f.name}:${f.dataType.simpleString}").mkString(", "))
    }
    spark.stop()
  }
}
