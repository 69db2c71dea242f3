package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog layering — the reference's schema convention
  * (`ods_production` → `master` → `dwh_*` → `dm_*` databases; every
  * script reads qualified `schema.table` names, e.g.
  * `Datawarehouse-ETL/3_master/subscription.sql:24-26`).
  *
  * Persistent catalog tables (vs temp views) give cross-session lineage
  * and let `spark.sql` resolve the reference's qualified names directly.
  */
object Catalog {

  def ensureDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")

  /** CREATE TABLE AS with optional date partitioning — the materialized
    * form of a pipeline layer (partitioned layers get partition-pruned
    * reads downstream).
    */
  def saveTable(
      df: DataFrame,
      db: String,
      table: String,
      partitionBy: Seq[String] = Nil): Unit = {
    ensureDatabase(df.sparkSession, db)
    var w = df.write.mode("overwrite").format("parquet")
    if (partitionBy.nonEmpty) w = w.partitionBy(partitionBy: _*)
    w.saveAsTable(s"$db.$table")
  }

  def table(spark: SparkSession, db: String, name: String): DataFrame =
    spark.table(s"$db.$name")

  /** saveAsTable that survives a previous process's leftovers: with an
    * in-memory catalog the warehouse DIRECTORY outlives the catalog entry,
    * and a fresh session's `saveAsTable` then fails with
    * LOCATION_ALREADY_EXISTS. Drop the entry AND clear the default
    * location before writing.
    */
  def replaceTable(df: DataFrame, db: String, table: String): Unit = {
    val spark = df.sparkSession
    ensureDatabase(spark, db)
    spark.sql(s"DROP TABLE IF EXISTS $db.$table")
    val loc = spark.sessionState.catalog.defaultTablePath(
      org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
    val fs = org.apache.hadoop.fs.FileSystem.get(loc, spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(loc), true)
    df.write.mode("overwrite").saveAsTable(s"$db.$table")
  }

  /** The reference's layer ordering (SURVEY §0): lower layers build first. */
  val LayerOrder: Seq[String] =
    Seq("ods_production", "master", "master_historical", "dwh", "dm_reporting")
}
