package graft

import graft.functions.{Redshift => R}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Micro-bench for the single-parse JSON claim (SURVEY §2.11 / q51): the
  * reference's idiom re-parses the payload once per extracted field
  * (30–50 `JSON_EXTRACT_PATH_TEXT` calls on one column); the engine's
  * `R.withPayloadFields` parses once per row. Prints one JSON line with
  * both timings and the speedup.
  *
  * Run: `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PayloadBench"`
  */
object PayloadBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fields = (0 until 24).map(i => s"f$i")
    // materialize a 24-field JSON payload table once (both forms read the
    // same parquet input)
    val src = Tables.read(spark, sfDir, "orders")
    val payload = to_json(struct(fields.map(f => concat_ws("_",
      col("o_orderstatus"), col("o_orderkey") % 97, lit(f)).as(f)): _*))
    val dir = java.nio.file.Files.createTempDirectory("payload-bench").toString + "/data"
    src.select(col("o_orderkey"), payload.as("payload")).write.parquet(dir)
    val table = spark.read.parquet(dir)

    val schema = StructType(fields.map(StructField(_, StringType)))
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def forceSingle(): Unit =
      R.withPayloadFields(table, "payload", schema)
        .write.format("noop").mode("overwrite").save()
    def forceRepeated(): Unit =
      table.select(
        (col("o_orderkey") +: fields.map(f =>
          R.jsonExtractPathText(col("payload"), f).as(f))): _*)
        .write.format("noop").mode("overwrite").save()

    forceSingle(); forceRepeated() // warm-up
    val single = (1 to 3).map(_ => time(forceSingle())).min
    val repeated = (1 to 3).map(_ => time(forceRepeated())).min
    println(f"""{"single_parse_sec":$single%.3f,"repeated_parse_sec":$repeated%.3f,"speedup":${repeated / single}%.2f,"fields":${fields.size}}""")
    spark.stop()
  }
}
