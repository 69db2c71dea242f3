package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: one JSON line with per-query seconds on
  * SPARK_GRAFT_SF_DIR. Queries run in sorted name order after a warm-up
  * pass (session/JIT init otherwise lands on whichever query runs first);
  * results are forced through the noop sink so every output column is
  * actually computed (count() lets Spark skip projection work).
  *
  * Each query is timed SPARK_GRAFT_BENCH_RUNS times (default 3) and the
  * MEDIAN reported — a single-shot measurement once recorded a 7×
  * phantom regression from one GC/JIT stall on byte-identical code. The
  * total is the sum of medians; `wall` carries the true elapsed time.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.expressions.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def force(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.queries.keys.toSeq.sorted
    // warm-up: prime parquet footers, codegen, JIT
    try force(names.head) catch { case _: Throwable => () }

    val wall0 = System.nanoTime()
    val results = names.map { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { force(name) } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      name -> times(times.size / 2)
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"wall":$wall}""")
    spark.stop()
  }
}
