package graft
import org.apache.spark.sql.SparkSession

/** Driver bench contract: one JSON line with per-query seconds on
  * SPARK_GRAFT_SF_DIR. Queries run in sorted name order after a warm-up
  * pass (session/JIT init otherwise lands on whichever query runs first);
  * results are forced through the noop sink so every output column is
  * actually computed (count() lets Spark skip projection work).
  *
  * Each query is timed SPARK_GRAFT_BENCH_RUNS times (default 3). The
  * PRIMARY number per query is the MINIMUM of the runs — the steady-state
  * capability measure, robust against co-located load (the round-5 driver
  * artifacts recorded a 16× inflation on one plain right join on
  * byte-identical code; the controlled rerun evaporated it). The medians
  * ride along in "medians", and any query whose max/min spread exceeds 2×
  * is listed in "noisy" — a non-empty list means the HOST was loaded and
  * the numbers need a controlled rerun, not the code a bisect.
  *
  * Run this isolated: not concurrently with `sbt test` or another Spark
  * JVM — the settle sleep only absorbs the tail of a JUST-FINISHED load.
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
    // settle: let warm-up GC/JIT churn and any residual machine load
    // (e.g. a just-finished test JVM) quiesce before the timed section —
    // round-3 and round-5 numbers both needed adjudication against
    // controlled reruns
    System.gc()
    Thread.sleep(sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_MS", "8000").toLong)

    val wall0 = System.nanoTime()
    val results = names.map { name =>
      var failed = false
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { force(name) } catch {
          case e: Throwable =>
            failed = true
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (name, times.head, times(times.size / 2), times.last, failed)
    }
    val wall = (System.nanoTime() - wall0) / 1e9
    // a failed query's (near-zero) time must not masquerade as a fast
    // success: report "failed" in its slot, exclude it from the total,
    // and list it explicitly
    def jmap(f: ((String, Double, Double, Double, Boolean)) => String): String =
      results.map { r =>
        "\"" + r._1 + "\":" + (if (r._5) "\"failed\"" else f(r))
      }.mkString("{", ",", "}")
    val qs = jmap(_._2.toString)
    val medians = jmap(_._3.toString)
    // relative spread alone flags every sub-0.3s query on normal jitter —
    // require half a second of absolute inflation before calling it noise
    val noisy = results
      .filter(r => !r._5 && r._2 > 0 && r._4 / r._2 > 2.0 && r._4 - r._2 > 0.5)
      .map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val failedList = results.filter(_._5).map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val total = results.filterNot(_._5).map(_._2).sum
    // "primary":"min" marks the round-6 methodology change (min-of-runs;
    // earlier rounds reported medians) so cross-round tooling can detect
    // it instead of silently mixing metrics — compare old rounds via
    // "medians"
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","primary":"min","queries":$qs,"medians":$medians,"noisy":$noisy,"failed":$failedList,"sf":"$sfDir","runs":$runs,"wall":$wall}""")
    // the driver captures a BOUNDED TAIL of stdout — the full line above
    // can get its head truncated, losing early queries and the total. A
    // second, compact summary line printed LAST always fits the tail.
    val top5 = results.filterNot(_._5).sortBy(-_._2).take(5)
      .map(r => "\"" + r._1 + "\":" + r._2).mkString("{", ",", "}")
    // stop Spark BEFORE the compact line so no shutdown chatter can land
    // after it; with outputStrategy=StdoutOutput and showSuccess=false
    // (build.sbt) this really is the last stdout line of the sbt run
    spark.stop()
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","primary":"min","nqueries":${results.size},"top5":$top5,"noisy":$noisy,"failed":$failedList,"sf":"$sfDir","runs":$runs,"wall":$wall}""")
    System.out.flush()
  }
}
