package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine-side equivalent of the
  * reference's Soda YAML checks and monitoring SQL (SURVEY §5;
  * `bi-airflow-prod/business_logic/data_quality/checks/master/subscription.yaml:1-5`,
  * `Datawarehouse-ETL/8_monitoring/system_issues/master_duplicates.sql:6-18`).
  *
  * Each check evaluates to a [[CheckResult]]; all checks over one table are
  * fused into a single aggregate pass where possible.
  */
object Checks {

  final case class CheckResult(name: String, passed: Boolean, detail: String)

  /** freshness(col) < maxAgeHours relative to `now`. */
  def freshness(
      df: DataFrame,
      tsCol: String,
      maxAgeHours: Long,
      now: java.time.Instant): CheckResult = {
    val maxTs = df.agg(max(col(tsCol))).collect()(0)
    if (maxTs.isNullAt(0)) CheckResult(s"freshness($tsCol)", passed = false, "table empty")
    else {
      val ts = maxTs.getTimestamp(0).toInstant
      val ageH = java.time.Duration.between(ts, now).toHours
      CheckResult(s"freshness($tsCol)", ageH <= maxAgeHours, s"age=${ageH}h max=${maxAgeHours}h")
    }
  }

  /** row_count between bounds (YAML `row_count > 0` style). */
  def rowCount(df: DataFrame, min: Long, max: Long = Long.MaxValue): CheckResult = {
    val n = df.count()
    CheckResult("row_count", n >= min && n <= max, s"n=$n")
  }

  /** Uniqueness of a key (duplicate detection,
    * `master_duplicates.sql:6-18`): no key with more than one row.
    */
  def unique(df: DataFrame, keys: Seq[String]): CheckResult = {
    val dups = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    CheckResult(s"unique(${keys.mkString(",")})", dups == 0, s"dup_keys=$dups")
  }

  /** No missing dates vs a continuous spine
    * (`missing_dates.sql:3-8`): every day in [min,max] present.
    */
  def dateContinuity(df: DataFrame, dateCol: String): CheckResult = {
    val row = df
      .agg(
        min(col(dateCol).cast("date")).as("lo"),
        max(col(dateCol).cast("date")).as("hi"),
        countDistinct(col(dateCol).cast("date")).as("n"))
      .collect()(0)
    if (row.isNullAt(0)) CheckResult(s"continuity($dateCol)", passed = false, "table empty")
    else {
      val expected = java.time.temporal.ChronoUnit.DAYS
        .between(row.getDate(0).toLocalDate, row.getDate(1).toLocalDate) + 1
      val got = row.getLong(2)
      CheckResult(s"continuity($dateCol)", got == expected, s"days=$got expected=$expected")
    }
  }

  /** Not-null constraint. */
  def notNull(df: DataFrame, cols: Seq[String]): CheckResult = {
    val cond = cols.map(c => col(c).isNull).reduce(_ || _)
    val n = df.filter(cond).count()
    CheckResult(s"not_null(${cols.mkString(",")})", n == 0, s"null_rows=$n")
  }

  /** Arbitrary predicate must hold for all rows. */
  def invariant(df: DataFrame, name: String, predicate: Column): CheckResult = {
    val n = df.filter(!predicate).count()
    CheckResult(name, n == 0, s"violations=$n")
  }

  def runAll(checks: Seq[() => CheckResult]): Seq[CheckResult] = checks.map(_.apply())

  /** Interpret the reference's Soda-style YAML check files
    * (`bi-airflow-prod/business_logic/data_quality/checks/master/subscription.yaml:1-5`):
    *
    * {{{
    * checks for master_subscription:
    *   - freshness(created_date) < 1d
    *   - row_count > 0
    *   - unique(subscription_id)
    *   - not_null(customer_id, status)
    *   - continuity(fact_date)
    * }}}
    *
    * @param resolve table name → DataFrame (catalog lookup or fixture map)
    * @param now     pinned evaluation instant (deterministic reruns —
    *                SURVEY §7.5-2)
    */
  def fromYaml(
      yaml: String,
      resolve: String => DataFrame,
      now: java.time.Instant): Seq[CheckResult] = {
    import scala.jdk.CollectionConverters._
    val root = new org.yaml.snakeyaml.Yaml()
      .load[java.util.Map[String, java.util.List[String]]](yaml)
    root.asScala.toSeq.flatMap { case (header, checkList) =>
      val table = header.trim.stripPrefix("checks for").trim
      val df = resolve(table)
      checkList.asScala.toSeq.map(c => interpret(df, table, c.trim, now))
    }
  }

  private val FreshnessRe = """freshness\((\w+)\)\s*<\s*(\d+)([dh])""".r
  private val RowCountGtRe = """row_count\s*>\s*(\d+)""".r
  private val RowCountBetweenRe = """row_count\s+between\s+(\d+)\s+and\s+(\d+)""".r
  private val UniqueRe = """unique\(([\w,\s]+)\)""".r
  private val NotNullRe = """not_null\(([\w,\s]+)\)""".r
  private val ContinuityRe = """continuity\((\w+)\)""".r

  private def interpret(
      df: DataFrame,
      table: String,
      check: String,
      now: java.time.Instant): CheckResult = {
    def qualify(r: CheckResult) = r.copy(name = s"$table: ${r.name}")
    check match {
      case FreshnessRe(c, n, unit) =>
        val hours = if (unit == "d") n.toLong * 24 else n.toLong
        qualify(freshness(df, c, hours, now))
      case RowCountGtRe(n) => qualify(rowCount(df, n.toLong + 1))
      case RowCountBetweenRe(lo, hi) => qualify(rowCount(df, lo.toLong, hi.toLong))
      case UniqueRe(cols) => qualify(unique(df, cols.split(",").map(_.trim).toSeq))
      case NotNullRe(cols) => qualify(notNull(df, cols.split(",").map(_.trim).toSeq))
      case ContinuityRe(c) => qualify(dateContinuity(df, c))
      case other =>
        CheckResult(s"$table: $other", passed = false, "unrecognized check syntax")
    }
  }
}
