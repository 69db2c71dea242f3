package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine-side equivalent of the
  * reference's Soda YAML checks and monitoring SQL (SURVEY §5;
  * `bi-airflow-prod/business_logic/data_quality/checks/master/subscription.yaml:1-5`,
  * `Datawarehouse-ETL/8_monitoring/system_issues/master_duplicates.sql:6-18`).
  *
  * Each check evaluates to a [[CheckResult]]. The single-check functions
  * each run their own job (fine at interactive cardinality); [[runFused]]
  * — used by the YAML interpreter — evaluates EVERY check over a table in
  * ONE aggregate pass (uniqueness runs as count vs distinct-count inside
  * the same aggregation), so a 10-check table costs one scan, not ten.
  */
object Checks {

  final case class CheckResult(name: String, passed: Boolean, detail: String)

  /** Convert a collected timestamp value to `Instant` regardless of the
    * column's flavor: `TIMESTAMP_LTZ` collects as `java.sql.Timestamp` (or
    * `Instant` under `spark.sql.datetime.java8API.enabled`), `TIMESTAMP_NTZ`
    * as `java.time.LocalDateTime`. NTZ values are interpreted as UTC — the
    * engine pins the session timezone to UTC, so this is consistent with the
    * `timestamp_ltz` casts used in query space.
    */
  private[graft] def tsToInstant(v: Any): java.time.Instant = v match {
    case t: java.sql.Timestamp      => t.toInstant
    case i: java.time.Instant       => i
    case l: java.time.LocalDateTime => l.toInstant(java.time.ZoneOffset.UTC)
    case other => throw new IllegalArgumentException(
      s"not a timestamp value: $other (${other.getClass.getName})")
  }

  /** Declarative check specs for the fused runner. */
  sealed trait Spec
  final case class FreshnessSpec(tsCol: String, maxAgeHours: Long) extends Spec
  final case class RowCountSpec(min: Long, max: Long = Long.MaxValue) extends Spec
  final case class UniqueSpec(keys: Seq[String]) extends Spec
  final case class NotNullSpec(cols: Seq[String]) extends Spec
  final case class ContinuitySpec(dateCol: String) extends Spec
  final case class InvariantSpec(name: String, predicate: Column) extends Spec
  final case class UnrecognizedSpec(text: String) extends Spec

  /** Evaluate every spec in ONE aggregate job over one scan of `df`. */
  def runFused(df: DataFrame, specs: Seq[Spec], now: java.time.Instant): Seq[CheckResult] = {
    if (specs.isEmpty) return Nil
    val aggs = specs.zipWithIndex.flatMap { case (spec, i) =>
      val p = s"c$i"
      spec match {
        case FreshnessSpec(c, _) => Seq(max(col(c)).as(p))
        case RowCountSpec(_, _) => Seq(count(lit(1)).as(p))
        case UniqueSpec(keys) => Seq(
          struct(
            count(lit(1)).as("n"),
            countDistinct(struct(keys.map(col): _*)).as("nd")).as(p))
        case NotNullSpec(cols) => Seq(
          coalesce(sum(when(cols.map(c => col(c).isNull).reduce(_ || _), 1L).otherwise(0L)),
            lit(0L)).as(p))
        case ContinuitySpec(c) => Seq(
          struct(
            min(col(c).cast("date")).as("lo"),
            max(col(c).cast("date")).as("hi"),
            countDistinct(col(c).cast("date")).as("n")).as(p))
        case InvariantSpec(_, pred) => Seq(
          coalesce(sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)), lit(0L)).as(p))
        case UnrecognizedSpec(_) => Seq(lit(null).as(p))
      }
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    specs.zipWithIndex.map { case (spec, i) =>
      val at = row.fieldIndex(s"c$i")
      spec match {
        case FreshnessSpec(c, maxH) =>
          if (row.isNullAt(at)) CheckResult(s"freshness($c)", passed = false, "table empty")
          else {
            val ageH = java.time.Duration
              .between(tsToInstant(row.get(at)), now).toHours
            CheckResult(s"freshness($c)", ageH <= maxH, s"age=${ageH}h max=${maxH}h")
          }
        case RowCountSpec(lo, hi) =>
          val n = row.getLong(at)
          CheckResult("row_count", n >= lo && n <= hi, s"n=$n")
        case UniqueSpec(keys) =>
          val s = row.getStruct(at)
          val extra = s.getLong(0) - s.getLong(1)
          CheckResult(s"unique(${keys.mkString(",")})", extra == 0, s"extra_rows=$extra")
        case NotNullSpec(cols) =>
          val n = row.getLong(at)
          CheckResult(s"not_null(${cols.mkString(",")})", n == 0, s"null_rows=$n")
        case ContinuitySpec(c) =>
          val s = row.getStruct(at)
          if (s.isNullAt(0)) CheckResult(s"continuity($c)", passed = false, "table empty")
          else {
            val expected = java.time.temporal.ChronoUnit.DAYS
              .between(s.getDate(0).toLocalDate, s.getDate(1).toLocalDate) + 1
            val got = s.getLong(2)
            CheckResult(s"continuity($c)", got == expected, s"days=$got expected=$expected")
          }
        case InvariantSpec(name, _) =>
          val n = row.getLong(at)
          CheckResult(name, n == 0, s"violations=$n")
        case UnrecognizedSpec(text) =>
          CheckResult(text, passed = false, "unrecognized check syntax")
      }
    }
  }

  /** freshness(col) < maxAgeHours relative to `now`. */
  def freshness(
      df: DataFrame,
      tsCol: String,
      maxAgeHours: Long,
      now: java.time.Instant): CheckResult = {
    val maxTs = df.agg(max(col(tsCol))).collect()(0)
    if (maxTs.isNullAt(0)) CheckResult(s"freshness($tsCol)", passed = false, "table empty")
    else {
      val ts = tsToInstant(maxTs.get(0))
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
      // ALL of a table's checks run in one fused aggregate pass
      val specs = checkList.asScala.toSeq.map(c => parseSpec(c.trim))
      runFused(df, specs, now).map(r => r.copy(name = s"$table: ${r.name}"))
    }
  }

  private val FreshnessRe = """freshness\((\w+)\)\s*<\s*(\d+)([dh])""".r
  private val RowCountGtRe = """row_count\s*>\s*(\d+)""".r
  private val RowCountBetweenRe = """row_count\s+between\s+(\d+)\s+and\s+(\d+)""".r
  private val UniqueRe = """unique\(([\w,\s]+)\)""".r
  private val NotNullRe = """not_null\(([\w,\s]+)\)""".r
  private val ContinuityRe = """continuity\((\w+)\)""".r

  private def parseSpec(check: String): Spec = check match {
    case FreshnessRe(c, n, unit) =>
      FreshnessSpec(c, if (unit == "d") n.toLong * 24 else n.toLong)
    case RowCountGtRe(n) => RowCountSpec(n.toLong + 1)
    case RowCountBetweenRe(lo, hi) => RowCountSpec(lo.toLong, hi.toLong)
    case UniqueRe(cols) => UniqueSpec(cols.split(",").map(_.trim).toSeq)
    case NotNullRe(cols) => NotNullSpec(cols.split(",").map(_.trim).toSeq)
    case ContinuityRe(c) => ContinuitySpec(c)
    case other => UnrecognizedSpec(other)
  }
}
