package graft

import graft.functions.{Redshift => R}
import org.apache.spark.sql.functions._

/** Golden-value tests for the Redshift-dialect shims (SURVEY §7.5-1: the
  * dialect drift risks — boundary-crossing DATEDIFF, DOW offsets, TO_CHAR
  * patterns — each pinned to hand-computed values).
  */
class RedshiftFunctionsSpec extends SparkSpec {

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("dateDiff counts boundary crossings, not elapsed units") {
    def dd(unit: String, a: String, b: String): Long =
      eval(R.dateDiff(unit, lit(a).cast("timestamp"), lit(b).cast("timestamp")))
        .asInstanceOf[Long]
    assert(dd("month", "2024-01-31", "2024-02-01") === 1L) // 1 day, 1 month boundary
    assert(dd("month", "2024-01-01", "2024-01-31") === 0L) // 30 days, 0 boundaries
    assert(dd("year", "2024-12-31", "2025-01-01") === 1L)
    assert(dd("day", "2024-01-01 23:59:59", "2024-01-02 00:00:01") === 1L)
    assert(dd("hour", "2024-01-01 01:59:00", "2024-01-01 02:01:00") === 1L)
    assert(dd("hour", "2024-01-01 01:01:00", "2024-01-01 01:59:00") === 0L)
    assert(dd("second", "2024-01-01 00:00:00.9", "2024-01-01 00:00:01.1") === 1L)
    assert(dd("quarter", "2024-03-31", "2024-04-01") === 1L)
    assert(dd("day", "2024-01-02", "2024-01-01") === -1L) // negative direction
    // week boundary = SUNDAY (Redshift DATEDIFF counts Sat→Sun
    // transitions, unlike its Monday-based DATE_TRUNC('week')):
    assert(dd("week", "2024-08-10", "2024-08-11") === 1L) // Sat→Sun crosses
    assert(dd("week", "2024-08-11", "2024-08-12") === 0L) // Sun→Mon same week
    assert(dd("week", "2024-08-11", "2024-08-17") === 0L) // Sun→Sat same week
    assert(dd("week", "2024-08-11", "2024-08-18") === 1L) // next Sunday
    assert(dd("week", "2024-08-01", "2024-08-31") === 4L) // Thu → Sat, 4 Sundays between
  }

  test("dateAdd with Redshift argument order and unit aliases") {
    assert(eval(R.dateAdd("day", 30, lit("2024-01-01").cast("timestamp"))).toString
      .startsWith("2024-01-31"))
    assert(eval(R.dateAdd("mon", 1, lit("2024-01-31").cast("timestamp"))).toString
      .startsWith("2024-02-29")) // month-end clamp
    assert(eval(R.dateAdd("h", 25, lit("2024-01-01 00:00:00").cast("timestamp"))).toString
      .startsWith("2024-01-02 01:00"))
  }

  test("datePart dow is 0=Sunday (Redshift), not 1=Sunday (Spark)") {
    assert(eval(R.datePart("dow", lit("2024-08-11").cast("date"))) === 0) // a Sunday
    assert(eval(R.datePart("dow", lit("2024-08-12").cast("date"))) === 1) // Monday
    assert(eval(R.datePart("epoch", lit("1970-01-02 00:00:00").cast("timestamp"))) === 86400L)
    assert(eval(R.datePart("doy", lit("2024-02-01").cast("date"))) === 32)
  }

  test("toChar translates Redshift patterns") {
    val d = lit("2024-08-05 14:07:09").cast("timestamp")
    assert(eval(R.toChar(d, "YYYY-MM-DD")) === "2024-08-05")
    assert(eval(R.toChar(d, "YYYY-MM-DD HH24:MI")) === "2024-08-05 14:07")
    assert(eval(R.toChar(d, "Month")) === "August")
    assert(eval(R.toChar(d, "Day")) === "Monday")
    assert(eval(R.toChar(d, "Dy")) === "Mon")
    assert(eval(R.toChar(d, "d")) === "2") // Redshift 'd': 1=Sunday..7
    assert(eval(R.toChar(d, "HH12:MI SS")) === "02:07 09")
    assert(eval(R.toChar(d, "YYYY/MM")) === "2024/08")
    // month-end clamping parity with Redshift ADD_MONTHS
    assert(eval(add_months(lit("2024-02-29").cast("date"), 12)).toString === "2025-02-28")
  }

  test("splitPart is 1-based and empty-string out of range") {
    assert(eval(R.splitPart(lit("a,b,c"), ",", 2)) === "b")
    assert(eval(R.splitPart(lit("a,b,c"), ",", 9)) === "")
  }

  test("leftStr/rightStr handle short strings") {
    assert(eval(R.leftStr(lit("abc"), 5)) === "abc")
    assert(eval(R.rightStr(lit("abcdef"), 3)) === "def")
    assert(eval(R.rightStr(lit("ab"), 3)) === "ab")
  }

  test("toNumberEu parses locale money strings") {
    assert(eval(R.toNumberEu(lit("1.234,56 €"))) === 1234.56)
    assert(eval(R.toNumberEu(lit("-99,10"))) === -99.10)
  }

  test("decode matches pairs with null-safe equality and default") {
    assert(eval(R.decode(lit("A"), lit("A"), lit("hit"), lit("miss"))) === "hit")
    assert(eval(R.decode(lit("X"), lit("A"), lit("hit"), lit("miss"))) === "miss")
    assert(eval(R.decode(lit(null).cast("string"), lit(null).cast("string"), lit("nullhit"),
      lit("miss"))) === "nullhit")
  }

  test("nvl / emptyAsNull / nvl2") {
    assert(eval(R.nvl(lit(null).cast("string"), lit("fb"))) === "fb")
    assert(eval(R.emptyAsNull(lit(""))) === null)
    assert(eval(R.nvl2(lit("x"), lit("nn"), lit("n"))) === "nn")
  }

  test("jsonExtractPathText navigates nested paths, null on garbage") {
    assert(eval(R.jsonExtractPathText(lit("""{"a":{"b":"v"}}"""), "a", "b")) === "v")
    assert(eval(R.jsonExtractPathText(lit("not json"), "a")) === null)
    assert(eval(R.isValidJson(lit("""{"k":1}"""))) === true)
    assert(eval(R.isValidJson(lit("nope"))) === false)
  }

  test("listAgg variants are deterministic (sorted)") {
    import sqlImplicits._
    val df = Seq("b", "a", "c", "a").toDF("v")
    assert(df.agg(R.listAggDistinct(col("v"), ",")).collect()(0).getString(0) === "a,b,c")
    assert(df.agg(R.listAgg(col("v"), ",")).collect()(0).getString(0) === "a,a,b,c")
  }

  test("convertTimezone interprets UTC-stored timestamps in target zone") {
    // CET is UTC+1 in winter, UTC+2 in summer (CEST)
    assert(eval(R.convertTimezone("CET", lit("2024-01-15 12:00:00").cast("timestamp"))).toString
      .startsWith("2024-01-15 13:00"))
    assert(eval(R.convertTimezone("CET", lit("2024-07-15 12:00:00").cast("timestamp"))).toString
      .startsWith("2024-07-15 14:00"))
  }
}
