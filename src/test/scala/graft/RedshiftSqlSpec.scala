package graft

/** SQL-text entry for the Redshift dialect shims — reference-shaped SQL
  * running through spark.sql with Redshift semantics.
  */
class RedshiftSqlSpec extends SparkSpec {

  private def one(sql: String): Any = spark.sql(s"SELECT $sql AS v").collect()(0).get(0)

  test("datediff_rs has Redshift boundary-crossing semantics in SQL") {
    assert(one("datediff_rs('month', DATE '2024-01-31', DATE '2024-02-01')") === 1L)
    assert(one("datediff_rs('year', DATE '2024-12-31', DATE '2025-01-01')") === 1L)
    // Spark's native 2-arg form is untouched
    assert(one("datediff(DATE '2024-01-02', DATE '2024-01-01')") === 1)
  }

  test("dateadd_rs has Redshift argument order in SQL") {
    assert(one("CAST(dateadd_rs('day', 30, DATE '2024-01-01') AS DATE)").toString === "2024-01-31")
    assert(one("CAST(dateadd_rs('month', 1, DATE '2024-01-31') AS DATE)").toString === "2024-02-29")
  }

  test("json_extract_path_text navigates nested paths from SQL") {
    assert(one("""json_extract_path_text('{"a":{"b":"v"}}', 'a', 'b')""") === "v")
    assert(one("""is_valid_json('{"k":1}')""") === true)
    assert(one("""is_valid_json('nope')""") === false)
    assert(one("""json_extract_array_element_text('["x","y"]', 1)""") === "y")
  }

  test("to_char_rs and date_part_rs expose Redshift patterns") {
    assert(one("to_char_rs(TIMESTAMP '2024-08-05 14:07:00', 'YYYY-MM-DD HH24:MI')")
      === "2024-08-05 14:07")
    assert(one("to_char_rs(DATE '2024-08-05', 'Month')") === "August")
    assert(one("date_part_rs('dow', DATE '2024-08-11')") === 0) // Sunday
  }

  test("a reference-shaped SQL statement runs end-to-end") {
    Tables.events(spark, "/root/testdata/sf0.001").createOrReplaceTempView("stg_events")
    val out = spark.sql(
      """SELECT user_id,
        |  MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase,
        |  datediff_rs('day', MIN(ts), MAX(ts)) AS active_days,
        |  json_extract_path_text(MIN(props), 'k') AS first_k
        |FROM stg_events
        |WHERE is_valid_json(props)
        |GROUP BY user_id""".stripMargin)
    assert(out.count() === 15)
  }
}
