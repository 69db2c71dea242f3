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

  test("json_extract_path_text treats a RUNTIME key as a literal key") {
    // Redshift evaluates each path element per row and treats it as a
    // literal key — a key containing JSONPath metacharacters must not
    // change the path (ADVICE r11: '$.'+key concat did exactly that)
    import spark.implicits._
    val df = Seq(
      ("""{"a.b":"dot","plain":"p"}""", "a.b"),
      ("""{"a.b":"dot","plain":"p"}""", "plain")).toDF("j", "k")
    df.createOrReplaceTempView("jx_runtime")
    val got = spark.sql(
      "SELECT json_extract_path_text(j, k) AS v FROM jx_runtime")
      .collect().map(_.getString(0)).toSeq
    assert(got === Seq("dot", "p"))
  }

  test("COUNT(alias.*) rewrites only for non-nullable-side aliases") {
    import graft.pipeline.RedshiftScript
    val base = "select ps.id, count(ps.*) as c from sch.pay ps group by 1"
    assert(RedshiftScript.fixCountAliasStar(base).contains("count(*)"))
    val innerJoined =
      "select count(b.*) from sch.a a inner join sch.b as b on a.id=b.id"
    assert(RedshiftScript.fixCountAliasStar(innerJoined).contains("count(*)"))
    // nullable side of an outer join: COUNT(t.*) counts matched rows
    // only — must stay untouched so the failure surfaces
    val outerJoined =
      "select count(b.*) from sch.a a left join sch.b b on a.id=b.id"
    assert(RedshiftScript.fixCountAliasStar(outerJoined) === outerJoined)
    // unknown binding (comma-list FROM item): untouched too
    val unknown = "select count(z.*) from sch.a a, sch.z z"
    assert(RedshiftScript.fixCountAliasStar(unknown) === unknown)
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
