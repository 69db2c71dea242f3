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
    // a later RIGHT/FULL join null-extends the FROM-bound side too —
    // count(a.*) ≠ count(*) even though `a` looks inner-bound
    val rightJoined =
      "select count(a.*) from sch.a a right join sch.b b on a.id=b.id"
    assert(RedshiftScript.fixCountAliasStar(rightJoined) === rightJoined)
    val fullJoined =
      "select count(a.*) from sch.a a full outer join sch.b b on a.id=b.id"
    assert(RedshiftScript.fixCountAliasStar(fullJoined) === fullJoined)
  }

  test("to_char_rs and date_part_rs expose Redshift patterns") {
    assert(one("to_char_rs(TIMESTAMP '2024-08-05 14:07:00', 'YYYY-MM-DD HH24:MI')")
      === "2024-08-05 14:07")
    assert(one("to_char_rs(DATE '2024-08-05', 'Month')") === "August")
    assert(one("date_part_rs('dow', DATE '2024-08-11')") === 0) // Sunday
  }

  test("aliasBareNullifItems aliases complete items and nothing else") {
    import graft.pipeline.RedshiftScript
    val sql = "select uid, nullif(order_mode,''), nullif(store_id,'')::int, " +
      "coalesce(nullif(status,''), 'x') from t"
    val out = RedshiftScript.aliasBareNullifItems(sql)
    // complete bare item gets its underlying-column alias
    assert(out.contains("nullif(order_mode,'') AS order_mode"))
    // a cast or nesting means the call is not the whole item — untouched
    assert(out.contains("nullif(store_id,'')::int,"))
    assert(out.contains("coalesce(nullif(status,''), 'x')"))
    // no tuple-rendered garbage (the scala.StringBuilder 3-arg append
    // auto-tupling regression: `(wholeSql,0,N)` emitted as text)
    assert(!out.contains("(select uid"))
    assert(out.length < sql.length + 40)
  }

  test("splitSetOpHalves survives wide whitespace inside UNION ALL") {
    val sql = "select a from t1 UNION      \n     ALL select a from t2 " +
      "union all select a from t3"
    val halves = LayerHarness.splitSetOpHalvesImpl(sql)
    assert(halves.size === 3)
    assert(halves.forall(h => h.trim.toLowerCase.startsWith("select") &&
      !h.trim.toLowerCase.startsWith("all")))
    // CTE bodies and subqueries stay intact
    val nested = "with c as (select 1 union all select 2) select * from c"
    assert(LayerHarness.splitSetOpHalvesImpl(nested).size === 1)
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
