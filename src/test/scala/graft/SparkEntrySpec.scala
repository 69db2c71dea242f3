package graft

/** Driver-contract guards: the round driver smoke-checks `entry` (rows>0)
  * and joins `queries` with `oracleSql` by key — a typo'd key silently
  * downgrades an operator to the weaker rows-only check.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry (flagship sessionization) returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; rows-only set is the known sketch list") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((o -- q).isEmpty, s"oracle keys without query: ${o -- q}")
    // only the two xxhash64 sketches remain rows-only (not DuckDB-
    // replicable); q38 gained an oracle in round 3 via the fixture-
    // derived media table
    val rowsOnly = q -- o
    assert(rowsOnly === Set("q31_minhash_pairs", "q32_simhash_pairs"),
      s"unexpected rows-only queries: $rowsOnly")
  }

  test("every query builds a plan against sf0.001 (no analysis errors)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, name)
    }
  }
}
