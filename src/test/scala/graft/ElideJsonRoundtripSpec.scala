package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [[graft.expressions.ElideJsonRoundtrip]] — the SPARK-32948
  * from_json(to_json(struct)) fold ported to Spark 4's runtime-replaced
  * to_json. Guards: the fold must fire only on exact schema equality with
  * empty options, and folded output must be value-identical to the real
  * serialize+parse path.
  */
class ElideJsonRoundtripSpec extends SparkSpec {
  import sqlImplicits._

  private val schema = StructType(Seq(
    StructField("a", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType),
    StructField("b", BooleanType)))

  // a STATICALLY nullable id (nullif never actually fires at -1, but the
  // optimizer cannot fold it away — range's raw id is non-nullable and
  // every derived field would come out non-nullable, failing the fold's
  // exact-schema guard by design), so the struct is all-nullable like the
  // parse schema
  private def src = spark.range(100).select(nullif(col("id"), lit(-1L)).as("id"))

  private def payload = to_json(struct(
    col("id").as("a"),
    concat(lit("v"), col("id")).as("s"),
    (col("id") * 1.5 - 7).as("d"),
    (col("id") % 2 === 0).as("b")))

  test("fires on an aligned roundtrip: no parse left in the plan") {
    val out = src.select(from_json(payload, schema).as("p"))
      .select("p.a", "p.s", "p.d", "p.b")
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("from_json"), plan)
    assert(!plan.contains("StructsToJsonEvaluator"), plan)
  }

  test("folded values are identical to the materialized parse path") {
    // materializing the JSON string as data (checkpoint) severs the
    // producer from the consumer plan, so the parse really runs
    val strings = src.select(col("id"), payload.as("j")).localCheckpoint()
    val parsed = strings.select(col("id"), from_json(col("j"), schema).as("p"))
      .select(col("id"), col("p.a"), col("p.s"), col("p.d"), col("p.b"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val folded = src.select(col("id"), from_json(payload, schema).as("p"))
      .select(col("id"), col("p.a"), col("p.s"), col("p.d"), col("p.b"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(folded === parsed)
    assert(folded(6) === Seq(6L, "v6", 6 * 1.5 - 7, true))
  }

  test("does NOT fire on schema mismatch (non-nullable field or missing field)") {
    // a non-nullable producer field: struct field type != all-nullable
    // parse schema, so the parse must remain
    val misaligned = spark.range(10).select(
      from_json(
        to_json(struct(col("id").as("a"))), // range's id is non-nullable
        StructType(Seq(StructField("a", LongType)))).as("p"))
      .select("p.a")
    val plan1 = misaligned.queryExecution.optimizedPlan.toString
    assert(plan1.contains("from_json"), plan1)

    // parse schema narrower than the producer struct: field pruning, not
    // the fold, and values still come from a real parse
    val pruned = src.limit(10).select(
      from_json(payload, StructType(Seq(StructField("a", LongType)))).as("p"))
      .select("p.a")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq === (0L until 10L))
  }

  test("does NOT fire when options are present") {
    val withOpts = src.limit(10).select(
      from_json(payload, schema, Map("mode" -> "FAILFAST")).as("p")).select("p.a")
    val plan = withOpts.queryExecution.optimizedPlan.toString
    assert(plan.contains("from_json"), plan)
  }
}
