package graft

import graft.io.Writers
import org.apache.spark.sql.functions._

/** Bucketed co-located joins — the DISTKEY story, proven at the plan
  * level: same-key same-count bucketed tables join with zero Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("same-key bucketed tables join without a shuffle") {
    val dir = "/root/testdata/sf0.001"
    Writers.bucketedTable(
      Tables.orders(spark, dir), "b_orders", Seq("o_custkey"), 8, Seq("o_custkey"))
    Writers.bucketedTable(
      Tables.customer(spark, dir), "b_customer", Seq("c_custkey"), 8, Seq("c_custkey"))

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle at all
      assert(plan.contains("SortMergeJoin"), plan)
      // and it still computes the right thing
      assert(joined.count() ===
        Tables.orders(spark, dir).join(
          Tables.customer(spark, dir), col("o_custkey") === col("c_custkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
