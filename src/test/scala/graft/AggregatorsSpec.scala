package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {
  import sqlImplicits._

  test("WeightedAvg aggregates exactly and registers as a SQL udaf") {
    spark.udf.register("weighted_avg", udaf(Aggregators.WeightedAvg))
    Seq((1.0, 1.0), (3.0, 3.0)).toDF("v", "w").createOrReplaceTempView("wa")
    val out = spark.sql("SELECT weighted_avg(v, w) AS wavg FROM wa").collect()(0).getDouble(0)
    assert(out === 2.5) // (1*1 + 3*3) / 4
    // empty group → 0.0, not NaN
    val empty = spark.sql("SELECT weighted_avg(v, w) FROM wa WHERE v > 99").collect()(0)
    assert(empty.getDouble(0) === 0.0)
  }

  test("LongestTrueStreak is associative across partition splits") {
    val flags = Seq(true, true, false, true, true, true, false, true)
    // typed aggregation over a deliberately multi-partition dataset:
    // ordered-segment merge must reconstruct the global streak
    val ds = spark.createDataset(flags)(sqlImplicits.newBooleanEncoder).repartitionByRange(1, lit(1))
    val result = ds.select(Aggregators.LongestTrueStreak.toColumn).collect()(0)
    assert(result === 3L)
  }
}
