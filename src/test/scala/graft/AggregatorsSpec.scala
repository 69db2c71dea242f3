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

  test("LongestTrueStreak merges ordered segments (single-partition contract)") {
    val flags = Seq(true, true, false, true, true, true, false, true)
    // the Aggregator's documented contract: single pre-sorted partition
    // (Spark merges shuffled partials in arbitrary order — see the
    // ORDERING CONTRACT scaladoc; distributed callers use
    // longestTrueStreakOrdered)
    val ds = spark.createDataset(flags)(sqlImplicits.newBooleanEncoder).repartitionByRange(1, lit(1))
    val result = ds.select(Aggregators.LongestTrueStreak.toColumn).collect()(0)
    assert(result === 3L)
  }

  test("longestTrueStreakOrdered is partition-invariant with explicit ordering") {
    import sqlImplicits._
    val rows = Seq(
      // key a: T T F T T T F T → 3; deliberately out of order in the input
      ("a", 5, true), ("a", 1, true), ("a", 3, false), ("a", 2, true),
      ("a", 4, true), ("a", 6, true), ("a", 7, false), ("a", 8, true),
      // key b: never true → 0
      ("b", 1, false), ("b", 2, false),
      // key c: all true → 4
      ("c", 1, true), ("c", 2, true), ("c", 3, true), ("c", 4, true))
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("k", "ord", "flag").repartition(parts)
      val out = Aggregators.longestTrueStreakOrdered(df, "k", Seq(col("ord")), "flag")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out === Map("a" -> 3L, "b" -> 0L, "c" -> 4L), s"parts=$parts")
    }
  }
}
