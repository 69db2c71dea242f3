package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY §2.15's extension surface — the
  * reference defines zero SQL UDFs, so these demonstrate the engine's
  * `Aggregator[IN, BUF, OUT]` registration path rather than porting any).
  *
  * Aggregators merge associatively, so Spark runs them with map-side
  * partial aggregation like any built-in — the same scale contract.
  */
object Aggregators {

  /** Weighted average with an exact decimal accumulator: the money-safe
    * form of `sum(v*w)/sum(w)` (order-independent, partition-invariant —
    * the same discipline as the engine's decimal money sums).
    */
  object WeightedAvg extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    private val Scale = 6
    private def dec(d: Double): BigDecimal =
      BigDecimal(d).setScale(Scale, BigDecimal.RoundingMode.HALF_UP)
    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) =
      (b._1 + dec(in._1) * dec(in._2), b._2 + dec(in._2))
    override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (BigDecimal, BigDecimal)): Double =
      if (r._2 == BigDecimal(0)) 0.0
      else (r._1 / r._2).setScale(Scale, BigDecimal.RoundingMode.HALF_UP).toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      Encoders.product[(BigDecimal, BigDecimal)]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Longest streak of consecutive true values — a typed aggregate no
    * built-in composes (buffer carries prefix/suffix runs so partial
    * merges compose over ordered segments).
    *
    * ==ORDERING CONTRACT (read this before using)==
    * The merge is only correct when partial buffers combine in the values'
    * logical order — but Spark merges shuffled partials in ARBITRARY order
    * and row order inside a partition is not event-time. This Aggregator
    * is therefore only safe over input that is (a) a single pre-sorted
    * partition, or (b) per-group data sorted within each group's single
    * partition (`repartition(key).sortWithinPartitions(key, ts)` where
    * each group fits one partition). For the general distributed case use
    * [[longestTrueStreakOrdered]], which makes the ordering explicit via a
    * window and is partition-invariant.
    */
  final case class StreakBuf(best: Long, prefix: Long, suffix: Long, len: Long, allTrue: Boolean)

  object LongestTrueStreak extends Aggregator[Boolean, StreakBuf, Long] {
    override def zero: StreakBuf = StreakBuf(0, 0, 0, 0, allTrue = true)
    override def reduce(b: StreakBuf, in: Boolean): StreakBuf =
      merge(b, if (in) StreakBuf(1, 1, 1, 1, allTrue = true) else StreakBuf(0, 0, 0, 1, allTrue = false))
    override def merge(a: StreakBuf, b: StreakBuf): StreakBuf = {
      val joined = a.suffix + b.prefix
      StreakBuf(
        best = math.max(math.max(a.best, b.best), joined),
        prefix = if (a.allTrue) a.len + b.prefix else a.prefix,
        suffix = if (b.allTrue) b.len + a.suffix else b.suffix,
        len = a.len + b.len,
        allTrue = a.allTrue && b.allTrue)
    }
    override def finish(r: StreakBuf): Long = r.best
    override def bufferEncoder: Encoder[StreakBuf] = Encoders.product[StreakBuf]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Longest consecutive-true streak per key with an EXPLICIT ordering —
    * the distributed-safe form of [[LongestTrueStreak]]: gaps-and-islands
    * via two window row_numbers (their difference is constant within a
    * run of trues), then a max over run lengths. Partition-invariant:
    * every shuffle is on the group key, order comes from `orderCols`,
    * never from physical row order. Keys whose column is never true get
    * streak 0.
    */
  def longestTrueStreakOrdered(
      df: org.apache.spark.sql.DataFrame,
      keyCol: String,
      orderCols: Seq[org.apache.spark.sql.Column],
      boolCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wAll = Window.partitionBy(col(keyCol)).orderBy(orderCols: _*)
    val runs = df
      .withColumn("__rn", row_number().over(wAll))
      .filter(col(boolCol))
      .withColumn("__grp",
        col("__rn") - row_number().over(Window.partitionBy(col(keyCol)).orderBy(col("__rn"))))
      .groupBy(col(keyCol), col("__grp"))
      .agg(count(lit(1)).as("__run"))
      .groupBy(col(keyCol))
      .agg(max(col("__run")).as("longest_true_streak"))
    df.select(col(keyCol)).distinct()
      .join(runs, Seq(keyCol), "left")
      .withColumn("longest_true_streak", coalesce(col("longest_true_streak"), lit(0L)))
  }
}
