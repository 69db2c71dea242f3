package graft

import graft.ops.Ops
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import sqlImplicits._

  test("dedupLatest keeps exactly the newest row per key") {
    val df = Seq(
      (1, "2024-01-01 00:00:00", "old"),
      (1, "2024-01-02 00:00:00", "new"),
      (2, "2024-01-01 00:00:00", "only")
    ).toDF("k", "ts", "v").withColumn("ts", col("ts").cast("timestamp"))
    val out = Ops.dedupLatest(df, Seq(col("k")), Seq(col("ts").desc))
      .select("k", "v").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(out.toSeq === Seq((1, "new"), (2, "only")))
  }

  test("asofJoin picks latest right <= left, respects tolerance, keeps unmatched") {
    val left = Seq((1L, 100L, "2024-01-01 10:00:00"), (2L, 100L, "2024-01-01 00:00:30"),
      (3L, 999L, "2024-01-01 10:00:00"))
      .toDF("lid", "k", "lts").withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq((10L, 100L, "2024-01-01 09:00:00"), (11L, 100L, "2024-01-01 09:59:00"),
      (12L, 100L, "2024-01-01 10:00:01"))
      .toDF("rid", "k2", "rts").withColumn("rts", col("rts").cast("timestamp"))
    val out = Ops.asofJoin(left, right, col("k"), col("k2"), col("lts"), col("rts"),
      tolerance = Some(expr("INTERVAL 1 HOUR")), tiebreak = Seq(col("rid")))
      .select("lid", "rid").collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .sorted.toSeq
    // lid=1: rid=11 (latest <= 10:00, within 1h; 12 is in the future)
    // lid=2: no right within [23:00:30, 00:00:30] → null
    // lid=3: key unmatched → null
    assert(out === Seq((1L, 11L), (2L, -1L), (3L, -1L)))
  }

  test("asofJoin inner drops unmatched") {
    val left = Seq((1L, 1L, "2024-01-01 10:00:00"), (2L, 2L, "2024-01-01 10:00:00"))
      .toDF("lid", "k", "lts").withColumn("lts", col("lts").cast("timestamp"))
    val right = Seq((10L, 1L, "2024-01-01 09:00:00"))
      .toDF("rid", "k2", "rts").withColumn("rts", col("rts").cast("timestamp"))
    val out = Ops.asofJoin(left, right, col("k"), col("k2"), col("lts"), col("rts"),
      joinType = "inner")
    assert(out.count() === 1)
  }

  test("dateSpine is inclusive and gap-free") {
    val bounds = Seq(("2024-01-30", "2024-02-02")).toDF("lo", "hi")
    val days = Ops.dateSpine(bounds, col("lo"), col("hi")).collect().map(_.getDate(0).toString)
    assert(days.sorted.toSeq === Seq("2024-01-30", "2024-01-31", "2024-02-01", "2024-02-02"))
  }

  test("sessionize splits on gap and is deterministic under ties") {
    val df = Seq(
      (1L, 10L, "2024-01-01 10:00:00"), (2L, 10L, "2024-01-01 10:10:00"),
      (3L, 10L, "2024-01-01 11:30:00"), // > 30min gap → new session
      (4L, 20L, "2024-01-01 10:00:00")
    ).toDF("eid", "uid", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Ops.sessionize(df, col("uid"), col("ts"), gapSeconds = 1800,
      tiebreak = Seq(col("eid")))
      .select("eid", "session_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 1L)))
  }

  test("topKPerGroup returns at most k rows per group in rank order") {
    val df = Seq((1, 10.0), (1, 30.0), (1, 20.0), (1, 5.0), (2, 1.0)).toDF("g", "v")
    val out = Ops.topKPerGroup(df, Seq(col("g")), Seq(col("v").desc), 2)
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sorted.toSeq
    assert(out === Seq((1, 20.0), (1, 30.0), (2, 1.0)))
  }

  test("fullOuterUsing coalesces keys from both sides") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((2, "x"), (3, "y")).toDF("k", "rv")
    val out = Ops.fullOuterUsing(l, r, Seq("k"))
      .orderBy("k").collect().map(x => (x.getInt(0), x.getString(1), x.getString(2))).toSeq
    assert(out === Seq((1, "a", null), (2, "b", "x"), (3, null, "y")))
  }

  test("pivotEvents derives entity state via MAX-CASE") {
    val e = Seq((1L, "signup", 5.0), (1L, "purchase", 9.0), (1L, "purchase", 7.0), (2L, "view", 1.0))
      .toDF("uid", "et", "v")
    val out = Ops.pivotEvents(e, Seq(col("uid")), Seq(
        "max_purchase" -> when(col("et") === "purchase", col("v")),
        "signed_up" -> when(col("et") === "signup", lit(1))))
      .orderBy("uid").collect()
    assert(out(0).getDouble(1) === 9.0 && out(0).getInt(2) === 1)
    assert(out(1).isNullAt(1) && out(1).isNullAt(2))
  }

  test("highWaterContinue extends per-key indices across increments") {
    val prev = Seq((10L, 5L)).toDF("uid", "max_idx")
    val inc = Seq((10L, "2024-01-01 10:00:00"), (10L, "2024-01-01 11:00:00"),
      (20L, "2024-01-01 10:00:00"))
      .toDF("uid", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = Ops.highWaterContinue(inc, prev, "uid", Seq(col("ts")), "idx")
      .select("uid", "idx").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(out === Seq((10L, 6L), (10L, 7L), (20L, 1L)))
  }

  test("withGroupPercentileExact matches interpolated median semantics") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 20.0)).toDF("g", "v")
    val out = Ops.withGroupPercentileExact(df, Seq("g"), "v", 0.5, "med")
      .select("med").distinct().collect()(0).getDouble(0)
    assert(out === 6.0) // (2+10)/2
  }

  test("withGroupPercentileExact maxGroupSize guard falls back to approx on fat groups") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 20.0)).toDF("g", "v")
    // groups within bound: still the exact interpolated value
    val exact = Ops.withGroupPercentileExact(df, Seq("g"), "v", 0.5, "med",
      maxGroupSize = Some(10L))
      .select("med").distinct().collect()(0).getDouble(0)
    assert(exact === 6.0)
    // a group over the bound: the approx path (bounded memory) kicks in —
    // percentile_approx returns an OBSERVED value, never an interpolation
    val approx = Ops.withGroupPercentileExact(df, Seq("g"), "v", 0.5, "med",
      maxGroupSize = Some(3L))
      .select("med").distinct().collect()(0).getDouble(0)
    assert(Seq(1.0, 2.0, 10.0, 20.0).contains(approx), s"approx=$approx")
  }

  test("guardedPercentileAggs and removeOutliersIqr honor the maxGroupSize switch") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 10.0), ("a", 20.0)).toDF("g", "v")
    // within bound: exact interpolated percentile in a caller-owned agg
    val exact = df.groupBy("g")
      .agg(Ops.guardedPercentileAggs(df, Seq("g"), Some(10L), ("v", 0.5, "med")).head)
      .collect()(0).getDouble(1)
    assert(exact === 6.0)
    // over bound: t-digest returns an observed value, never an interpolation
    val approx = df.groupBy("g")
      .agg(Ops.guardedPercentileAggs(df, Seq("g"), Some(3L), ("v", 0.5, "med")).head)
      .collect()(0).getDouble(1)
    assert(Seq(1.0, 2.0, 10.0, 20.0).contains(approx), s"approx=$approx")
    // IQR fences survive the switch: both paths keep the in-fence rows here
    val wide = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0)).toDF("g", "v")
    val keptExact = Ops.removeOutliersIqr(wide, Seq("g"), "v", 1.5, Some(100L)).count()
    val keptApprox = Ops.removeOutliersIqr(wide, Seq("g"), "v", 1.5, Some(2L)).count()
    assert(keptExact === 4) // 100.0 fenced out
    assert(keptApprox === 4)
  }

  test("changedRows captures rows missing from the last export") {
    val cur = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val last = Seq((2, "b")).toDF("k", "v")
    val out = Ops.changedRows(cur, last).collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(out === Seq((1, "a")))
  }

  test("withGlobalRank/PercentRank: exact ranks with ties, invariant across partitionings") {
    // values with deliberate ties; rank must use SQL RANK tie semantics
    // and be identical no matter how the input is partitioned (regression:
    // un-materialized dual execution of the range exchange let the two
    // branches see different sampled boundaries)
    val values = Seq(5, 1, 3, 3, 9, 7, 3, 1, 8, 6, 2, 2, 4, 9, 0)
    val expectRank = {
      val sorted = values.sorted
      values.map(v => sorted.indexOf(v) + 1) // first index of the tie group
    }
    for (parts <- Seq(1, 2, 7)) {
      val df = values.zipWithIndex.map { case (v, i) => (i, v) }
        .toDF("id", "v").repartition(parts)
      val out = Ops.withGlobalRank(df, Seq(col("v")), "r", numPartitions = 4)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
      values.indices.foreach { i =>
        assert(out(i) === expectRank(i).toLong, s"parts=$parts id=$i")
      }
      val pct = Ops.withGlobalPercentRank(df, Seq(col("v")), "p", numPartitions = 4)
        .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
      values.indices.foreach { i =>
        assert(pct(i) === (expectRank(i) - 1).toDouble / (values.size - 1),
          s"parts=$parts id=$i")
      }
    }
  }
}
