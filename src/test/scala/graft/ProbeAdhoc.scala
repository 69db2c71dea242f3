package graft

/** Scratch triage main for ad-hoc SQL behavior checks (not a test). */
object ProbeAdhoc {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    spark.sql("select 1 as k, 'a' as v union all select 1, 'b' union all select 2, 'c'")
      .createOrReplaceTempView("t")
    def tryq(label: String, q: String): Unit =
      try {
        val r = spark.sql(q).collect().toList
        println(s"OK $label -> $r")
      } catch { case e: Exception =>
        println(s"FAIL $label -> ${String.valueOf(e.getMessage).take(200)}")
      }
    tryq("rn-no-order", "select k, row_number() over (partition by k) rn from t")
    tryq("rn-order-lit", "select k, row_number() over (partition by k order by 1) rn from t")
    tryq("rn-order-null", "select k, row_number() over (partition by k order by null) rn from t")
    tryq("rn-order-rand", "select k, row_number() over (partition by k order by random()) rn from t")
    spark.stop()
  }
}
