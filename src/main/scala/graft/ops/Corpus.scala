package graft.ops

import graft.functions.Text
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-corpus cleaning — the composition a C4/CCNet/Gopher
  * style pipeline actually runs, as one engine operator:
  *
  *   quality filter → language filter → exact dedup → (optional) MinHash
  *   near-dedup
  *
  * Each stage is the engine's own primitive ([[graft.functions.Text]],
  * [[Dedup]]); the composition keeps everything declarative, so Catalyst
  * fuses the per-row scoring into the scan and the only shuffles are the
  * two dedup key exchanges. At 100 TB: scoring is map-side (codegen'd
  * regex/aggregate built-ins), exact dedup shuffles once on a 64-bit
  * fingerprint, near-dedup stays band-bucket-local.
  */
object Corpus {

  final case class StageCount(stage: String, rowsAfter: Long)

  /** The cleaning chain, fully lazy (no counts). Stages with `None`/empty
    * parameters are skipped.
    */
  def clean(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Option[Double] = Some(0.3),
      keepLangs: Seq[String] = Nil,
      nearDedup: Boolean = false,
      nearDupThreshold: Double = 0.8): DataFrame = {
    var cur = docs
      .withColumn("quality_score", Text.qualityScore(col(textCol)))
      .withColumn("lang_pred", Text.languageId(col(textCol)))
    minQuality.foreach(q => cur = cur.filter(col("quality_score") >= q))
    if (keepLangs.nonEmpty) cur = cur.filter(col("lang_pred").isin(keepLangs: _*))
    cur = Dedup.exactDedup(cur, idCol, textCol)
    if (nearDedup) cur = Dedup.minhashDedup(cur, idCol, textCol, threshold = nearDupThreshold)
    cur
  }

  /** [[clean]] plus per-stage surviving-row counts — the audit trail a
    * corpus release needs; use [[clean]] when only the result matters.
    *
    * The input/filter-stage counts ride the pipeline's ONE materialization
    * as `observe()` metrics (conditional count_if over the scored rows),
    * not an action per stage: at 100 TB a per-stage `count()` is a full
    * extra pass over the corpus each. Total actions: one `count()` without
    * near-dedup; the (pre-existing) checkpoint barrier plus two cheap
    * cached-partition counts with it.
    */
  def cleanWithReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Option[Double] = Some(0.3),
      keepLangs: Seq[String] = Nil,
      nearDedup: Boolean = false,
      nearDupThreshold: Double = 0.8): (DataFrame, Seq[StageCount]) = {
    val scored = docs
      .withColumn("quality_score", Text.qualityScore(col(textCol)))
      .withColumn("lang_pred", Text.languageId(col(textCol)))
    val qPred = minQuality.map(q => col("quality_score") >= q)
    val lPred = if (keepLangs.nonEmpty) Some(col("lang_pred").isin(keepLangs: _*)) else None
    val obs = org.apache.spark.sql.Observation()
    var metrics = Seq(count(lit(1)).as("input"))
    qPred.foreach(p => metrics :+= count_if(p).as("after_quality"))
    lPred.foreach { lp =>
      metrics :+= count_if(qPred.map(_ && lp).getOrElse(lp)).as("after_lang")
    }
    var cur = scored.observe(obs, metrics.head, metrics.tail: _*)
    qPred.foreach(p => cur = cur.filter(p))
    lPred.foreach(p => cur = cur.filter(p))
    cur = Dedup.exactDedup(cur, idCol, textCol)
    val counts = scala.collection.mutable.ListBuffer.empty[StageCount]
    var exactCount = 0L
    var nearCount = Option.empty[Long]
    if (nearDedup) {
      cur = cur.localCheckpoint() // barrier: minhash re-reads the survivors
      exactCount = cur.count() // cached-partition count, no recompute
      cur = Dedup.minhashDedup(cur, idCol, textCol, threshold = nearDupThreshold)
      nearCount = Some(cur.count())
    } else exactCount = cur.count()
    // the observed metrics materialized with the first action above
    val m = obs.get
    counts += StageCount("input", m("input").asInstanceOf[Long])
    minQuality.foreach(q =>
      counts += StageCount(s"quality>=$q", m("after_quality").asInstanceOf[Long]))
    if (keepLangs.nonEmpty)
      counts += StageCount(s"lang in ${keepLangs.mkString(",")}",
        m("after_lang").asInstanceOf[Long])
    counts += StageCount("exact_dedup", exactCount)
    nearCount.foreach(n => counts += StageCount(s"near_dedup>=$nearDupThreshold", n))
    (cur, counts.toSeq)
  }
}
