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

  /** [[clean]] plus per-stage surviving-row counts (one action per stage —
    * the audit trail a corpus release needs; use [[clean]] when only the
    * result matters).
    */
  def cleanWithReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Option[Double] = Some(0.3),
      keepLangs: Seq[String] = Nil,
      nearDedup: Boolean = false,
      nearDupThreshold: Double = 0.8): (DataFrame, Seq[StageCount]) = {
    val counts = scala.collection.mutable.ListBuffer.empty[StageCount]
    var cur = docs
      .withColumn("quality_score", Text.qualityScore(col(textCol)))
      .withColumn("lang_pred", Text.languageId(col(textCol)))
    counts += StageCount("input", cur.count())
    minQuality.foreach { q =>
      cur = cur.filter(col("quality_score") >= q)
      counts += StageCount(s"quality>=$q", cur.count())
    }
    if (keepLangs.nonEmpty) {
      cur = cur.filter(col("lang_pred").isin(keepLangs: _*))
      counts += StageCount(s"lang in ${keepLangs.mkString(",")}", cur.count())
    }
    cur = Dedup.exactDedup(cur, idCol, textCol)
    counts += StageCount("exact_dedup", cur.count())
    if (nearDedup) {
      cur = cur.localCheckpoint() // barrier: minhash re-reads the survivors
      cur = Dedup.minhashDedup(cur, idCol, textCol, threshold = nearDupThreshold)
      counts += StageCount(s"near_dedup>=$nearDupThreshold", cur.count())
    }
    (cur, counts.toSeq)
  }
}
