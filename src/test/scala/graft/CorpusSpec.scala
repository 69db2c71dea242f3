package graft

import graft.ops.Corpus
import org.apache.spark.sql.functions._

/** The end-to-end corpus-cleaning composition, including the MinHash
  * near-dedup stage the DuckDB oracle can't replicate (q56 covers the
  * oracle-checkable prefix of the chain).
  */
class CorpusSpec extends SparkSpec {
  import sqlImplicits._

  test("cleanWithReport: stages drop monotonically and report counts match the outputs") {
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
    val doubled = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
    val (out, report) = Corpus.cleanWithReport(
      doubled, "doc_id", "text",
      minQuality = Some(0.3), keepLangs = Seq("en", "de", "fr"), nearDedup = true)
    assert(report.map(_.stage).head === "input")
    // monotone non-increasing survivors
    assert(report.map(_.rowsAfter) === report.map(_.rowsAfter).sorted.reverse)
    // the doubled corpus loses its planted exact duplicates
    val afterExact = report.find(_.stage == "exact_dedup").get.rowsAfter
    val input = report.head.rowsAfter
    assert(afterExact <= input / 2)
    assert(out.count() === report.last.rowsAfter)
    // every surviving doc kept the original (minimum) id of its dup group
    assert(out.filter(col("doc_id") >= 10000).count() === 0)
    // the observe()-collected filter counts (one materialization, no
    // per-stage count() passes) equal independently recomputed ones
    val scored = doubled
      .withColumn("q", graft.functions.Text.qualityScore(col("text")))
      .withColumn("l", graft.functions.Text.languageId(col("text")))
    assert(report.find(_.stage.startsWith("quality")).get.rowsAfter ===
      scored.filter(col("q") >= 0.3).count())
    assert(report.find(_.stage.startsWith("lang")).get.rowsAfter ===
      scored.filter(col("q") >= 0.3 && col("l").isin("en", "de", "fr")).count())
  }

  test("near-dedup stage drops a planted near-duplicate the exact stage misses") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away today " * 3
    val near = base.replace("lazy", "sleepy") // high-jaccard, not exact-equal
    val docs = Seq((1L, base), (2L, near), (3L, "completely different text entirely"))
      .toDF("doc_id", "text")
    val exactOnly = Corpus.clean(docs, "doc_id", "text",
      minQuality = None, keepLangs = Nil, nearDedup = false)
    val withNear = Corpus.clean(docs, "doc_id", "text",
      minQuality = None, keepLangs = Nil, nearDedup = true, nearDupThreshold = 0.6)
    assert(exactOnly.count() === 3)
    assert(withNear.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
  }
}
