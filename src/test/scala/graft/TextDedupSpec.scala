package graft

import graft.functions.Text
import graft.ops.Dedup
import org.apache.spark.sql.functions._

class TextDedupSpec extends SparkSpec {
  import sqlImplicits._

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).collect()(0).get(0)

  test("normalizeForDedup strips punctuation/case/whitespace noise") {
    assert(eval(Text.normalizeForDedup(lit("  Hello,   WORLD!! "))) === "hello world")
  }

  test("wordShingles produces n-grams; short texts yield empty") {
    assert(eval(Text.wordShingles(lit("a b c d"), 3)).asInstanceOf[scala.collection.Seq[String]]
      .toSeq === Seq("a b c", "b c d"))
    assert(eval(Text.wordShingles(lit("a b"), 3)).asInstanceOf[scala.collection.Seq[String]]
      .toSeq === Seq())
  }

  test("jaccard of shingle sets") {
    val j = eval(Text.jaccard(array(lit("a"), lit("b"), lit("c")), array(lit("b"), lit("c"), lit("d"))))
    assert(j.asInstanceOf[Double] === 0.5) // |{b,c}| / |{a,b,c,d}|
    assert(eval(Text.jaccard(array().cast("array<string>"), array().cast("array<string>")))
      .asInstanceOf[Double] === 0.0)
  }

  test("tokenCount and quality signals on edge inputs") {
    assert(eval(Text.tokenCount(lit("one two  three"))) === 3)
    assert(eval(Text.tokenCount(lit(""))) === 0)
    assert(eval(Text.tokenCount(lit("   "))) === 0)
    assert(eval(Text.punctRatio(lit(""))) === 0.0)
    assert(eval(Text.punctRatio(lit("a,b!"))) === 0.5)
    assert(eval(Text.stopwordRatio(lit("the cat sat on the mat"))).asInstanceOf[Double] === 0.5)
  }

  test("languageId recognizes characteristic sentences") {
    assert(eval(Text.languageId(lit("the quick fox jumped over the lazy dog and ran with it")))
      === "en")
    assert(eval(Text.languageId(lit("der Hund ist nicht mit der Katze über die Straße gegangen")))
      === "de")
    assert(eval(Text.languageId(lit("le chat est sur la table et les enfants ne sont pas pour")))
      === "fr")
    assert(eval(Text.languageId(lit("xyz qqq zzz"))) === "und")
  }

  test("minhash signature is deterministic and similarity-correlated") {
    val sigs = Seq(
      ("a", "the quick brown fox jumps over the lazy dog near the river bank today"),
      ("b", "the quick brown fox jumps over the lazy dog near the river bank now"),
      ("c", "completely different words about spark engines and parquet columnar files")
    ).toDF("id", "text")
      .withColumn("sig", Text.minHashSignature(array_distinct(Text.wordShingles(col("text"), 2)), 64))
      .select("id", "sig")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def agree(x: Seq[Long], y: Seq[Long]): Int = x.zip(y).count { case (a, b) => a == b }
    assert(agree(sigs("a"), sigs("b")) > agree(sigs("a"), sigs("c")))
    assert(agree(sigs("a"), sigs("a")) === 64)
  }

  test("exactDedup keeps the min-id representative of duplicate texts") {
    val docs = Seq(
      (5L, "Hello World"), (9L, "hello,   world!"), (2L, "something else")
    ).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(docs, "doc_id", "text").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(2L, 5L))
  }

  test("minhashDupPairs finds a planted near-duplicate; dedup drops it") {
    val base = "the quick brown fox jumps over the lazy dog while the sun sets behind distant hills and birds sing softly in the evening air"
    val near = base.replace("softly", "loudly")
    val docs = Seq((1L, base), (2L, near), (3L, "unrelated content about database engines entirely"))
      .toDF("doc_id", "text")
    val pairs = Dedup.minhashDupPairs(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((1L, 2L)))
    val kept = Dedup.minhashDedup(docs, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L))
  }

  test("minhash recall >= 0.95 on planted near-dups over the documents fixture") {
    // q31/q32 are permanently rows-only in the driver's oracle (xxhash64
    // signatures aren't DuckDB-replicable) — this is their quantitative
    // gate instead: plant a deterministic near-duplicate for every
    // sufficiently long fixture document and require banded-LSH recall.
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
      .filter(length(col("text")) > 200)
      .orderBy(col("doc_id")).limit(200).cache()
    val planted = docs.select(
      (col("doc_id") + 1000000L).as("doc_id"),
      // perturb ~1 token per ~15: drop every 15th word — a strong
      // near-dup under 2-gram shingles (deterministic, no RNG)
      expr("""concat_ws(' ', filter(split(text, ' '), (w, i) -> i % 15 != 7))""")
        .as("text"))
    val corpus = docs.unionByName(planted)
    val pairs = Dedup.minhashDupPairs(corpus, "doc_id", "text",
      shingleSize = 2, numHashes = 64, bands = 16, threshold = 0.5)
      .select(col("id_a"), col("id_b"))
      .filter(col("id_b") === col("id_a") + 1000000L)
    val found = pairs.count()
    val total = docs.count()
    val recall = found.toDouble / total
    info(f"planted-dup recall: $found/$total = $recall%.3f")
    assert(recall >= 0.95, f"recall $recall%.3f below 0.95")
    docs.unpersist()
  }

  test("simhash fingerprints of near-dups are close in Hamming distance") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog near the river bank"),
      ("b", "the quick brown fox jumps over the lazy dog near the river edge"),
      ("c", "spark parquet shuffle partitions codegen catalyst optimizer rules")
    ).toDF("id", "text")
      .withColumn("fp", Text.simHash(Text.wordShingles(col("text"), 2)))
      .select("id", "fp")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(x: Long, y: Long): Int = java.lang.Long.bitCount(x ^ y)
    assert(ham(df("a"), df("b")) < ham(df("a"), df("c")))
  }
}
