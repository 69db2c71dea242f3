package graft

import graft.functions.Vectors
import graft.ops.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import sqlImplicits._

  private def eval(c: org.apache.spark.sql.Column): Double =
    spark.range(1).select(c.as("v")).collect()(0).getDouble(0)

  test("vector primitives: dot, norm, cosine, l2") {
    val a = array(lit(1.0), lit(2.0), lit(2.0))
    val b = array(lit(2.0), lit(0.0), lit(0.0))
    assert(eval(Vectors.dot(a, b)) === 2.0)
    assert(eval(Vectors.norm(a)) === 3.0)
    assert(math.abs(eval(Vectors.cosineSimilarity(a, b)) - 2.0 / 6.0) < 1e-12)
    assert(math.abs(eval(Vectors.l2Distance(a, b)) - 3.0) < 1e-12)
    assert(eval(Vectors.cosineSimilarity(a, array(lit(0.0), lit(0.0), lit(0.0)))) === 0.0)
  }

  test("bruteForceTopK returns exact nearest neighbors in rank order") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0)), (1L, Seq(0.9, 0.1)), (2L, Seq(0.0, 1.0)), (3L, Seq(0.7, 0.7))
    ).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id",
      "embedding", k = 2)
      .orderBy("rank").collect().map(r => r.getLong(1)).toSeq
    assert(out === Seq(1L, 3L)) // cos(0,1)≈0.994 > cos(0,3)≈0.707 > cos(0,2)=0
  }

  test("ivfTopK restricts search to cells but keeps self-consistent ranks") {
    val n = 50
    val vecs = (0 until n).map { i =>
      val angle = i * math.Pi / n
      (i.toLong, Seq(math.cos(angle), math.sin(angle)))
    }.toDF("vec_id", "embedding")
    val out = Similarity.ivfTopK(vecs, vecs.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 3, nCells = 4)
    val byQuery = out.collect().groupBy(_.getLong(0))
    // nProbe=1 IVF trades recall: a query alone in its cell returns nothing;
    // all answered queries must come from the query set with bounded k
    assert(byQuery.nonEmpty && byQuery.keySet.subsetOf(Set(0L, 1L, 2L, 3L, 4L)))
    byQuery.values.foreach { rows => assert(rows.length <= 3) }
    // rank within each query is 1..k without gaps
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(3)).sorted.toSeq === (1 to rows.length).toSeq)
    }
  }

  test("ivfTopK nProbe=2 recall vs brute force dominates nProbe=1") {
    val n = 60
    val vecs = (0 until n).map { i =>
      val angle = i * math.Pi / n
      (i.toLong, Seq(math.cos(angle), math.sin(angle)))
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 3)
      .select("query_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(nProbe: Int): Double = {
      val got = Similarity
        .ivfTopK(vecs, queries, "vec_id", "embedding", k = 3, nCells = 6, nProbe = nProbe)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    // probing a second cell can only add candidates → recall is monotone,
    // and on this ring geometry it strictly improves boundary queries
    assert(r2 >= r1, s"recall(2)=$r2 < recall(1)=$r1")
    assert(r2 > 0.6, s"recall(2)=$r2")
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(vecs, queries, "vec_id", "embedding", k = 3, nCells = 4, nProbe = 9)
    }
    // Lloyd-trained centroids (seeded KMeans) at the same nProbe budget:
    // cells follow the data distribution, so recall must not regress vs
    // the naive lowest-id seed pick and must stay well above chance
    def recallKm(nProbe: Int): Double = {
      val got = Similarity
        .ivfTopKKMeans(vecs, queries, "vec_id", "embedding", k = 3, nCells = 6,
          nProbe = nProbe, maxIter = 5)
        .select("query_id", "corpus_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (got & exact).size.toDouble / exact.size
    }
    // wide margin: seeded k-means|| init varies with the fit input's
    // partition layout, so the comparison must tolerate centroid drift
    val km2 = recallKm(2)
    assert(km2 >= r2 - 0.2, s"kmeans recall(2)=$km2 vs naive $r2")
    assert(km2 > 0.5, s"kmeans recall(2)=$km2")
  }

  test("embedding dedup finds a planted near-duplicate vector and drops it") {
    import graft.ops.Dedup
    val base = Seq(1.0, 2.0, 3.0, 4.0)
    val near = Seq(1.01, 2.0, 3.0, 4.0) // cosine ≈ 0.99998
    val far = Seq(-4.0, 3.0, -2.0, 1.0)
    val vecs = Seq((1L, base), (2L, near), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Dedup.embeddingDupPairs(vecs, "vec_id", "embedding", threshold = 0.99)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs === Seq((1L, 2L)))
    val kept = Dedup.embeddingDedup(vecs, "vec_id", "embedding", threshold = 0.99)
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(1L, 3L))
    // identical vectors always share every LSH bucket → pair survives LSH
    val lsh = Dedup.embeddingDupPairsLsh(vecs, "vec_id", "embedding",
      threshold = 0.99, numBits = 8, dim = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(lsh.forall(pairs.contains)) // LSH pairs ⊆ exact pairs
  }

  test("lshTopK candidates agree with brute force on identical vectors") {
    val vecs = Seq(
      (0L, Seq(1.0, 0.0, 0.0, 0.0)), (1L, Seq(1.0, 0.0, 0.0, 0.0)), (2L, Seq(-1.0, 0.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val out = Similarity.lshTopK(vecs, vecs.filter(col("vec_id") === 0), "vec_id", "embedding",
      k = 2, numBits = 8, dim = 4)
      .collect().map(_.getLong(1)).toSeq
    assert(out === Seq(1L)) // identical vector shares every bucket; opposite vector never does
  }
}
