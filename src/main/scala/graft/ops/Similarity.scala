package graft.ops

import graft.functions.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`), beyond-reference surface per BASELINE.json.
  *
  * Three tiers:
  *   - [[bruteForceTopK]]: exact cosine top-k, O(Q×N) pairs — the oracle
  *     baseline and the right choice when the query set is small enough to
  *     broadcast.
  *   - [[lshTopK]]: random-hyperplane LSH buckets bound the candidate join;
  *     recall traded via number of bucket bits / probes.
  *   - [[ivfTopK]]: IVF-style coarse quantizer (deterministic seed
  *     centroids — SQL-oracle-replicable), search restricted to nProbe
  *     nearest cells — the 100 TB path: fan-out is |Q| × nProbe × cellSize.
  *   - [[ivfTopKKMeans]]: the same topology with Lloyd-trained centroids
  *     (seeded MLlib KMeans over a bounded fit sample).
  */
object Similarity {

  /** Exact cosine top-k: for every query vector, the k nearest corpus
    * vectors. The corpus side is crossJoin-broadcast when queries are few;
    * the ranking is one window per query id.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // cosine scoring is per-pair interpreted HOF work; the nested-loop
    // parallelism equals the stream (corpus) side's partition count
    val c = Ops.spreadForCompute(
      corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cvec")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"))
    val scored = q
      .crossJoin(c)
      .filter(col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Vectors.cosineSimilarity(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** LSH-bucketed ANN: vectors sharing a hyperplane-signature bucket are
    * candidates; top-k within candidates. Recall < 1 by design; increase
    * `numBits` for precision / decrease for recall.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numBits: Int,
      dim: Int): DataFrame = {
    // localCheckpoint both sides: corpus and queries are usually the same
    // table (self-search) — without the barrier the signature subtree is
    // duplicated under each join child and computed twice per row
    val sig = (df: DataFrame, id: String, v: String) =>
      df.select(
        col(idCol).as(id),
        col(vecCol).as(v),
        Vectors.hyperplaneLshSignature(col(vecCol), numBits, dim).as(s"${id}_sig"))
        .localCheckpoint(eager = false)
    val c = sig(corpus, "corpus_id", "cvec")
    val q = sig(queries, "query_id", "qvec")
    val scored = q
      .join(c, col("query_id_sig") === col("corpus_id_sig") && col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Vectors.cosineSimilarity(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** IVF-style ANN: assign every vector to its nearest of `nCells` centroid
    * cells (centroids = deterministic sample of the corpus), then search a
    * query only against the members of its `nProbe` nearest cells.
    *
    * At scale: centroids broadcast (tiny), assignment is a map-side
    * transform, and the candidate join shuffles on cell id — fan-out is
    * nProbe × corpusSize/nCells per query instead of corpusSize. Raising
    * nProbe buys recall linearly in candidate cost (the classic IVF
    * recall/latency dial); the corpus side always indexes at rn=1.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int,
      nProbe: Int = 1): DataFrame = {
    // deterministic centroid pick: lowest ids — oracle-replicable in SQL;
    // [[ivfTopKKMeans]] swaps in trained centroids over the same topology
    val centroids = corpus
      .select(col(idCol).as("cell_id"), col(vecCol).as("centroid"))
      .orderBy(col("cell_id"))
      .limit(nCells)
    ivfTopKWith(centroids, corpus, queries, idCol, vecCol, k, nCells, nProbe)
  }

  /** IVF with Lloyd-trained centroids (MLlib KMeans, cosine distance to
    * match the assignment metric, seeded): the honest coarse quantizer —
    * cells reflect the embedding distribution, so cell-local search finds
    * true neighbors more often than the deterministic seed pick at equal
    * nProbe. At 100 TB pass `fitSampleFraction` (e.g. 1e-4) so the fit
    * runs on a sketch of the distribution — no extra full pass is made
    * here — while assignment still streams the full corpus map-side.
    * Search topology is identical to [[ivfTopK]]. Note: seeded k-means||
    * init is deterministic only for a fixed partitioning of the fit
    * input. If the (sampled) fit data has fewer distinct points than
    * nCells, MLlib returns fewer centers — the nProbe bound validates
    * against the EFFECTIVE cell count.
    */
  def ivfTopKKMeans(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int,
      nProbe: Int = 1,
      maxIter: Int = 5,
      fitSampleFraction: Option[Double] = None): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, "1 <= nProbe <= nCells")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val fitInput = fitSampleFraction
      .map(f => corpus.sample(withReplacement = false, f, seed = 42L))
      .getOrElse(corpus)
      .filter(col(vecCol).isNotNull) // a null embedding would fail the fit
      .select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(42L).setMaxIter(maxIter)
      .setDistanceMeasure("cosine")
      .fit(fitInput)
    val centers = model.clusterCenters.toSeq.zipWithIndex.map { case (c, i) =>
      (i.toLong, c.toArray.toSeq)
    }
    import spark.implicits._
    val centroids = centers.toDF("cell_id", "centroid")
      .select(col("cell_id"),
        col("centroid").cast(corpus.schema(vecCol).dataType).as("centroid"))
    ivfTopKWith(centroids, corpus, queries, idCol, vecCol, k,
      nCells = centers.size, nProbe = nProbe min centers.size)
  }

  private def ivfTopKWith(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nCells: Int,
      nProbe: Int): DataFrame = {
    require(nProbe >= 1 && nProbe <= nCells, "1 <= nProbe <= nCells")

    def assign(df: DataFrame, id: String, v: String, probes: Int): DataFrame = {
      val scored = Ops.spreadForCompute(
          df.select(col(idCol).as(id), col(vecCol).as(v)))
        .crossJoin(broadcast(centroids))
        .withColumn("sim", Vectors.cosineSimilarity(col(v), col("centroid")))
      if (probes == 1) {
        // nearest-cell assignment as a partial-aggregable max_by instead
        // of a row_number window: the nCells candidate rows per vector
        // collapse MAP-SIDE, so the payload vector crosses the exchange
        // once instead of nCells times and the per-vector sort disappears
        // (guide §2.3 aggregate-before-shuffle / §2.4 fewer bytes).
        // max over (sim, -cell_id) ≡ ORDER BY sim DESC, cell_id ASC LIMIT 1
        // (the tiebreak makes the ordering key unique per vector, and a
        // null sim sorts below any value in both forms).
        scored
          .groupBy(col(id))
          .agg(max_by(
            struct(col(v).as("v"), col("cell_id").as("cell")),
            struct(col("sim").as("s"), (-col("cell_id")).as("nc"))).as("best"))
          .select(col(id), col("best.v").as(v), col("best.cell").as(s"${id}_cell"))
      } else {
        val w = Window.partitionBy(col(id)).orderBy(col("sim").desc, col("cell_id"))
        scored
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= probes)
          .select(col(id), col(v), col("cell_id").as(s"${id}_cell"))
      }
    }

    val c = assign(corpus, "corpus_id", "cvec", probes = 1)
    val q = assign(queries, "query_id", "qvec", probes = nProbe)
    val scored = q
      .join(c, col("query_id_cell") === col("corpus_id_cell") && col("query_id") =!= col("corpus_id"))
      .withColumn("cosine", Vectors.cosineSimilarity(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("corpus_id"), round(col("cosine"), 6).as("cosine"), col("rank"))
  }
}
