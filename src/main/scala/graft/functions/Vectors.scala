package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions over `array<float>` columns.
  *
  * The pairwise hot path (dot/cosine/L2) is evaluated by native Catalyst
  * expressions ([[graft.expressions.VectorCosine]] et al., registered via
  * `spark.sql.extensions=graft.expressions.GraftExtensions`): one compiled
  * loop per pair. The `zip_with`/`aggregate` HOF forms they replace are
  * interpreted per element per pair (~50× slower measured at sf0.1 — the
  * same gap as the hash-sketch expressions); [[dotHof]] is kept only as the
  * declarative parity reference for tests.
  */
object Vectors {

  def dot(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** HOF reference implementation of [[dot]] — parity-test oracle only. */
  private[graft] def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  def cosineSimilarity(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** HOF reference implementation of [[cosineSimilarity]] — parity oracle. */
  private[graft] def cosineSimilarityHof(a: Column, b: Column): Column = {
    val d = dotHof(a, b)
    val n = norm(a) * norm(b)
    when(n === 0, lit(0.0)).otherwise(d / n)
  }

  def l2Distance(a: Column, b: Column): Column =
    call_function("graft_l2", a, b)

  /** Unit-normalize a vector (pre-normalization turns cosine top-k into
    * dot-product top-k — do it once at write time, not per pair).
    */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n === 0, a).otherwise(transform(a, v => (v / n).cast("float")))
  }

  /** Random-hyperplane LSH bit signature for cosine similarity: bit i is
    * sign(v · r_i) with r_i a deterministic pseudo-random hyperplane derived
    * from a fixed seed and the element index. Vectors with high cosine
    * similarity agree on most bits. Evaluated by the native
    * [[graft.expressions.HyperplaneSig]] (one compiled loop; the
    * Column-tree form it replaced expanded to numBits×dim interpreted
    * `element_at` nodes — the 3.4 s/2k-rows hot spot of round 2's q48).
    */
  def hyperplaneLshSignature(vec: Column, numBits: Int, dim: Int): Column =
    call_function("graft_hyperplane_sig", vec, lit(numBits), lit(dim))

  /** Column-tree reference implementation — parity-test oracle only. */
  private[graft] def hyperplaneLshSignatureTree(vec: Column, numBits: Int, dim: Int): Column = {
    val planes = hyperplanes(numBits, dim)
    val bits = planes.zipWithIndex.map { case (plane, i) =>
      val d = dotConst(vec, plane)
      when(d >= 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Dot product against a constant plane without building a literal array
    * (expands to a fixed sum of products — codegen-friendly for small dims).
    */
  private def dotConst(vec: Column, plane: Array[Double]): Column =
    plane.zipWithIndex.map { case (w, i) => element_at(vec, i + 1) * lit(w) }.reduce(_ + _)

  private[graft] def hyperplanes(numBits: Int, dim: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    (0 until numBits).map(_ => Array.fill(dim)(rnd.nextGaussian()))
  }
}
