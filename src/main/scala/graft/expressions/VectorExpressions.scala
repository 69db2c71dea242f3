package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector (embedding) hot path.
  *
  * The HOF formulation (`aggregate(zip_with(a, b, ...))`) walks an
  * interpreted expression tree per array element per pair — on a candidate
  * join scoring millions of pairs that tree-walk dominates the query
  * (~19 s of the 60 s sf0.1 bench in round 1). These expressions run the
  * same math as one compiled per-row loop, the same fix that made the
  * MinHash/SimHash sketches viable ([[MinHashSignature]]).
  *
  * Semantics are bit-identical to the HOF forms they replace, including
  * float-element behavior: for `array<float>` inputs Spark's `x * y`
  * lambda multiplies in FLOAT precision and accumulates the float product
  * into a double — the loops below replicate that exactly so existing
  * oracle hash-matches are unaffected.
  */
private[expressions] object VectorExprs {

  def checkPair(l: DataType, r: DataType, name: String): TypeCheckResult =
    (l, r) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == DoubleType || lt == FloatType) && (rt == DoubleType || rt == FloatType) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$name expects two array<float|double> inputs, got $other")
    }

  def elemType(dt: DataType): DataType = dt.asInstanceOf[ArrayType].elementType

  /** Σ product(a_i, b_i) with the product taken in the arrays' element
    * precision (float inputs → float multiply, like Spark's `x * y` on
    * FloatType), accumulated in double. Returns NaN-free Double; null if
    * any touched element is null OR the arrays differ in length — both
    * match the HOF form (`zip_with` pads the shorter array with nulls,
    * which poisons the aggregate), so a mixed-dimension embedding table
    * yields null, never a silently-truncated similarity.
    */
  def dot(a: ArrayData, b: ArrayData, at: DataType, bt: DataType): java.lang.Double = {
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val floatMul = at == FloatType && bt == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (at == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bt == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
      acc += (if (floatMul) (x.toFloat * y.toFloat).toDouble else x * y)
      i += 1
    }
    acc
  }

  /** Σ v_i² with element-precision squaring (see [[dot]]); null-poisoning. */
  def sumSq(a: ArrayData, at: DataType): java.lang.Double = {
    val n = a.numElements()
    val floatMul = at == FloatType
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = if (floatMul) a.getFloat(i).toDouble else a.getDouble(i)
      acc += (if (floatMul) (x.toFloat * x.toFloat).toDouble else x * x)
      i += 1
    }
    acc
  }
}

/** cosine(a, b) = dot / (‖a‖·‖b‖), 0.0 when either norm is 0 — exactly
  * [[graft.functions.Vectors.cosineSimilarity]]'s HOF semantics in one
  * compiled pass over both arrays.
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  // null even on non-null inputs (element-level null poisoning) — the
  // default left.nullable||right.nullable would let the encoder skip the
  // null bit and read 0.0
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkPair(left.dataType, right.dataType, "graft_cosine")

  @transient private lazy val lt = VectorExprs.elemType(left.dataType)
  @transient private lazy val rt = VectorExprs.elemType(right.dataType)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val d = VectorExprs.dot(a, b, lt, rt)
    val na = VectorExprs.sumSq(a, lt)
    val nb = VectorExprs.sumSq(b, rt)
    if (d == null || na == null || nb == null) null
    else {
      // norm(a) * norm(b) as sqrt·sqrt (not sqrt of product) — matches the
      // HOF form bit-for-bit
      val nn = Math.sqrt(na) * Math.sqrt(nb)
      if (nn == 0.0) 0.0 else d / nn
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_cosine"
}

/** Plain dot product (for pre-normalized vectors, where cosine top-k
  * reduces to dot top-k — normalize once at write, score with this).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // element-level null poisoning
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkPair(left.dataType, right.dataType, "graft_dot")

  @transient private lazy val lt = VectorExprs.elemType(left.dataType)
  @transient private lazy val rt = VectorExprs.elemType(right.dataType)

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorExprs.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], lt, rt)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_dot"
}

/** Squared-difference sum → sqrt = L2 distance, element-precision faithful
  * to the HOF form (float inputs: (x-y) and the square both in float).
  */
case class VectorL2(left: Expression, right: Expression)
    extends BinaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // element-level null poisoning
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.checkPair(left.dataType, right.dataType, "graft_l2")

  @transient private lazy val lt = VectorExprs.elemType(left.dataType)
  @transient private lazy val rt = VectorExprs.elemType(right.dataType)

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null // HOF zip_with parity
    val n = a.numElements()
    val floatMath = lt == FloatType && rt == FloatType
    var acc = 0.0
    var i = 0
    var isNull = false
    while (i < n && !isNull) {
      if (a.isNullAt(i) || b.isNullAt(i)) isNull = true
      else {
        val x = if (lt == FloatType) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rt == FloatType) b.getFloat(i).toDouble else b.getDouble(i)
        if (floatMath) {
          val d = x.toFloat - y.toFloat
          acc += (d * d).toDouble
        } else {
          val d = x - y
          acc += d * d
        }
      }
      i += 1
    }
    if (isNull) null else Math.sqrt(acc)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorL2 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_l2"
}

/** Random-hyperplane LSH signature in one compiled pass: bit i of the
  * result is sign(v · r_i) for the deterministic seed-42 gaussian planes
  * from [[graft.functions.Vectors.hyperplanes]] — the SAME planes the
  * DuckDB oracle embeds as literals (`SparkEntry` q48), so results are
  * bit-identical to the Column-tree form this replaces. That form
  * expanded to numBits × dim `element_at` nodes (512 for 8×64) evaluated
  * interpreted per row on BOTH sides of the LSH self-join — the last
  * interpreted-class hot path in the suite.
  *
  * The vector is decoded once into a primitive array, then each plane is
  * a tight double-multiply loop. Elements promote to double before the
  * multiply, matching `element_at(vec, j) * lit(w)` Cast semantics for
  * both float and double arrays.
  */
case class HyperplaneSig(child: Expression, numBits: Int, dim: Int)
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane_sig expects array<float|double>, got ${other.sql}")
  }

  @transient private lazy val planes: Array[Array[Double]] =
    graft.functions.Vectors.hyperplanes(numBits, dim).toArray
  @transient private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    require(arr.numElements() >= dim,
      s"graft_hyperplane_sig: vector has ${arr.numElements()} elements, expected >= $dim")
    val v = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      // a null element poisons every dot product: all bits fall to the
      // `otherwise(0)` branch of the Column-tree form → signature 0
      if (arr.isNullAt(j)) return 0L
      v(j) = if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < numBits) {
      val plane = planes(i)
      var acc = 0.0
      j = 0
      while (j < dim) { acc += v(j) * plane(j); j += 1 }
      // Spark SQL's `>=` orders NaN above every number, so the Column-tree
      // form sets the bit on a NaN dot product — Scala's `acc >= 0` would
      // not; replicate explicitly to keep bit-identity
      if (acc >= 0 || java.lang.Double.isNaN(acc)) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
  override def prettyName: String = "graft_hyperplane_sig"
}
