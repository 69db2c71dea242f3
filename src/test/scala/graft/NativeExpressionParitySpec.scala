package graft

import graft.functions.Text
import org.apache.spark.sql.functions._

/** The native Catalyst expressions (graft.expressions) replace composed
  * HOF/regex formulations that the DuckDB oracles replicate — so the
  * natives must match those formulations exactly. This spec pins parity
  * on generated inputs including unicode, punctuation runs, whitespace
  * variants, and empties.
  */
class NativeExpressionParitySpec extends SparkSpec {
  import sqlImplicits._

  private val rnd = new scala.util.Random(7)
  private val alphabets = Seq(
    "abcdefghij ", // plain words
    "aA bB,.;!?#$ 09", // case + punctuation + digits
    "äöüß é ñ 中文 ", // unicode
    " \t\n  a  b ", // whitespace runs
    "the quick brown fox and some more words here ")
  private val samples: Seq[String] =
    Seq("", " ", "a", "one two", "x,y.z") ++
      (1 to 60).map { _ =>
        val alpha = alphabets(rnd.nextInt(alphabets.length))
        (1 to (1 + rnd.nextInt(80))).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }

  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
    val tokens = split(Text.normalizeForDedup(text), " ")
    val count = size(tokens) - (n - 1)
    when(count > 0 && length(trim(text)) > 0,
      transform(sequence(lit(0), count - 1), i => concat_ws(" ", slice(tokens, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  test("native word shingles == regex-normalized HOF shingles") {
    for (n <- Seq(1, 2, 3)) {
      val df = samples.toDF("text")
        .select(
          col("text"),
          Text.wordShingles(col("text"), n).as("native"),
          hofShingles(col("text"), n).as("hof"))
        .collect()
      df.foreach { r =>
        val native = r.getSeq[String](1).toList
        // the HOF form yields [""] shingles for empty normalized text at
        // n=1 (split("") == [""]); the native form yields none — filter
        val hof = r.getSeq[String](2).toList.filter(_.nonEmpty)
        assert(native === hof, s"text=${r.getString(0)} n=$n")
      }
    }
  }

  test("native jaccard == array_intersect/array_union jaccard") {
    val pairs = (1 to 40).map { _ =>
      def arr() = (0 until rnd.nextInt(12)).map(_ => s"s${rnd.nextInt(8)}")
      (arr(), arr())
    }
    val df = pairs.toDF("a", "b")
      .select(
        Text.jaccard(col("a"), col("b")).as("native"),
        (size(array_intersect(col("a"), col("b"))).cast("double") /
          size(array_union(col("a"), col("b")))).as("hof_raw"),
        size(array_union(col("a"), col("b"))).as("u"))
      .collect()
    df.foreach { r =>
      val hof = if (r.getInt(2) == 0) 0.0 else r.getDouble(1)
      assert(math.abs(r.getDouble(0) - hof) < 1e-12)
    }
  }

  test("native minhash == modular formula over xxhash64") {
    val coeffs = Text.minhashCoefficients(8)
    val p = Text.MinhashPrime
    val df = samples.filter(_.trim.nonEmpty).take(20).toDF("text")
      .select(
        Text.minHashSignature(array_distinct(Text.wordShingles(col("text"), 2)), 8).as("native"),
        array_distinct(Text.wordShingles(col("text"), 2)).as("sh"))
      .collect()
    df.foreach { r =>
      val sh = r.getSeq[String](1)
      if (sh.nonEmpty) {
        val expected = coeffs.map { case (a, b) =>
          sh.map { s =>
            val h = Math.floorMod(
              org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
                org.apache.spark.unsafe.types.UTF8String.fromString(s), 42L), p)
            Math.floorMod(a * h + b, p)
          }.min
        }
        assert(r.getSeq[Long](0).toList === expected.toList)
      }
    }
  }

  test("native cosine/dot/l2 == HOF forms bit-exactly (double arrays)") {
    import graft.functions.Vectors
    val pairs = (1 to 50).map { _ =>
      def arr() = Array.fill(16)(rnd.nextGaussian())
      (arr(), arr())
    } :+ ((Array.fill(16)(0.0), Array.fill(16)(1.0))) // zero-norm edge
    val df = pairs.toDF("a", "b")
      .select(
        Vectors.cosineSimilarity(col("a"), col("b")).as("nat_cos"),
        Vectors.cosineSimilarityHof(col("a"), col("b")).as("hof_cos"),
        Vectors.dot(col("a"), col("b")).as("nat_dot"),
        Vectors.dotHof(col("a"), col("b")).as("hof_dot"),
        Vectors.l2Distance(col("a"), col("b")).as("nat_l2"),
        sqrt(aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v)).as("hof_l2"))
      .collect()
    df.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1)) // bit-exact, not approx
      assert(r.getDouble(2) === r.getDouble(3))
      assert(r.getDouble(4) === r.getDouble(5))
    }
  }

  test("native cosine/dot == HOF forms bit-exactly (float arrays, float-precision products)") {
    import graft.functions.Vectors
    val pairs = (1 to 50).map { _ =>
      def arr() = Array.fill(16)(rnd.nextGaussian().toFloat)
      (arr(), arr())
    }
    val df = pairs.toDF("a", "b")
      .select(
        Vectors.cosineSimilarity(col("a"), col("b")).as("nat_cos"),
        Vectors.cosineSimilarityHof(col("a"), col("b")).as("hof_cos"),
        Vectors.dot(col("a"), col("b")).as("nat_dot"),
        Vectors.dotHof(col("a"), col("b")).as("hof_dot"))
      .collect()
    df.foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1))
      assert(r.getDouble(2) === r.getDouble(3))
    }
  }

  test("native vector exprs: null array and null element poisoning, SQL registration") {
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)), " +
        "graft_cosine(cast(null as array<double>), array(1.0d)), " +
        "graft_cosine(array(1.0d, cast(null as double)), array(1.0d, 2.0d)), " +
        "graft_dot(array(2.0d, 3.0d), array(4.0d, 5.0d)), " +
        "graft_l2(array(0.0d, 3.0d), array(4.0d, 0.0d))").collect()(0)
    assert(r.getDouble(0) === 1.0)
    assert(r.isNullAt(1))
    assert(r.isNullAt(2), s"row=$r")
    assert(r.getDouble(3) === 23.0)
    assert(r.getDouble(4) === 5.0)
    // length mismatch → null (zip_with pads with nulls and poisons the
    // aggregate), NEVER a silently-truncated similarity
    val m = spark.sql(
      "SELECT graft_cosine(array(1.0d), array(1.0d, 2.0d)), " +
        "graft_dot(array(1.0d), array(1.0d, 2.0d)), " +
        "graft_l2(array(1.0d), array(1.0d, 2.0d))").collect()(0)
    assert(m.isNullAt(0) && m.isNullAt(1) && m.isNullAt(2), s"row=$m")
  }

  test("native lang-id / punct / alpha == regex Column forms on fixtures + adversarial text") {
    import graft.functions.Text
    val adversarial = Seq(
      "", " ", "   \t\n ", "!!!", "der die das und ist", "the el le il",
      "¿dónde está? ¡sí!", "größe straße müde", "naïve café déjà-vu",
      "中文 and the of to", "a" * 300, ". , ; : ! ?", "123 456 789",
      "LE LA LES ET EST", " est pas pour ", "mixed the der le el il text")
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
      .unionByName(adversarial.toDF("text"))
    val rows = docs.select(
      col("text"),
      Text.languageId(col("text")).as("nat_lang"),
      Text.languageIdHof(col("text")).as("hof_lang"),
      Text.punctRatio(col("text")).as("nat_p"),
      Text.punctRatioHof(col("text")).as("hof_p"),
      Text.alphaRatio(col("text")).as("nat_a"),
      Text.alphaRatioHof(col("text")).as("hof_a")).collect()
    assert(rows.length > 500)
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getString(1) === r.getString(2), s"lang mismatch on: $t")
      assert(r.getDouble(3) === r.getDouble(4), s"punct mismatch on: $t") // bit-exact
      assert(r.getDouble(5) === r.getDouble(6), s"alpha mismatch on: $t")
    }
  }

  test("native stopword/mean-word-len/subword/normalize == HOF-regex forms on fixtures + adversarial text") {
    import graft.functions.Text
    val adversarial = Seq(
      "", " ", "   \t\n ", "!!!", "the cat sat on the mat", "a1b2 c3",
      "THE AND OF TO", "  the   and\tof\nto  ", "wordthatislong the",
      "¿dónde está? ¡sí!", "größe straße müde", "naïve café déjà-vu",
      "中文 and the of to", "a" * 300, ". , ; : ! ?", "123 456 789",
      "trailing space ", " leading", "tb\fc\rd", "mixed The tHe THE")
    val docs = Tables.read(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"))
      .unionByName(adversarial.toDF("text"))
    val rows = docs.select(
      col("text"),
      Text.stopwordRatio(col("text")).as("nat_sw"),
      Text.stopwordRatioHof(col("text")).as("hof_sw"),
      Text.meanWordLength(col("text")).as("nat_mw"),
      Text.meanWordLengthHof(col("text")).as("hof_mw"),
      Text.subwordTokenEstimate(col("text")).as("nat_sub"),
      Text.subwordTokenEstimateHof(col("text")).as("hof_sub"),
      call_function("graft_normalize_dedup", col("text")).as("nat_norm"),
      Text.normalizeForDedup(col("text")).as("hof_norm")).collect()
    assert(rows.length > 500)
    rows.foreach { r =>
      val t = r.getString(0)
      assert(r.getDouble(1) === r.getDouble(2), s"stopword mismatch on: $t") // bit-exact
      assert(r.getDouble(3) === r.getDouble(4), s"meanlen mismatch on: $t")
      assert(r.getInt(5) === r.getInt(6), s"subword mismatch on: $t")
      assert(r.getString(7) === r.getString(8), s"normalize mismatch on: $t")
    }
  }

  test("native simhash: hamming(0) on self, registered in SQL") {
    val fp = spark.sql(
      "SELECT graft_simhash64(graft_word_shingles('alpha beta gamma delta', 2))").collect()
    assert(fp.length === 1 && !fp(0).isNullAt(0))
    // SQL-string access proves the FunctionRegistry wiring
    val j = spark.sql(
      "SELECT graft_jaccard(array('a','b'), array('b','c'))").collect()(0).getDouble(0)
    assert(math.abs(j - 1.0 / 3.0) < 1e-12)
  }

  test("native hyperplane signature == Column-tree form on the embeddings fixture") {
    val emb = Tables.read(spark, "/root/testdata/sf0.001", "embeddings")
    // both the float fixture column and its double cast — the two input
    // types the dedup/ANN paths feed it
    for (castTo <- Seq("array<float>", "array<double>")) {
      val rows = emb
        .select(
          col("vec_id"),
          graft.functions.Vectors
            .hyperplaneLshSignature(col("embedding").cast(castTo), 8, 64).as("native"),
          graft.functions.Vectors
            .hyperplaneLshSignatureTree(col("embedding").cast(castTo), 8, 64).as("tree"))
        .collect()
      assert(rows.length > 400)
      rows.foreach { r =>
        assert(r.getLong(1) === r.getLong(2), s"sig mismatch doc_id=${r.get(0)} [$castTo]")
      }
    }
    // SQL registration
    val s = spark.sql(
      "SELECT graft_hyperplane_sig(array(1.0D, -2.0D), 4, 2)").collect()(0).getLong(0)
    assert(s >= 0L && s < 16L)
    // NaN components: Spark SQL's >= orders NaN above every number, so
    // the tree form sets every bit — the native loop must agree
    val nan = spark.sql(
      """SELECT graft_hyperplane_sig(array(cast('NaN' as double), 1.0D), 4, 2)""")
      .collect()(0).getLong(0)
    val nanTree = Seq(Tuple1(Seq(Double.NaN, 1.0))).toDF("v")
      .select(graft.functions.Vectors
        .hyperplaneLshSignatureTree(col("v"), 4, 2).as("sig"))
      .collect()(0).getLong(0)
    assert(nan === nanTree, s"NaN parity: native=$nan tree=$nanTree")
  }
}
