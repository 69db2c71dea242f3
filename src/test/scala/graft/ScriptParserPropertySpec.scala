package graft

import graft.pipeline.RedshiftScript
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the script parser primitives: whatever the input,
  * the splitter must never lose statement content, split inside
  * strings/comments, or hang. (Seeded ScalaCheck generators sampled by
  * hand — the scalatestplus bridge isn't on the classpath.)
  */
class ScriptParserPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 200)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(body)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(body: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      for {
        a <- ga.apply(Gen.Parameters.default, Seed(i.toLong))
        b <- gb.apply(Gen.Parameters.default, Seed(i.toLong + 10000))
      } body(a, b)
    }

  private val fragment: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.const("'a;b'"),          // semicolon inside a string
    Gen.const("'it''s'"),        // escaped quote
    Gen.const("-- c;omment\n"),  // semicolon inside a line comment
    Gen.const("/* b;lock */"),   // semicolon inside a block comment
    Gen.const("(a, b)"),
    Gen.const(" SELECT x FROM t "),
    Gen.const("\n\t "))

  private val script: Gen[String] =
    Gen.listOf(Gen.oneOf(fragment, Gen.const(";"))).map(_.mkString)

  test("splitStatements: joining the parts back loses no non-separator content") {
    forAll(script) { s =>
      val parts = RedshiftScript.splitStatements(s)
      // every returned part is non-empty after comment stripping and
      // contains no top-level semicolon (re-splitting is a fixpoint)
      parts.foreach { p =>
        assert(RedshiftScript.stripLeadingComments(p).nonEmpty)
        assert(RedshiftScript.splitStatements(p) === Seq(p))
      }
    }
  }

  test("splitStatements never splits inside strings or comments") {
    val s = "SELECT 'x;y' AS a; -- tail;note\nSELECT /* m;id */ 2; SELECT 'q''t;'"
    val parts = RedshiftScript.splitStatements(s)
    assert(parts.size === 3)
    assert(parts(0).contains("'x;y'"))
    assert(parts(2).contains("'q''t;'"))
  }

  test("splitTopKeyword finds only depth-0 keywords outside strings") {
    forAll2(Gen.alphaNumStr.map(_.take(8)), Gen.alphaNumStr.map(_.take(8))) { (a, b) =>
      val (before, after) =
        RedshiftScript.splitTopKeyword(s"(x WHERE $a) tbl WHERE $b = 1", "WHERE")
      assert(before === s"(x WHERE $a) tbl")
      assert(after === Some(s"$b = 1"))
    }
    val (_, none) = RedshiftScript.splitTopKeyword("(SELECT 1 WHERE true) z", "WHERE")
    assert(none.isEmpty)
    val (_, inStr) = RedshiftScript.splitTopKeyword("'a WHERE b' || c", "WHERE")
    assert(inStr.isEmpty)
    // keyword must be word-bounded
    val (_, sub) = RedshiftScript.splitTopKeyword("SOMEWHERE = 1", "WHERE")
    assert(sub.isEmpty)
  }

  test("stripLeadingComments terminates and strips stacked banners") {
    forAll(script) { s => RedshiftScript.stripLeadingComments(s); () }
    assert(RedshiftScript.stripLeadingComments(
      "--a\n--b\n/* c */ \n-- d\nSELECT 1") === "SELECT 1")
  }

  private val dialectToken: Gen[String] = Gen.oneOf(
    "current_date", "sysdate", "to_char(x)", "datediff(day, a, b)",
    "dateadd(month, 1, c)", "current_date - 1", "date_part(dow, d)")

  test("translate: dialect tokens inside string literals and comments survive verbatim") {
    forAll2(dialectToken, Gen.alphaNumStr.map(_.take(8))) { (tok, pad) =>
      val lit = s"'$pad $tok $pad'"
      val lc = s"-- $tok\n"
      val bc = s"/* $tok */"
      val sql = s"SELECT $lit, col $bc FROM t $lc WHERE d < $tok"
      val out = RedshiftScript.translate(sql, currentDate = Some("2024-06-01"))
      // the literal and both comments are byte-identical in the output
      assert(out.contains(lit), s"literal corrupted: $out")
      assert(out.contains(lc.trim), s"line comment corrupted: $out")
      assert(out.contains(bc), s"block comment corrupted: $out")
      // while the SAME token outside them was rewritten
      assert(!out.endsWith(tok), s"un-rewritten tail: $out")
    }
  }

  test("rewriteQualify: no-op without QUALIFY, removes every QUALIFY keyword with it") {
    forAll(script) { s =>
      if (!s.toUpperCase.contains("QUALIFY"))
        assert(RedshiftScript.rewriteQualify(s) === s)
    }
    val in =
      """WITH a AS (SELECT x FROM t QUALIFY row_number() over (order by x) = 1)
        |SELECT * FROM a QUALIFY rank() over (order by x) = 1""".stripMargin
    val out = RedshiftScript.rewriteQualify(in)
    assert(!out.toUpperCase.contains("QUALIFY "))
    assert(out.contains("EXCEPT(__qualify_0)") && out.contains("EXCEPT(__qualify_1)"))
    // a QUALIFY inside a string literal is data, not syntax
    val lit = "SELECT 'use QUALIFY here' FROM t"
    assert(RedshiftScript.rewriteQualify(lit) === lit)
  }
}
