package graft.expressions

import graft.functions.Text
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native single-pass text statistics for the corpus-quality hot path.
  *
  * The Column formulations scan each document once per pattern —
  * language-ID alone is ~40 `regexp_count` scans per row, and the
  * punct/alpha ratios two more. These expressions compute the same
  * values in one compiled pass per row. Semantics are pinned to the
  * Column forms they replace (parity spec over fixture documents +
  * adversarial unicode):
  *
  *   - counts are non-overlapping literal-substring matches advancing by
  *     the full match (= `regexp_count` on a literal pattern);
  *   - the punct class is Java's `\p{Punct}` (the 32 ASCII punctuation
  *     characters), alpha is `[A-Za-z]`, denominators are code-point
  *     counts (Spark `length`);
  *   - the language argmax replicates `greatest(struct(score, lang))`:
  *     max score, ties toward the alphabetically-LAST language, 'und'
  *     when the top score is <= 0.
  */
private[expressions] object TextStatsUtil {
  def countOccurrences(haystack: String, needle: String): Int = {
    if (needle.isEmpty) return 0
    var count = 0
    var from = 0
    var i = haystack.indexOf(needle, from)
    while (i >= 0) {
      count += 1
      from = i + needle.length
      i = haystack.indexOf(needle, from)
    }
    count
  }

  def checkString(dt: DataType, name: String): TypeCheckResult = dt match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$name expects string, got ${other.sql}")
  }
}

/** Heuristic language prediction — one pass over the padded lowercase
  * text instead of ~40 regex scans; profiles shared with
  * [[graft.functions.Text.LangProfiles]] (and thus the DuckDB oracle).
  */
case class LangId(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    TextStatsUtil.checkString(child.dataType, "graft_lang_id")

  @transient private lazy val profiles = Text.LangProfiles

  override protected def nullSafeEval(input: Any): Any = {
    val t = " " + input.asInstanceOf[UTF8String].toLowerCase.toString + " "
    var bestScore = Int.MinValue
    var bestLang: String = null
    profiles.foreach { case (lang, words, chars) =>
      var s = 0
      words.foreach(w => s += TextStatsUtil.countOccurrences(t, " " + w + " "))
      s *= 2
      chars.foreach(ch => s += TextStatsUtil.countOccurrences(t, ch))
      // greatest(struct(score, lang)): ties break toward the
      // alphabetically-last language
      if (s > bestScore || (s == bestScore && lang > bestLang)) {
        bestScore = s
        bestLang = lang
      }
    }
    UTF8String.fromString(if (bestScore <= 0) "und" else bestLang)
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
  override def prettyName: String = "graft_lang_id"
}

/** punct-or-alpha ratio in one code-point pass; `punct = true` counts
  * Java `\p{Punct}` (ASCII), else `[A-Za-z]`. 0.0 for empty text.
  */
case class CharClassRatio(child: Expression, punct: Boolean)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    TextStatsUtil.checkString(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var matched = 0
    var codePoints = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      codePoints += 1
      if (punct) {
        // Java \p{Punct}: !"#$%&'()*+,-./:;<=>?@[\]^_`{|}~
        if (cp < 128 && (
            (cp >= '!' && cp <= '/') || (cp >= ':' && cp <= '@') ||
            (cp >= '[' && cp <= '`') || (cp >= '{' && cp <= '~'))) matched += 1
      } else {
        if ((cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')) matched += 1
      }
      i += Character.charCount(cp)
    }
    if (codePoints == 0) 0.0 else matched.toDouble / codePoints.toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): CharClassRatio =
    copy(child = newChild)
  override def prettyName: String = if (punct) "graft_punct_ratio" else "graft_alpha_ratio"
}
