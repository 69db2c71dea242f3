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

/** One-pass scan over the WordShingles-style normalization (lowercase,
  * runs of [a-z0-9] are tokens — equivalent to the regex
  * `normalizeForDedup` + split-on-space form for every corpus input; the
  * parity spec pins both on fixtures and adversarial text).
  */
private[expressions] object TokenScanUtil {
  @transient lazy val stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Text.Stopwords.foreach(s.add)
    s
  }
  @transient lazy val maxStopLen: Int = Text.Stopwords.map(_.length).max

  /** (tokenCount, stopwordHits, totalTokenLength) in one pass. */
  def tokenStats(text: String): (Int, Int, Long) = {
    var tokens = 0
    var stops = 0
    var totalLen = 0L
    var runStart = -1
    val sb = new java.lang.StringBuilder(maxStopLen)
    var i = 0
    def closeRun(end: Int): Unit = {
      if (runStart >= 0) {
        val len = end - runStart
        tokens += 1
        totalLen += len
        if (len <= maxStopLen && stopwords.contains(sb.toString)) stops += 1
        sb.setLength(0)
        runStart = -1
      }
    }
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (runStart < 0) runStart = i
        if (i - runStart < maxStopLen) sb.append(c)
      } else closeRun(i)
      i += 1
    }
    closeRun(text.length)
    (tokens, stops, totalLen)
  }

  /** The normalized string itself (tokens joined by single spaces) —
    * byte-equal to the regex `normalizeForDedup` output.
    */
  def normalize(text: String): String = {
    val out = new java.lang.StringBuilder(text.length)
    var inRun = false
    var i = 0
    while (i < text.length) {
      val c = Character.toLowerCase(text.charAt(i))
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (!inRun && out.length > 0) out.append(' ')
        inRun = true
        out.append(c)
      } else inRun = false
      i += 1
    }
    out.toString
  }
}

/** stopword ratio / mean word length over the normalized tokens in one
  * compiled pass — replaces the `split(normalizeForDedup(…))` +
  * interpreted `filter`/`aggregate` lambda forms (two regex passes plus
  * ~|tokens| lambda evaluations per metric per row). `stopword = true`
  * returns stopwordHits/tokens, else totalTokenLength/tokens; 0.0 when
  * the normalized text is empty (the HOF forms divide by split("")'s
  * single empty token — same 0.0).
  */
case class TokenStatRatio(child: Expression, stopword: Boolean)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    TextStatsUtil.checkString(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val (tokens, stops, totalLen) =
      TokenScanUtil.tokenStats(input.asInstanceOf[UTF8String].toString)
    if (tokens == 0) 0.0
    else if (stopword) stops.toDouble / tokens.toDouble
    else totalLen.toDouble / tokens.toDouble
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStatRatio =
    copy(child = newChild)
  override def prettyName: String =
    if (stopword) "graft_stopword_ratio" else "graft_mean_word_len"
}

/** Dedup-normalized text (lowercase, non-[a-z0-9] → space, collapse,
  * trim) in one pass — replaces the two-regexp_replace Column form in
  * the fingerprint hot path (hashed per row in every dedup operator).
  */
case class NormalizeDedup(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    TextStatsUtil.checkString(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      TokenScanUtil.normalize(input.asInstanceOf[UTF8String].toString))

  override protected def withNewChildInternal(newChild: Expression): NormalizeDedup =
    copy(child = newChild)
  override def prettyName: String = "graft_normalize_dedup"
}

/** Subword-token estimate in one code-point pass — replicates
  * `regexp_count(text, '[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\s]')` exactly:
  * the alternatives are disjoint, so the regex scan is equivalent to:
  * a run of ASCII letters counts ceil(run/4) via greedy 4-letter bites,
  * each digit counts 1, each non-ASCII-whitespace other code point
  * counts 1, ASCII whitespace (`\s` = space \t \n \x0B \f \r) skips.
  */
case class SubwordCount(child: Expression)
    extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    TextStatsUtil.checkString(child.dataType, prettyName)

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var count = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) {
        var run = 1
        while (run < 4 && i + run < s.length && {
          val n = s.charAt(i + run)
          (n >= 'A' && n <= 'Z') || (n >= 'a' && n <= 'z')
        }) run += 1
        count += 1
        i += run
      } else if (c >= '0' && c <= '9') {
        count += 1
        i += 1
      } else if (c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
          c == '\f' || c == '\r') {
        i += 1
      } else {
        count += 1
        i += Character.charCount(s.codePointAt(i))
      }
    }
    count
  }

  override protected def withNewChildInternal(newChild: Expression): SubwordCount =
    copy(child = newChild)
  override def prettyName: String = "graft_subword_count"
}
