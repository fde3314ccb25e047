package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.util.Locale
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused one-pass text-analysis kernels.
  *
  * The compositional forms in [[TextFunctions]] are correct and
  * SQL-expressible, but a projection that derives five statistics re-runs
  * `split`/`regexp_replace` per statistic (and the quality score re-derives
  * three of them again) — ~8 regex passes per row. These native expressions
  * compute the same values in ONE pass over the string with precompiled
  * patterns, staying inside whole-stage codegen via static kernels like
  * [[MinHashTokens]]. Semantics are bit-identical to the compositional
  * forms (same `\s+` tokenizer with Java split limit=-1, space-only trim,
  * ASCII character classes, HALF_UP rounding), which the DuckDB oracle
  * verifies end-to-end.
  */
case class TextStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = TextKernelImpl.statsType
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelImpl.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelImpl.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): TextStatsExpr =
    copy(child = newChild)
}

/** One-pass language ID — same marker-word scoring and tie-break as
  * [[TextFunctions.langId]] (counts of non-overlapping `" word "`
  * occurrences in the padded lowercased text; argmax in declaration order;
  * 'und' when nothing fires), without the 16 `regexp_replace` passes. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelImpl.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelImpl.langId($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** One-pass Unicode text normalization: NFC composition, control
  * characters (C0 + DEL) to spaces, whitespace runs collapsed to a single
  * space, ends trimmed. The canonical pre-tokenization cleanup for a
  * crawled corpus — decomposed accents (`e` + U+0301) and composed (`é`)
  * forms fingerprint identically after it, so dedup upstream of this
  * kernel stops treating them as distinct documents. Engine-portable by
  * construction: DuckDB's `nfc_normalize` + the same two regex passes
  * produce byte-identical output (the driver oracle pins it), but here it
  * is one codegen'd pass, not three. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelImpl.normalizeText(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelImpl.normalizeText($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

/** One-pass HTML boilerplate stripping — the first cleanup step on a
  * crawled corpus (C4/CCNet-style): tag spans (`<` up to the first `>`;
  * an unclosed `<` stays literal, exactly the `<[^>]*>` regex rule)
  * become spaces, the five basic entities (`&lt; &gt; &quot; &#39;
  * &amp;`) decode AFTER tag removal (so `&lt;b&gt;` never turns into a
  * live tag, and decoded characters are never re-scanned), whitespace
  * runs collapse to one space, ends trim. Engine-portable by
  * construction: a tag-strip `regexp_replace` + the five `replace`s (in
  * that order, `&amp;` last) + a collapse pass produce identical output
  * in any SQL engine — the `text_strip_html` driver oracle pins it —
  * but here it is one codegen'd scan, not seven string passes. */
case class StripHtmlExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"strip_html requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_html"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelImpl.stripHtml(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelImpl.stripHtml($c)")

  override protected def withNewChildInternal(newChild: Expression): StripHtmlExpr =
    copy(child = newChild)
}

/** One-pass repetition statistics — dup-token fraction and top-bigram
  * fraction fused into one struct. The compositional forms
  * ([[TextFunctions.dupTokenFrac]] / [[TextFunctions.topBigramFrac]])
  * are correct but run through Catalyst's INTERPRETED higher-order
  * functions and allocate one bigram STRING per token plus a per-step
  * struct accumulator — at corpus scale that is pure GC churn (the
  * single-run soak rows swung 31.9–177 s on identical plans). This
  * kernel tokenizes once, counts distinct tokens in a hash set and
  * bigram pairs in a hash map (no sort, no per-step structs), and stays
  * inside whole-stage codegen. Values are identical to the
  * compositional forms (same trim→lower→`\s+` split semantics; bigram
  * keys joined with a single space, which cannot collide because
  * tokens cannot contain whitespace) — pinned by the equivalence spec
  * and the unchanged DuckDB oracle. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = TextKernelImpl.repetitionType
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any =
    TextKernelImpl.repetition(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernelImpl.repetition($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object TextKernelImpl {

  val repetitionType: StructType = StructType(Seq(
    StructField("dup_token_frac", DoubleType, nullable = false),
    StructField("top_bigram_frac", DoubleType, nullable = false)))

  val statsType: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("mean_token_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))

  private val Ws = Pattern.compile("\\s+")
  private val Stopwords: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    TextFunctions.stopwords.foreach(s.add)
    s
  }

  /** Spark `trim` removes only 0x20 space characters — not general \s. */
  private def trimSpaces(s: String): String = {
    var from = 0
    var to = s.length
    while (from < to && s.charAt(from) == ' ') from += 1
    while (to > from && s.charAt(to - 1) == ' ') to -= 1
    s.substring(from, to)
  }

  private def isWs(cp: Int): Boolean = // Java regex \s (ASCII)
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'

  private def isAlnum(cp: Int): Boolean =
    (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')

  private def round4(v: Double): Double =
    new JBigDecimal(v).setScale(4, RoundingMode.HALF_UP).doubleValue()

  /** One pass: (n_tokens, punct_ratio, mean_token_len, stopword_ratio,
    * quality) with the exact semantics of the five compositional columns. */
  def stats(s: UTF8String): InternalRow = {
    val str = s.toString
    // char-class counts in codepoints (matches Spark/DuckDB length())
    var len = 0; var punct = 0; var nonWs = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      len += 1
      if (!isWs(cp)) {
        nonWs += 1
        if (!isAlnum(cp)) punct += 1
      }
      i += Character.charCount(cp)
    }

    val trimmed = trimSpaces(str)
    // Java split with limit -1 = Spark's split(col, "\\s+") semantics
    // (keeps leading/trailing empty tokens around non-space whitespace)
    val tokens = if (trimmed.isEmpty) Array.empty[String] else Ws.split(trimmed, -1)
    val n = tokens.length
    var stopHits = 0
    var t = 0
    while (t < n) {
      if (Stopwords.contains(tokens(t).toLowerCase(Locale.ROOT))) stopHits += 1
      t += 1
    }

    val punctRatio = if (len == 0) 0.0 else punct.toDouble / len
    val meanTokenLen = if (n == 0) 0.0 else nonWs.toDouble / n
    val stopRatio = if (n == 0) 0.0 else stopHits.toDouble / n
    val lengthOk = if (n >= 10 && n <= 1000) 1.0 else if (n > 0) 0.5 else 0.0
    val punctOk = if (punctRatio <= 0.2) 1.0 else 0.0
    val stopOk = if (stopRatio >= 0.05) 1.0 else 0.0
    val quality = round4((lengthOk + punctOk + stopOk) / 3.0)

    new GenericInternalRow(Array[Any](
      n.toLong, punctRatio, meanTokenLen, stopRatio, quality))
  }

  /** One pass: (dup_token_frac, top_bigram_frac) with the exact
    * semantics of the compositional columns — tokens =
    * `split(lower(trim(text)), "\s+")` (Spark split limit −1 keeps
    * empty tokens around non-space leading whitespace; an empty trimmed
    * string yields the single empty token, same as Spark), dup fraction
    * = 1 − distinct/n, bigram fraction = max pair count / (n − 1). */
  def repetition(s: UTF8String): InternalRow = {
    // UTF8String.toLowerCase IS Spark's lower(); trim strips only 0x20,
    // and lowercasing never maps to/from a space, so trim-after-lower
    // equals the compositional lower(trim(...))
    val trimmed = trimSpaces(s.toLowerCase.toString)
    val tokens = Ws.split(trimmed, -1)
    val n = tokens.length
    val seen = new java.util.HashSet[String](math.max(4, n * 2))
    var t = 0
    while (t < n) { seen.add(tokens(t)); t += 1 }
    val dup = if (n == 0) 0.0 else 1.0 - seen.size.toDouble / n
    var top = 0
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      var i = 0
      while (i < n - 1) {
        // tokens cannot contain whitespace, so the space-joined key is
        // collision-free AND byte-identical to the compositional
        // concat_ws(" ", slice(...)) bigram string
        val k = tokens(i) + " " + tokens(i + 1)
        val c = counts.merge(k, 1, (a: Integer, b: Integer) => a + b: Integer)
        if (c > top) top = c
        i += 1
      }
    }
    val bigram = if (n < 2) 0.0 else top.toDouble / (n - 1)
    new GenericInternalRow(Array[Any](dup, bigram))
  }

  private val langLabels: Array[UTF8String] =
    TextFunctions.langMarkers.map(m => UTF8String.fromString(m._1)).toArray
  private val langTokens: Array[Array[String]] =
    TextFunctions.langMarkers.map(_._2.map(w => s" $w ").toArray).toArray
  private val Und = UTF8String.fromString("und")

  /** Non-overlapping left-to-right occurrence count — exactly what the
    * compositional form's `regexp_replace(padded, quoted, " ")` length
    * delta measures (the regex engine also scans the original string and
    * never re-feeds replacements). */
  private def countOccurrences(hay: String, needle: String): Int = {
    var count = 0
    var from = hay.indexOf(needle)
    while (from >= 0) {
      count += 1
      from = hay.indexOf(needle, from + needle.length)
    }
    count
  }

  def langId(s: UTF8String): UTF8String = {
    val padded = " " + s.toString.toLowerCase(Locale.ROOT) + " "
    val scores = new Array[Int](langLabels.length)
    var l = 0
    while (l < langLabels.length) {
      val toks = langTokens(l)
      var w = 0
      while (w < toks.length) {
        scores(l) += countOccurrences(padded, toks(w))
        w += 1
      }
      l += 1
    }
    var best = 0; l = 1
    while (l < scores.length) { if (scores(l) > scores(best)) best = l; l += 1 }
    if (scores(best) <= 0) Und
    else {
      // argmax with first-in-declaration-order tie-break (en > de > fr > es)
      var first = 0
      while (scores(first) != scores(best)) first += 1
      langLabels(first)
    }
  }

  /** NFC composition, then one builder pass: C0/DEL controls and ASCII
    * whitespace become separators, runs of separators collapse to a
    * single space, and the ends are trimmed. Unicode spaces (NBSP etc.)
    * are deliberately preserved — neither Java's nor RE2's `\s` matches
    * them, so preserving keeps the DuckDB oracle byte-identical (their
    * removal is a tokenizer decision, not canonicalization). Surrogate
    * pairs pass through untouched (all comparisons are against ASCII
    * ranges). */
  /** One scan: tag spans to pending-space, entities decoded left-to-right
    * (decoded chars emitted, never re-scanned — equivalent to the
    * sequential replace chain with `&amp;` last, since no decode output
    * re-enters a pattern), whitespace runs collapsed, ends trimmed. */
  def stripHtml(input: UTF8String): UTF8String = {
    val s = input.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var pendingSpace = false
    def emit(c: Char): Unit = {
      if (pendingSpace) { sb.append(' '); pendingSpace = false }
      sb.append(c)
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val close = s.indexOf('>', i)
        if (close >= 0) { // tag span -> one space (collapsed, end-trimmed)
          if (sb.length > 0) pendingSpace = true
          i = close + 1
        } else { emit('<'); i += 1 } // unclosed '<' stays literal
      } else if (c == '&') {
        if (s.startsWith("&lt;", i)) { emit('<'); i += 4 }
        else if (s.startsWith("&gt;", i)) { emit('>'); i += 4 }
        else if (s.startsWith("&quot;", i)) { emit('"'); i += 6 }
        else if (s.startsWith("&#39;", i)) { emit('\''); i += 5 }
        else if (s.startsWith("&amp;", i)) { emit('&'); i += 5 }
        else { emit('&'); i += 1 }
      } else if (isWs(c)) {
        if (sb.length > 0) pendingSpace = true // leading ws never flushes
        i += 1
      } else { emit(c); i += 1 }
    }
    UTF8String.fromString(sb.toString) // trailing ws never flushed = trim
  }

  def normalizeText(input: UTF8String): UTF8String = {
    val s = java.text.Normalizer.normalize(
      input.toString, java.text.Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < 0x20 || c == 0x7F || c == ' ') {
        if (sb.length > 0) pendingSpace = true // leading ws never flushes
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString) // trailing ws never flushed = trim
  }
}

object TextKernels {
  /** All five text statistics as ONE struct column, computed in one pass. */
  def textStats(text: Column): Column =
    Bridge.column(TextStatsExpr(Bridge.expression(text)))

  /** Fused repetition statistics (same values as
    * [[TextFunctions.dupTokenFrac]] + [[TextFunctions.topBigramFrac]]). */
  def repetitionStats(text: Column): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(text)))

  /** Fused language ID (same result as [[TextFunctions.langId]]). */
  def langId(text: Column): Column =
    Bridge.column(LangIdExpr(Bridge.expression(text)))

  /** Fused NFC + control-strip + whitespace-collapse normalization
    * ([[NormalizeTextExpr]]). */
  def normalizeText(text: Column): Column =
    Bridge.column(NormalizeTextExpr(Bridge.expression(text)))

  /** Fused HTML tag-strip + entity decode + whitespace collapse
    * ([[StripHtmlExpr]]). */
  def stripHtml(text: Column): Column =
    Bridge.column(StripHtmlExpr(Bridge.expression(text)))
}
