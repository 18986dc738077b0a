package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F11 full: per-language Indic script normalization followed by NFKC —
  * the reference's `normalize_text` chain (setu/filters.py:388-446),
  * which routes every non-{english,manipuri,santhali,other} document
  * through indic-nlp-library's IndicNormalizerFactory with DEFAULT
  * flags (the nukta/nasal/chandra/vowel-ending kwargs are commented
  * out at setu/filters.py:440-444) and then `unicodedata.normalize
  * ('NFKC', ...)`.
  *
  * Ported rules (public algorithm, indic_nlp_library
  * `normalize/indic_normalize.py`, default-flag path):
  *  - invisible-char cleanup: BOM/BOM2/word-joiner/soft-hyphen removed,
  *    ZWSP and NBSP → space, ZWNJ/ZWJ removed;
  *  - Moses-style punctuation normalization (curly quotes → ASCII,
  *    en/em dashes, ellipsis → "...", doubled apostrophes → quote);
  *  - script rules: `|` → danda (।) for Devanagari/Bengali-script
  *    languages; `:` following a same-script character → that script's
  *    visarga sign;
  *  - precomposed-nukta decomposition (e.g. U+0958 क़ → क + ◌़) falls
  *    out of the final NFKC pass — those codepoints are Unicode
  *    composition exclusions, so no explicit table is needed;
  *  - nasal/chandra/vowel-ending modes are reference-default no-ops.
  *
  * Languages map to scripts via the reference's normalizer_lang table
  * (setu/filters.py:410-433); english/manipuri/santhali/other — and,
  * deviating gracefully from the reference's KeyError, any unknown
  * language — get NFKC only.
  */
object IndicNorm {

  /** One Brahmic script's parameters: codepoint block, visarga sign,
    * whether `|` is read as a danda. */
  final case class Script(blockStart: Int, blockEnd: Int, visarga: Char,
      pipeToDanda: Boolean)

  val Devanagari = Script(0x0900, 0x097F, 'ः', pipeToDanda = true)
  val Bengali    = Script(0x0980, 0x09FF, 'ঃ', pipeToDanda = true)
  val Gurmukhi   = Script(0x0A00, 0x0A7F, 'ਃ', pipeToDanda = false)
  val Gujarati   = Script(0x0A80, 0x0AFF, 'ઃ', pipeToDanda = false)
  val Oriya      = Script(0x0B00, 0x0B7F, 'ଃ', pipeToDanda = false)
  val Tamil      = Script(0x0B80, 0x0BFF, 'ஃ', pipeToDanda = false)
  val Telugu     = Script(0x0C00, 0x0C7F, 'ః', pipeToDanda = false)
  val Kannada    = Script(0x0C80, 0x0CFF, 'ಃ', pipeToDanda = false)
  val Malayalam  = Script(0x0D00, 0x0D7F, 'ഃ', pipeToDanda = false)

  /** setu's normalizer_lang table, keyed by full name AND short code.
    * None = base normalization skipped entirely (NFKC only). Urdu-script
    * languages get the base cleanup but no Brahmic script rules. */
  val langScript: Map[String, Option[Script]] = {
    val byCode: Map[String, Option[Script]] = Map(
      "hi" -> Some(Devanagari), "mr" -> Some(Devanagari),
      "ne" -> Some(Devanagari), "sa" -> Some(Devanagari),
      "kk" -> Some(Devanagari), // setu's "kK" Konkani code
      "as" -> Some(Bengali), "bn" -> Some(Bengali),
      "pa" -> Some(Gurmukhi), "gu" -> Some(Gujarati),
      "or" -> Some(Oriya), "ta" -> Some(Tamil), "te" -> Some(Telugu),
      "kn" -> Some(Kannada), "ml" -> Some(Malayalam),
      "ur" -> None) // Arabic script: base cleanup only (handled below)
    val byName: Map[String, Option[Script]] = Map(
      "assamese" -> Some(Bengali), "bengali" -> Some(Bengali),
      "bodo" -> Some(Devanagari), "dogri" -> Some(Devanagari),
      "gujarati" -> Some(Gujarati), "hindi" -> Some(Devanagari),
      "kannada" -> Some(Kannada), "kashmiri" -> None,
      "konkani" -> Some(Devanagari), "maithili" -> Some(Devanagari),
      "malayalam" -> Some(Malayalam), "marathi" -> Some(Devanagari),
      "nepali" -> Some(Devanagari), "oriya" -> Some(Oriya),
      "punjabi" -> Some(Gurmukhi), "sanskrit" -> Some(Devanagari),
      "sindhi" -> None, "tamil" -> Some(Tamil), "telugu" -> Some(Telugu),
      "urdu" -> None)
    byCode ++ byName
  }

  /** Languages the reference routes around the normalizer entirely. */
  val NfkcOnly = Set("english", "en", "manipuri", "santhali", "other")

  /** Base normalization shared by every script (indic_nlp_library
    * BaseNormalizer.normalize, default flags), replacement order
    * preserved — it matters for the doubled-apostrophe rule. */
  def baseNormalize(text: String): String = {
    val sb = new java.lang.StringBuilder(text.length)
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      c match {
        case '\uFEFF' | '\uFFFE' | '\u2060' | '\u00AD' => // BOM/BOM2/WJ/SHY: drop
        case '\u200B' | '\u00A0' => sb.append(' ') // ZWSP, NBSP
        case '\u200C' | '\u200D' => // ZWNJ, ZWJ: drop
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.toString
      .replace("„", "\"").replace("“", "\"").replace("”", "\"")
      .replace("–", "-").replace("—", " - ")
      .replace("´", "'").replace("‘", "'").replace("‚", "'")
      .replace("’", "'")
      .replace("''", "\"").replace("´´", "\"")
      .replace("…", "...")
  }

  private def applyScript(text: String, sc: Script): String = {
    val piped = if (sc.pipeToDanda) text.replace('|', '।') else text
    // `:` after a same-script char → visarga (single pass, no regex
    // allocation per row).
    val sb = new java.lang.StringBuilder(piped.length)
    var i = 0
    while (i < piped.length) {
      val c = piped.charAt(i)
      if (c == ':' && i > 0) {
        val p = piped.charAt(i - 1).toInt
        if (p >= sc.blockStart && p <= sc.blockEnd) sb.append(sc.visarga)
        else sb.append(c)
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** The normalization route a language resolves to — precomputable per
    * lang value so the per-row path never re-derives it (r15, guide §4:
    * per-row work). */
  sealed trait Route extends Serializable
  case object NfkcRoute extends Route                 // english/unknown: NFKC only
  case object BaseRoute extends Route                 // Urdu-script: base + NFKC
  final case class ScriptRoute(script: Script) extends Route // base + script + NFKC

  def routeFor(lang: String): Route = {
    val key = if (lang == null) "" else lang.toLowerCase
    if (NfkcOnly.contains(key)) NfkcRoute
    else langScript.get(key) match {
      case Some(Some(script)) => ScriptRoute(script)
      case Some(None)         => BaseRoute
      case None               => NfkcRoute // unknown → NFKC only
    }
  }

  def normalizeRouted(text: String, route: Route): String = {
    val pre = route match {
      case NfkcRoute           => text
      case BaseRoute           => baseNormalize(text)
      case ScriptRoute(script) => applyScript(baseNormalize(text), script)
    }
    java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFKC)
  }

  /** The full reference chain for one document. */
  def normalize(text: String, lang: String): String =
    normalizeRouted(text, routeFor(lang))
}

/** Catalyst expression for [[IndicNorm.normalize]] — lang is a per-row
  * column, matching the reference's per-document routing. A NULL lang
  * must NOT null the text (the default binary null-intolerance would
  * silently drop such docs from the pipeline): it falls back to the
  * unknown-language path (NFKC only).
  *
  * r15 hot path (guide §4): the expression was CodegenFallback — the
  * one interpreted island in the pipeline's clean projection — and
  * re-derived the lang route + round-tripped UTF8String→String→
  * UTF8String on every row. Now: (1) codegen'd via the same
  * plan-reference pattern as every other graft expression; (2) the
  * lang→route resolution is cached per distinct lang value (a corpus
  * has a handful); (3) a full-ASCII text whose route provably cannot
  * change it returns UNCHANGED with zero allocation — ASCII has no
  * NFKC (de)compositions, base normalization's only ASCII-visible rule
  * is '' → " (checked), and the script rules need a pipe ('|' → danda,
  * checked) or a preceding same-script (non-ASCII) char for ':' →
  * visarga (impossible in pure ASCII). */
case class IndicNormalize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType

  /** lang value → route, keyed by the raw UTF8String so the hot path
    * never decodes it. Keys are defensively re-materialized on insert
    * (the probe key may point into a reused row buffer). Bounded: an
    * adversarial unbounded-lang feed stops caching and derives per row
    * (the old cost), never grows the heap. */
  @transient private lazy val routes =
    new java.util.concurrent.ConcurrentHashMap[UTF8String, IndicNorm.Route]()
  private val MaxLangs = 1024

  private def routeOf(lang: UTF8String): IndicNorm.Route = {
    if (lang == null) return IndicNorm.NfkcRoute
    val hit = routes.get(lang)
    if (hit != null) return hit
    val r = IndicNorm.routeFor(lang.toString)
    if (routes.size < MaxLangs)
      routes.put(UTF8String.fromString(lang.toString), r)
    r
  }

  /** True when `route` is an identity on this full-ASCII text: scan for
    * the only ASCII-visible rewrite triggers ('' always; '|' when the
    * script reads pipe as danda). NFKC-only routes need no scan. */
  private def asciiIdentity(text: UTF8String, route: IndicNorm.Route): Boolean =
    route match {
      case IndicNorm.NfkcRoute => true
      case _ =>
        val checkPipe = route match {
          case IndicNorm.ScriptRoute(s) => s.pipeToDanda
          case _                        => false
        }
        val n = text.numBytes
        var i = 0
        var prevApos = false
        while (i < n) {
          val x = text.getByte(i)
          if (x == '\'') {
            if (prevApos) return false
            prevApos = true
          } else {
            prevApos = false
            if (checkPipe && x == '|') return false
          }
          i += 1
        }
        true
    }

  def compute(text: UTF8String, lang: UTF8String): UTF8String = {
    val route = routeOf(lang)
    if (text.isFullAscii && asciiIdentity(text, route)) text
    else UTF8String.fromString(IndicNorm.normalizeRouted(text.toString, route))
  }

  override def eval(input: InternalRow): Any = {
    val text = left.eval(input)
    if (text == null) return null
    val lang = right.eval(input)
    compute(text.asInstanceOf[UTF8String],
      if (lang == null) null else lang.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val ref = ctx.addReferenceObj("indicNormalize", this,
      classOf[IndicNormalize].getName)
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val u8 = classOf[UTF8String].getName
    ev.copy(code = code"""
      ${leftGen.code}
      boolean ${ev.isNull} = ${leftGen.isNull};
      $u8 ${ev.value} = null;
      if (!${ev.isNull}) {
        ${rightGen.code}
        ${ev.value} = $ref.compute(${leftGen.value},
          ${rightGen.isNull} ? null : ${rightGen.value});
      }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_indic_normalize"
}
