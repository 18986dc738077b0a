package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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

  /** The full reference chain for one document. */
  def normalize(text: String, lang: String): String = {
    val key = if (lang == null) "" else lang.toLowerCase
    val pre =
      if (NfkcOnly.contains(key)) text
      else langScript.get(key) match {
        case Some(Some(script)) => applyScript(baseNormalize(text), script)
        case Some(None)         => baseNormalize(text) // Urdu-script langs
        case None               => text // unknown → NFKC only
      }
    java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFKC)
  }
}

/** Catalyst expression for [[IndicNorm.normalize]] — lang is a per-row
  * column, matching the reference's per-document routing. A NULL lang
  * must NOT null the text (the default binary null-intolerance would
  * silently drop such docs from the pipeline): it falls back to the
  * unknown-language path (NFKC only). */
case class IndicNormalize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def eval(input: InternalRow): Any = {
    val text = left.eval(input)
    if (text == null) return null
    val lang = right.eval(input)
    UTF8String.fromString(IndicNorm.normalize(
      text.asInstanceOf[UTF8String].toString,
      if (lang == null) null else lang.asInstanceOf[UTF8String].toString))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_indic_normalize"
}
