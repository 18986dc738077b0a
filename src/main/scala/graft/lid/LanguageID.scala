package graft.lid

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Heuristic language identification (SURVEY §2.10). The reference runs
  * a 3-model ensemble (IndicLID + cld3 + NLLB fasttext) under
  * rdd.mapPartitionsWithIndex and hard-majority-votes the results; the
  * model weights aren't portable, so this engine keeps the *semantics* —
  * N independent detectors, per-model output columns, majority vote with
  * a fixed priority order on ties — over deterministic JVM heuristics:
  *
  *  - [[CharNgramDetector]]: cosine over character-trigram profiles
  *    built from embedded seed text (the fasttext analog);
  *  - [[StopwordDetector]]: function-word hit rates (the lexicon analog);
  *  - [[ScriptDetector]]: Unicode-script histogram (script-deterministic
  *    languages resolve here: zh/ja/ko/hi/ar/ru/el...).
  *
  * Tie-break priority: ngram > stopword > script (mirrors the
  * reference's indiclid > cld3 > nllb sort-stability order,
  * setu/lid.py:557-583 — whose probability-threshold branch is vacuous;
  * we deliberately implement the pure majority it actually computes).
  */
final case class LidResult(lang: String, confidence: Double)

trait Detector extends Serializable {
  def name: String
  def detect(text: String): LidResult
}

object ScriptDetector extends Detector {
  val name = "script"
  private[lid] val scriptLang: Map[Character.UnicodeScript, String] = {
    import Character.UnicodeScript._
    Map(HAN -> "zh", HIRAGANA -> "ja", KATAKANA -> "ja", HANGUL -> "ko",
      DEVANAGARI -> "hi", BENGALI -> "bn", TAMIL -> "ta", TELUGU -> "te",
      KANNADA -> "kn", MALAYALAM -> "ml", GUJARATI -> "gu",
      GURMUKHI -> "pa", ORIYA -> "or",
      ARABIC -> "ar", CYRILLIC -> "ru", GREEK -> "el", HEBREW -> "he",
      THAI -> "th", GEORGIAN -> "ka", ARMENIAN -> "hy")
  }
  def detect(text: String): LidResult = {
    if (text.isEmpty) return LidResult("und", 0.0)
    val counts = new java.util.HashMap[String, Int]()
    var letters = 0
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        letters += 1
        val lang = scriptLang.get(Character.UnicodeScript.of(cp)) match {
          case Some(l) => l
          case None =>
            if (Character.UnicodeScript.of(cp) == Character.UnicodeScript.LATIN) "latin"
            else "und"
        }
        counts.merge(lang, 1, _ + _)
      }
      i += Character.charCount(cp)
    }
    if (letters == 0) return LidResult("und", 0.0)
    var bestLang = "und"; var bestN = -1
    counts.forEach((l, n) => if (n > bestN || (n == bestN && l < bestLang)) { bestLang = l; bestN = n })
    val frac = bestN.toDouble / letters
    // Latin script alone can't name a language — weak English default.
    if (bestLang == "latin") LidResult("en", 0.3 * frac)
    else LidResult(bestLang, frac)
  }
}

object StopwordDetector extends Detector {
  val name = "stopword"
  // Inline lists for the European set (tuned for short synthetic text),
  // widened with every SHIPPED stopword lexicon (the reference's
  // filter_data languages — hindi, bengali, …, manipuri) keyed by the
  // mapping resource's preferred short code. Inline entries win on key
  // collision (en/de appear in both).
  private[lid] val lists: Map[String, Set[String]] = {
    val shipped = graft.sources.Lexicons.languages.map { l =>
      val code = graft.sources.LangData.byName.get(l)
        .map(graft.sources.LangData.shortCode).getOrElse(l)
      code -> graft.sources.Lexicons.stopwords(l).toSet
    }.toMap
    shipped ++ Map(
      "en" -> Set("the", "a", "of", "and", "to", "in", "is", "that", "it", "for", "with", "was", "on", "are"),
      "de" -> Set("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für", "auf", "den", "von", "zu"),
      "fr" -> Set("le", "la", "les", "et", "est", "une", "un", "des", "dans", "pour", "que", "qui", "pas", "sur"),
      "es" -> Set("el", "los", "las", "y", "es", "una", "un", "en", "por", "para", "con", "del", "se", "no"),
      "it" -> Set("il", "lo", "gli", "e", "è", "una", "un", "di", "che", "per", "con", "del", "si", "non"),
      "pt" -> Set("o", "os", "as", "e", "é", "uma", "um", "de", "que", "para", "com", "do", "da", "não"))
  }
  def detect(text: String): LidResult = {
    val toks = text.toLowerCase.split("[^\\p{L}']+").filter(_.nonEmpty)
    if (toks.isEmpty) return LidResult("und", 0.0)
    var bestLang = "und"; var bestHits = 0
    for ((lang, set) <- lists.toSeq.sortBy(_._1)) {
      val hits = toks.count(set.contains)
      if (hits > bestHits) { bestLang = lang; bestHits = hits }
    }
    if (bestHits == 0) LidResult("und", 0.0)
    else LidResult(bestLang, bestHits.toDouble / toks.length)
  }
}

/** Integer-exact trigram scoring shared by the ngram/indic heads AND
  * the DuckDB oracle ([[LidOracle]]): a document's trigram counts and
  * each seed profile's counts are integers, so the argmax over
  * languages compares cos_i > cos_b as dot_i²·n2_b > dot_b²·n2_i —
  * pure Long arithmetic, no float in any comparison — and the emitted
  * confidence dot / sqrt(n2doc · n2seed) is a two-op IEEE sequence
  * (one correctly-rounded multiply under 2^53, one sqrt, one divide)
  * that DuckDB reproduces bit-for-bit from the same integers. */
private[lid] object TrigramScore {
  /** Raw char-trigram counts + squared L2 norm. */
  def gramCounts(text: String): (Map[String, Int], Long) = {
    val s = "  " + text.toLowerCase.replaceAll("[^\\p{L} ]", "") + "  "
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for (i <- 0 to s.length - 3)
      counts.updateWith(s.substring(i, i + 3))(c => Some(c.getOrElse(0) + 1))
    val n2 = counts.values.foldLeft(0L)((a, v) => a + v.toLong * v)
    (counts.toMap, n2)
  }

  final case class Scored(lang: String, dot: Long, seedN2: Long)

  /** Best language by cosine (ties → lexicographically first, exactly
    * the strictly-greater replacement over sorted languages). Returns
    * Scored("und", 0, 1) when every dot product is zero. */
  def best(doc: Map[String, Int],
      profiles: Seq[(String, (Map[String, Int], Long))]): Scored = {
    var bl = "und"; var bd = 0L; var bn2 = 1L
    for ((lang, (q, n2s)) <- profiles) {
      var dot = 0L
      for ((g, c) <- doc) dot += c.toLong * q.getOrElse(g, 0)
      if (dot * dot * bn2 > bd * bd * n2s) { bl = lang; bd = dot; bn2 = n2s }
    }
    Scored(bl, bd, bn2)
  }

  def confidence(dot: Long, docN2: Long, seedN2: Long): Double =
    if (dot == 0L) 0.0
    else dot.toDouble / math.sqrt(docN2.toDouble * seedN2.toDouble)
}

object CharNgramDetector extends Detector {
  val name = "ngram"
  // Embedded seed text per language (public sample sentences).
  private[lid] val seeds: Map[String, String] = Map(
    "en" -> "the quick brown fox jumps over the lazy dog and then it runs to the house with the other animals because they are waiting there for food and water",
    "de" -> "der schnelle braune fuchs springt über den faulen hund und dann läuft er zum haus mit den anderen tieren weil sie dort auf futter und wasser warten",
    "fr" -> "le rapide renard brun saute par dessus le chien paresseux et puis il court vers la maison avec les autres animaux parce qu'ils attendent la nourriture",
    "es" -> "el rápido zorro marrón salta sobre el perro perezoso y luego corre hacia la casa con los otros animales porque están esperando comida y agua allí",
    "it" -> "la rapida volpe marrone salta sopra il cane pigro e poi corre verso la casa con gli altri animali perché stanno aspettando cibo e acqua",
    "pt" -> "a rápida raposa marrom pula sobre o cão preguiçoso e depois corre para a casa com os outros animais porque eles estão esperando comida e água")

  private val profiles: Seq[(String, (Map[String, Int], Long))] =
    seeds.toSeq.sortBy(_._1)
      .map { case (l, t) => l -> TrigramScore.gramCounts(t) }

  def detect(text: String): LidResult = {
    val (p, n2d) = TrigramScore.gramCounts(text.take(4000))
    if (p.isEmpty) return LidResult("und", 0.0)
    val b = TrigramScore.best(p, profiles)
    if (b.dot == 0L) LidResult("und", 0.0)
    else LidResult(b.lang, TrigramScore.confidence(b.dot, n2d, b.seedN2))
  }
}

/** Indic-capable detector mirroring the reference's IndicLID routing
  * (setu/lid.py:241-273 + 557-583): a roman-character-ratio router
  * (`char_percent_check`, faithfully including its double-subtraction
  * of newlines) sends romanized text to ROMANIZED trigram profiles
  * (hi/bn/ta/te transliteration seeds + the English seed) and native
  * text to NATIVE-script trigram profiles, falling back to the script
  * histogram for scripts without a profile.
  *
  * Deviation from IndicLID (documented): where the roman path resolves
  * to English or is low-confidence, this detector ABSTAINS ("und")
  * instead of asserting "en" — the other three ensemble members own
  * non-Indic text, and an always-voting Indic head would break ties
  * against them. */
object IndicDetector extends Detector {
  val name = "indic"
  private val InputThreshold = 0.5 // setu/lid.py:85 input_threshold

  private val SpecialChars = "[@_!#$%^&*()<>?/\\\\|}{~:]".r
  private val WhitespaceRe = "\\s".r
  private val NewlineRe = "\n".r
  private val RomanRe = "[a-zA-Z0-9]".r

  /** setu/lid.py:241-273 char_percent_check, arithmetic mirrored
    * exactly (yes, newlines are subtracted twice — once inside \s and
    * once on their own — exactly as the reference does). */
  def romanRatio(text: String): Double = {
    val inputLen = text.codePointCount(0, text.length)
    val specials = SpecialChars.findAllIn(text).size
    val spaces = WhitespaceRe.findAllIn(text).size
    val newlines = NewlineRe.findAllIn(text).size
    val total = inputLen - (specials + spaces + newlines)
    if (total == 0) 0.0
    else RomanRe.findAllIn(text).size.toDouble / total
  }

  // Romanized transliteration seeds (public sample sentences).
  private[lid] val romanSeeds: Map[String, String] = Map(
    "hi" -> "namaste yah ek chhota sa vakya hai jo bhasha pahchan ke liye likha gaya hai aur isme samanya hindi shabd hain jaise aur hai ki se mein yah vah nahi kya karna hota",
    "bn" -> "nomoshkar eti ekti chhoto bakyo ja bhasha chinhito korar jonno lekha hoyeche ebong ete sadharon bangla shobdo ache jemon ebong hoy theke modhye ami tumi korte hobe",
    "ta" -> "vanakkam idhu mozhi adaiyalathirkaga ezhudhappatta oru siriya vakkiyam idhil podhuvana tamizh sorkal ullana nandri romba seiya vendum irukku enna eppadi",
    "te" -> "namaskaram idi bhasha gurtimpu kosam rasina chinna vakyam indulo sadharana telugu padalu unnayi dhanyavadalu chala cheyali undi emi ela avunu kadu",
    "en" -> "the quick brown fox jumps over the lazy dog and then it runs to the house with the other animals because they are waiting there for food and water")

  private[lid] val nativeSeeds: Map[String, String] = Map(
    "hi" -> "नमस्ते यह एक छोटा सा वाक्य है जो भाषा पहचान के लिए लिखा गया है और इसमें सामान्य हिंदी शब्द हैं जैसे और है की से में यह वह नहीं क्या करना होता",
    "bn" -> "নমস্কার এটি একটি ছোট বাক্য যা ভাষা শনাক্তকরণের জন্য লেখা হয়েছে এবং এতে সাধারণ বাংলা শব্দ আছে যেমন এবং হয় থেকে মধ্যে আমি তুমি করতে হবে",
    "ta" -> "வணக்கம் இது மொழி அடையாளத்திற்காக எழுதப்பட்ட ஒரு சிறிய வாக்கியம் இதில் பொதுவான தமிழ் சொற்கள் உள்ளன நன்றி ரொம்ப செய்ய வேண்டும் இருக்கு என்ன எப்படி",
    "te" -> "నమస్కారం ఇది భాషా గుర్తింపు కోసం రాసిన చిన్న వాక్యం ఇందులో సాధారణ తెలుగు పదాలు ఉన్నాయి ధన్యవాదాలు చాలా చేయాలి ఉంది ఏమి ఎలా అవును కాదు")

  private val romanProfiles = romanSeeds.toSeq.sortBy(_._1)
    .map { case (l, t) => l -> TrigramScore.gramCounts(t) }
  private val nativeProfiles = nativeSeeds.toSeq.sortBy(_._1)
    .map { case (l, t) => l -> TrigramScore.gramCounts(t) }

  /** cos >= 0.3 in exact integers: dot ≥ 0 and 100·dot² ≥ 9·n2d·n2s. */
  private def confident(dot: Long, n2d: Long, n2s: Long): Boolean =
    100L * dot * dot >= 9L * n2d * n2s

  def detect(text: String): LidResult = {
    if (text.isEmpty) return LidResult("und", 0.0)
    val (p, n2d) = TrigramScore.gramCounts(text.take(4000))
    if (p.isEmpty) return LidResult("und", 0.0)
    if (romanRatio(text) >= InputThreshold) {
      val b = TrigramScore.best(p, romanProfiles)
      // roman path: only assert romanized INDIC with enough signal
      if (b.lang == "en" || b.lang == "und" || b.dot == 0L ||
          !confident(b.dot, n2d, b.seedN2)) LidResult("und", 0.0)
      else LidResult(b.lang, TrigramScore.confidence(b.dot, n2d, b.seedN2))
    } else {
      val b = TrigramScore.best(p, nativeProfiles)
      if (b.lang != "und" && b.dot > 0L && confident(b.dot, n2d, b.seedN2))
        LidResult(b.lang, TrigramScore.confidence(b.dot, n2d, b.seedN2))
      else ScriptDetector.detect(text) match {
        // script fallback names the language only off-Latin
        case r if r.lang != "en" => r
        case _ => LidResult("und", 0.0)
      }
    }
  }
}

object Ensemble extends Serializable {
  val detectors: Seq[Detector] =
    Seq(IndicDetector, CharNgramDetector, StopwordDetector, ScriptDetector)

  /** Hard majority vote over non-abstaining detectors ("und" =
    * abstain); ties resolved by detector priority order. */
  def vote(results: Seq[LidResult]): String = {
    val real = results.filter(_.lang != "und")
    if (real.isEmpty) return "und"
    val votes = real.groupBy(_.lang).view.mapValues(_.size).toMap
    val maxV = votes.values.max
    // first detector (in priority order) whose lang has the max votes
    real.find(r => votes(r.lang) == maxV).map(_.lang).getOrElse("und")
  }

  /** Annotate (id, text) rows with per-detector columns + the vote —
    * executed per partition (the reference's mapPartitions shape; a
    * model-backed detector would lazy-init here). */
  def annotate(s: SparkSession, df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    import s.implicits._
    df.select(df(idCol).cast("long"), df(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val rs = detectors.map(d => d.detect(if (text == null) "" else text))
          (id, vote(rs),
            rs(0).lang, rs(0).confidence,
            rs(1).lang, rs(1).confidence,
            rs(2).lang, rs(2).confidence,
            rs(3).lang, rs(3).confidence)
        }
      }
      .toDF(idCol, "doc_lang", "indic_lang", "indic_conf",
        "ngram_lang", "ngram_conf", "stop_lang", "stop_conf",
        "script_lang", "script_conf")
  }
}
