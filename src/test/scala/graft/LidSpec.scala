package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.lid._

class LidSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val samples = Map(
    "en" -> "the cat is sitting on the mat and it is waiting for the food that we left there",
    "de" -> "der hund ist nicht in dem haus und die katze wartet auf das futter für den abend",
    "fr" -> "le chat est dans la maison et les oiseaux attendent dans le jardin pour la nourriture",
    "es" -> "el perro está en la casa y los gatos esperan la comida para la noche con el niño",
    "zh" -> "数据库引擎在大规模集群上执行查询计划并优化连接顺序",
    "hi" -> "यह एक बड़ा दस्तावेज़ है जो भाषा पहचान का परीक्षण करता है",
    "ru" -> "это большой документ который проверяет определение языка системы",
    "ar" -> "هذه وثيقة كبيرة تختبر نظام تحديد اللغة في المحرك")

  test("script detector resolves non-Latin scripts") {
    assert(ScriptDetector.detect(samples("zh")).lang == "zh")
    assert(ScriptDetector.detect(samples("hi")).lang == "hi")
    assert(ScriptDetector.detect(samples("ru")).lang == "ru")
    assert(ScriptDetector.detect(samples("ar")).lang == "ar")
    assert(ScriptDetector.detect("ಕನ್ನಡ ಭಾಷೆ ಪರೀಕ್ಷೆ").lang == "kn")
    assert(ScriptDetector.detect("മലയാളം ഭാഷ പരീക്ഷ").lang == "ml")
    assert(ScriptDetector.detect("ગુજરાતી ભાષા પરીક્ષણ").lang == "gu")
    assert(ScriptDetector.detect("ਪੰਜਾਬੀ ਭਾਸ਼ਾ ਜਾਂਚ").lang == "pa")
    assert(ScriptDetector.detect("ଓଡ଼ିଆ ଭାଷା ପରୀକ୍ଷା").lang == "or")
  }

  test("stopword detector separates Latin languages") {
    for (l <- Seq("en", "de", "fr", "es"))
      assert(StopwordDetector.detect(samples(l)).lang == l, s"lang $l")
  }

  test("stopword detector covers the shipped Indic lexicon languages") {
    // sentences built from each language's own function words — the
    // detector must name the language from the resource-backed lists
    assert(StopwordDetector.detect(
      "यह एक है और वह भी है लेकिन मैं नहीं").lang == "hi")
    // disjoint-from-assamese words only (the two share script + core)
    assert(StopwordDetector.detect(
      "একটি এবং ছিল মধ্যে থেকে উপর যে না").lang == "bn")
    assert(StopwordDetector.detect(
      "ਇਹ ਇੱਕ ਹੈ ਅਤੇ ਉਹ ਵੀ ਹੈ ਪਰ ਮੈਂ ਨਹੀਂ").lang == "pa")
    assert(StopwordDetector.detect(
      "આ એક છે અને તે પણ છે કે હું").lang == "gu")
  }

  test("char-ngram detector separates Latin languages") {
    for (l <- Seq("en", "de", "fr", "es"))
      assert(CharNgramDetector.detect(samples(l)).lang == l, s"lang $l")
  }

  test("ensemble vote: majority wins, priority breaks ties") {
    assert(Ensemble.vote(Seq(
      LidResult("de", 0.9), LidResult("de", 0.5), LidResult("en", 0.3))) == "de")
    // 3-way tie → first detector's answer (ngram priority)
    assert(Ensemble.vote(Seq(
      LidResult("fr", 0.5), LidResult("es", 0.5), LidResult("en", 0.5))) == "fr")
    assert(Ensemble.vote(Seq(
      LidResult("und", 0.0), LidResult("es", 0.5), LidResult("es", 0.4))) == "es")
  }

  test("roman ratio mirrors char_percent_check arithmetic") {
    // pure roman text → 1.0
    assert(IndicDetector.romanRatio("abc def") == 1.0)
    // pure Devanagari → 0.0
    assert(IndicDetector.romanRatio("नमस्ते जी") == 0.0)
    // special chars excluded from the denominator
    assert(IndicDetector.romanRatio("ab!!") == 1.0)
    // mixed: 4 roman / 8 non-space chars
    assert(IndicDetector.romanRatio("abcd नमस्ते") == 4.0 / 10)
  }

  test("indic detector: native and romanized Hindi/Tamil, abstains on European") {
    assert(IndicDetector.detect(samples("hi")).lang == "hi")
    assert(IndicDetector.detect(
      "namaste yah bhasha pahchan ka parikshan hai aur isme hindi shabd hain").lang == "hi")
    assert(IndicDetector.detect(
      "vanakkam idhu tamizh mozhi adaiyala parikshai nandri romba").lang == "ta")
    assert(IndicDetector.detect(
      "নমস্কার এটি বাংলা ভাষা শনাক্তকরণের পরীক্ষা").lang == "bn")
    // European text must not get an Indic vote (abstain keeps the
    // ensemble ties owned by the ngram/stopword heads)
    assert(IndicDetector.detect(samples("en")).lang == "und")
    assert(IndicDetector.detect(samples("fr")).lang == "und")
    // non-profiled non-Latin scripts fall back to the script head
    assert(IndicDetector.detect(samples("ru")).lang == "ru")
  }

  test("annotate produces per-detector columns + vote over a DataFrame") {
    import spark.implicits._
    val df = samples.toSeq.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }
      .toDF("doc_id", "expected", "text")
    val out = Ensemble.annotate(spark, df, "doc_id", "text")
    assert(out.columns.toSeq == Seq("doc_id", "doc_lang",
      "indic_lang", "indic_conf", "ngram_lang",
      "ngram_conf", "stop_lang", "stop_conf", "script_lang", "script_conf"))
    val got = out.select("doc_id", "doc_lang").as[(Long, String)].collect().toMap
    val expected = samples.toSeq.zipWithIndex
      .map { case ((l, _), i) => i.toLong -> l }.toMap
    assert(got == expected)
  }

  test("lid kappa == brute chance-corrected fold over the confusion cells") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cells = graft.queries.StreamingQ.dLidConfusion
      .fn(spark, TestSpark.Sf)
      .select(col("true_lang"), col("pred_lang"), col("n_docs"))
      .as[(String, String, Long)].collect()
    val n = cells.map(_._3).sum
    val agree = cells.filter(c => c._1 == c._2).map(_._3).sum
    val rows = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val colsM = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val pe = rows.keySet.intersect(colsM.keySet).toSeq
      .map(l => BigInt(rows(l)) * colsM(l)).sum
    val kappa = math.floor((BigInt(n) * agree - pe).toDouble /
      (BigInt(n) * n - pe).toDouble * 1e6).toLong
    val gotK = graft.queries.StreamingQ.dLidKappa.fn(spark, TestSpark.Sf)
      .select(col("n_docs"), col("n_agree"), col("kappa_micros"))
      .as[(Long, Long, Long)].collect()
    assert(gotK.length == 1)
    assert(gotK.head == ((n, agree, kappa)),
      s"${gotK.head} vs brute ($n, $agree, $kappa)")
    // kappa never exceeds raw accuracy (chance correction only hurts)
    assert(kappa <= math.floor(agree.toDouble / n * 1e6).toLong)
  }
}
