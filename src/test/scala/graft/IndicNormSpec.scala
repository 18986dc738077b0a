package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.IndicNorm

/** Pinned vectors for the full F11 chain (reference:
  * setu/filters.py:388-446 + indic_nlp_library default-flag rules). */
class IndicNormSpec extends AnyFunSuite {

  test("base: invisible chars cleaned, Moses punctuation normalized") {
    assert(IndicNorm.normalize("a﻿b­c⁠d", "hindi") == "abcd")
    assert(IndicNorm.normalize("a​b c", "hindi") == "a b c")
    assert(IndicNorm.normalize("x‌y‍z", "hindi") == "xyz")
    assert(IndicNorm.normalize("„q“ ”w", "hindi") == "\"q\" \"w")
    assert(IndicNorm.normalize("a–b—c", "hindi") == "a-b - c")
    assert(IndicNorm.normalize("l‘m’n", "hindi") == "l'm'n")
    assert(IndicNorm.normalize("''", "hindi") == "\"")
    assert(IndicNorm.normalize("wait…", "hindi") == "wait...")
  }

  test("devanagari: pipe to danda, colon to visarga after script char") {
    assert(IndicNorm.normalize("राम|", "hindi") == "राम।")
    assert(IndicNorm.normalize("राम: और", "hindi") == "रामः और")
    // colon NOT after a Devanagari char stays
    assert(IndicNorm.normalize("time: now", "hindi") == "time: now")
    // same rules via short code and other Devanagari langs
    assert(IndicNorm.normalize("राम:", "mr") == "रामः")
    assert(IndicNorm.normalize("राम:", "nepali") == "रामः")
  }

  test("bengali/tamil/telugu: script-local visarga, no cross-script firing") {
    assert(IndicNorm.normalize("রাম:", "bengali") == "রামঃ")
    assert(IndicNorm.normalize("தமிழ்:", "tamil") == "தமிழ்ஃ")
    assert(IndicNorm.normalize("తెలుగు:", "telugu") == "తెలుగుః")
    // Devanagari colon under a Bengali normalizer is untouched
    assert(IndicNorm.normalize("राम:", "bengali") == "राम:")
  }

  test("nukta decomposition falls out of NFKC (composition exclusions)") {
    // U+0958 qa -> U+0915 ka + U+093C nukta; same family elsewhere
    assert(IndicNorm.normalize("क़", "hindi") == "क़")
    assert(IndicNorm.normalize("ज़", "hindi") == "ज़")
    assert(IndicNorm.normalize("ড়", "bengali") == "ড়")
  }

  test("english/manipuri/santhali/unknown: NFKC only, no script rules") {
    // curly quotes SURVIVE (no Moses pass), but NFKC still folds
    // compatibility chars: NBSP -> space, ellipsis -> dots, ligature fi
    assert(IndicNorm.normalize("“q”", "english") == "“q”")
    assert(IndicNorm.normalize("a b…", "english") == "a b...")
    assert(IndicNorm.normalize("ﬁn", "english") == "fin")
    assert(IndicNorm.normalize("राम|:", "english") == "राम|:")
    assert(IndicNorm.normalize("x—y", "manipuri") == "x—y")
    assert(IndicNorm.normalize("राम:", "klingon") == "राम:")
  }

  test("urdu-script langs: base cleanup without Brahmic rules") {
    assert(IndicNorm.normalize("a “b”|", "urdu") == "a \"b\"|")
    assert(IndicNorm.normalize("x‍y", "kashmiri") == "xy")
  }

  test("null lang must NOT null the text (docs with missing lang survive)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq((1L, "a…b", "hindi"), (2L, "a…b", null))
      .toDF("id", "text", "lang")
      .select($"id",
        graft.functions.GraftFunctions.indicNormalize($"text", $"lang").as("n"))
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "a...b") // Moses + NFKC path
    assert(got(2L) == "a...b") // NFKC-only fallback, NOT null
  }

  test("expression is registered and callable from SQL") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.registerSql(spark)
    val got = spark.sql(
      "SELECT graft_indic_normalize('राम: x|', 'hindi') AS n")
      .collect()(0).getString(0)
    assert(got == "रामः x।")
  }
}
