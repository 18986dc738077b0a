package graft.sources

/** Per-language reference data shipped as classpath resources (jar
  * travels to every executor — no side-channel file distribution):
  *
  *  - `lang_data.tsv`: language name ↔ ISO 639-3 / 639-1 codes and
  *    primary script. The reference keeps the same surface in
  *    `setu/data/lang_iso_mapping.json` + `language_mapping.json`
  *    (loaded at setu/lid.py:445-446); codes here are the standard
  *    ISO 639 assignments, compiled independently.
  *  - `dedup_thresholds.tsv`: per-language minimum document length
  *    (chars) below which exact dedup exempts a document — the
  *    reference's `setu/data/exact_dedup_thresholds/<lang>.txt`
  *    surface (one integer per language, 23 languages). The VALUES
  *    are own settings from a script-verbosity heuristic (~60 words
  *    of running text in each script: Latin ≈ 300 chars, Devanagari ≈
  *    600-900, Dravidian abugidas ≈ 1000+, Han ≈ 120), not the
  *    reference's numbers.
  *
  * Both tables cover the reference's 23 threshold languages plus the
  * synthetic corpus's european codes, so reference-shaped configs and
  * the test corpus both resolve.
  */
object LangData {

  final case class LangInfo(
      language: String, iso3: String, iso1: Option[String], script: String)

  private def lines(name: String): Seq[Array[String]] = {
    val in = getClass.getResourceAsStream(s"/graft/$name")
    require(in != null, s"missing resource /graft/$name")
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty)
      .map(_.split("\t")).toVector
    finally in.close()
  }

  /** All shipped languages, resource (alphabetical) order. */
  lazy val all: Seq[LangInfo] = lines("lang_data.tsv").map { f =>
    LangInfo(f(0), f(1), Option(f(2)).filter(_ != "-"), f(3))
  }

  lazy val byName: Map[String, LangInfo] =
    all.map(l => l.language -> l).toMap
  lazy val byIso1: Map[String, LangInfo] =
    all.flatMap(l => l.iso1.map(_ -> l)).toMap
  lazy val byIso3: Map[String, LangInfo] =
    all.map(l => l.iso3 -> l).toMap

  /** Canonical language NAME for any spelling a config may carry:
    * full name, ISO 639-1, or ISO 639-3 (the reference's configs mix
    * all three — its F27 stage renames codes for exactly this reason). */
  def canonicalName(code: String): Option[String] = {
    val c = code.trim.toLowerCase
    byName.get(c).orElse(byIso1.get(c)).orElse(byIso3.get(c))
      .map(_.language)
  }

  /** Preferred short code: ISO 639-1 when assigned, else 639-3 — the
    * reference's F27 rename collapses (urdu, urd) to "ur" for exactly
    * this preference (setu/filters.py:283-293). */
  def shortCode(l: LangInfo): String = l.iso1.getOrElse(l.iso3)

  /** Canonicalizing rename as COLUMNS (F27 generalized from the
    * reference's single urdu special-case to the whole shipped table):
    * any spelling (name / iso1 / iso3) maps to the canonical name and
    * preferred short code; unknown values pass through unchanged. A
    * bounded literal CASE chain — codegen'd, no join, no UDF. */
  /** (spelling → canonical name) pairs, first match wins. */
  lazy val nameMapping: Seq[(String, String)] =
    all.flatMap(l => spellings(l).map(_ -> l.language))
  /** (spelling → preferred short code) pairs, first match wins. */
  lazy val codeMapping: Seq[(String, String)] =
    all.flatMap(l => spellings(l).map(_ -> shortCode(l)))

  def nameCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    caseChain(c, nameMapping)
  def codeCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    caseChain(c, codeMapping)

  private def spellings(l: LangInfo): Seq[String] =
    (Seq(l.language, l.iso3) ++ l.iso1).distinct

  private def caseChain(c: org.apache.spark.sql.Column,
      mapping: Seq[(String, String)]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, lower, when}
    val lc = lower(c)
    mapping.foldLeft(Option.empty[org.apache.spark.sql.Column]) {
      case (acc, (from, to)) =>
        Some(acc.fold(when(lc === from, lit(to)))(_.when(lc === from, lit(to))))
    }.get.otherwise(c)
  }

  /** (language, min_chars) exact-dedup exemption thresholds, resource
    * order — deterministic, so doc_id-routed test assignments and the
    * generated oracle VALUES agree positionally. */
  lazy val dedupThresholds: Seq[(String, Int)] =
    lines("dedup_thresholds.tsv").map(f => (f(0), f(1).toInt))
}
