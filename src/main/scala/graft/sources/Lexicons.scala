package graft.sources

/** Per-language filter lexicons (the reference's
  * `setu/data/filter_data/{nsfw,stopwords}/<lang>.txt`, loaded at
  * setu/constants.py:179-233). Own compilations shipped as CLASSPATH
  * resources so they travel inside the library jar to every executor —
  * no side-channel file distribution on a cluster.
  */
object Lexicons {

  private def load(kind: String, lang: String): Seq[String] = {
    val path = s"/graft/lexicons/$kind/$lang.txt"
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"no $kind lexicon for language '$lang' ($path)")
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().map(_.trim).filter(_.nonEmpty).toVector
    finally in.close()
  }

  /** Languages with shipped lexicons — the reference's 17-language
    * filter_data set (setu/data/filter_data/nsfw) plus german. */
  val languages: Seq[String] =
    Seq("english", "german", "hindi", "bengali", "tamil",
      "telugu", "kannada", "malayalam", "marathi", "urdu",
      "assamese", "gujarati", "nepali", "oriya", "punjabi",
      "konkani", "dogri", "manipuri")

  def nsfw(lang: String): Seq[String] = load("nsfw", lang)
  def stopwords(lang: String): Seq[String] = load("stopwords", lang)

  /** Junk-line lexicons (reference surface:
    * filter_data/junk/{complete,partial} — constants.py:20-21,93-94):
    * `complete` entries kill a line by whole-line match, `partial` by
    * substring. English out of the box (like the reference),
    * parameterized like the other lexicon families. */
  def junkComplete(lang: String): Seq[String] = load("junk_complete", lang)
  def junkPartial(lang: String): Seq[String] = load("junk_partial", lang)

  /** Deduplicated union across languages — what a multilingual corpus
    * run feeds the single shared Aho-Corasick automaton. */
  def nsfwUnion(langs: Seq[String] = languages): Seq[String] =
    langs.flatMap(nsfw).distinct
  def stopwordUnion(langs: Seq[String] = languages): Seq[String] =
    langs.flatMap(stopwords).distinct
}
