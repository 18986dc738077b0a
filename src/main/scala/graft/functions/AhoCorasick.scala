package graft.functions

import scala.collection.mutable

/** Aho-Corasick multi-pattern automaton (public algorithm, Aho &
  * Corasick '75) — the JVM replacement for the reference's flashtext
  * keyword processors (setu/constants.py:212-233, setu/filters.py:742-748).
  *
  * Matches are word-boundary-valid occurrences (flashtext semantics:
  * a hit must not touch a letter/digit/underscore on either side);
  * overlapping hits of *different* keywords are all counted, and the
  * automaton is built once and shared per executor via the expression's
  * transient lazy val — no driver-side state rides the plan.
  */
object AhoCorasick {
  // Executor-JVM-wide build cache (optimization guide §4.5: heavyweight
  // state once per executor, not per row/batch/task). Every task
  // deserializes its own copy of the expression tree, so a per-instance
  // `@transient lazy val trie` rebuilds the automaton ONCE PER TASK —
  // invisible on a 1-task scan stage, but profiled r14 at ~240 ms/task
  // of pure rebuild when the same funnel ran 32 tasks wide. Keyed by
  // the keyword list (content equality); lexicons are a fixed small
  // set, but cap the cache defensively so a pathological caller with
  // unbounded distinct keyword sets degrades to per-task builds rather
  // than leaking the executor heap.
  private val MaxEntries = 64
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[IndexedSeq[String], AhoCorasick]()
  def shared(keywords: IndexedSeq[String]): AhoCorasick = {
    if (cache.size > MaxEntries) cache.clear()
    cache.computeIfAbsent(keywords, kw => new AhoCorasick(kw))
  }
}

final class AhoCorasick(val keywords: IndexedSeq[String]) extends Serializable {

  // Flat automaton arrays built eagerly; ~O(total pattern chars) states.
  private val gotoMaps = mutable.ArrayBuffer[mutable.HashMap[Char, Int]]()
  private val fail = mutable.ArrayBuffer[Int]()
  private val out = mutable.ArrayBuffer[List[Int]]()

  private def newState(): Int = {
    gotoMaps += mutable.HashMap.empty
    fail += 0
    out += Nil
    gotoMaps.size - 1
  }

  {
    newState() // root
    keywords.zipWithIndex.foreach { case (kw, idx) =>
      var s = 0
      kw.foreach { ch =>
        s = gotoMaps(s).getOrElseUpdate(ch, newState())
      }
      out(s) = idx :: out(s)
    }
    // BFS fail links
    val queue = mutable.Queue[Int]()
    gotoMaps(0).values.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      gotoMaps(r).foreach { case (ch, s) =>
        queue += s
        var f = fail(r)
        while (f != 0 && !gotoMaps(f).contains(ch)) f = fail(f)
        fail(s) = if (f != r && gotoMaps(f).contains(ch)) gotoMaps(f)(ch) else 0
        out(s) = out(s) ::: out(fail(s))
      }
    }
  }

  // Combining marks count as word chars: in Brahmic scripts a vowel
  // sign / nukta / virama continues the word, so "चूत" must NOT match
  // inside "चूतिया" (the following char is U+093F, category Mc).
  @inline private def isWordChar(c: Char): Boolean =
    Character.isLetterOrDigit(c) || c == '_' || {
      val t = Character.getType(c)
      t == Character.NON_SPACING_MARK || t == Character.COMBINING_SPACING_MARK ||
        t == Character.ENCLOSING_MARK
    }

  /** Boundary-valid match spans as (start, end) codepoint-naive char
    * offsets, in match-end order (F15 shape, setu/filters.py:733-740). */
  def findSpans(text: String): Seq[(Int, Int)] = {
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !gotoMaps(s).contains(ch)) s = fail(s)
      s = gotoMaps(s).getOrElse(ch, 0)
      var hits = out(s)
      while (hits.nonEmpty) {
        val kw = keywords(hits.head)
        val start = i - kw.length + 1
        val leftOk = start == 0 || !isWordChar(text.charAt(start - 1))
        val rightOk = i == text.length - 1 || !isWordChar(text.charAt(i + 1))
        if (leftOk && rightOk) spans += ((start, i + 1))
        hits = hits.tail
      }
      i += 1
    }
    spans.toSeq
  }

  /** Count boundary-valid occurrences per keyword index. */
  def countMatches(text: String): Array[Int] = {
    val counts = new Array[Int](keywords.size)
    var s = 0
    var i = 0
    while (i < text.length) {
      val ch = text.charAt(i)
      while (s != 0 && !gotoMaps(s).contains(ch)) s = fail(s)
      s = gotoMaps(s).getOrElse(ch, 0)
      var hits = out(s)
      while (hits.nonEmpty) {
        val kw = keywords(hits.head)
        val start = i - kw.length + 1
        val leftOk = start == 0 || !isWordChar(text.charAt(start - 1))
        val rightOk = i == text.length - 1 || !isWordChar(text.charAt(i + 1))
        if (leftOk && rightOk) counts(hits.head) += 1
        hits = hits.tail
      }
      i += 1
    }
    counts
  }
}
