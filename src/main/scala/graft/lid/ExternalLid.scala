package graft.lid

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bridge to an EXTERNAL language-ID model (fasttext / IndicLID / cld3
  * served by any executable or in-process runtime) — the reference
  * loads its three models once per mapPartitions task and reuses them
  * for every row of the partition (setu/lid.py:588-660); this bridge
  * keeps exactly that shape on the JVM:
  *
  *  - ONE scorer per partition, opened lazily on the first row (an
  *    empty partition never pays model startup) and closed by the
  *    task-completion listener (so failures can't leak processes);
  *  - rows cross the bridge in batches ([[ExternalLid.BatchSize]]) so
  *    a subprocess pipe pays one flush/read round-trip per batch, not
  *    per document — the difference between O(n) pipe syscalls and
  *    O(n/256) at corpus scale;
  *  - the external head votes FIRST in the ensemble priority order
  *    (the reference's indiclid > cld3 > nllb ordering puts the
  *    strongest model first; a served model outranks the heuristics).
  *
  * [[SubprocessScorer]] is the shipped working implementation: it
  * speaks the fasttext `predict-prob` stdin/stdout line protocol
  * (`__label__xx 0.97`), and also accepts plain `xx<TAB>0.97` or bare
  * `xx` lines so any scripting-language scorer can serve. An ONNX or
  * JNI runtime plugs in by implementing [[ExternalScorer]] — the
  * partition lifecycle and batching don't change.
  *
  * ON AN IN-PROCESS ONNX SCORER (documented decision, r11): this build
  * intentionally ships the interface + subprocess implementation and
  * NOT an `ai.onnxruntime`-backed module. The build environment has no
  * dependency egress, so an onnxruntime jar can neither resolve nor be
  * exercised by a real test — and a reflection-compiled shell that no
  * test can run is exactly the kind of dead surface this repo refuses
  * to carry. The recipe for a deployment that wants one is mechanical,
  * because every hard problem (per-partition lifecycle, lazy open,
  * close-on-task-completion, batching) already lives in
  * [[ExternalLid.annotate]]:
  * {{{
  * final class OnnxScorer(modelPath: String, vocabPath: String)
  *     extends ExternalScorer {
  *   private val env = OrtEnvironment.getEnvironment
  *   private val sess = env.createSession(modelPath) // once per PARTITION
  *   def scoreBatch(texts: Seq[String]): Seq[LidResult] = {
  *     val input = OnnxTensor.createTensor(env, tokenize(texts))
  *     val probs = sess.run(Map("input" -> input)) // one run per BATCH
  *     argmaxToLidResults(probs)                   // (lang, confidence)
  *   }
  *   def close(): Unit = { sess.close(); env.close() }
  * }
  * // ExternalLid.annotate(spark, docs, "doc_id", "text",
  * //   new ExternalScorerFactory {
  * //     def open() = new OnnxScorer("/models/lid.onnx", "/models/vocab") })
  * }}}
  * The scorer never touches Spark APIs, so it needs no test double:
  * PipelineSpec's deterministic fake + subprocess tests already pin
  * everything the bridge itself does (lifecycle, batching, vote
  * priority), which is the part that can break.
  */
trait ExternalScorer extends AutoCloseable {
  /** Score a batch; MUST return exactly one result per input. */
  def scoreBatch(texts: Seq[String]): Seq[LidResult]
}

/** Serializable recipe shipped to executors; `open()` runs ON the
  * executor, once per nonempty partition. */
trait ExternalScorerFactory extends Serializable {
  def open(): ExternalScorer
}

/** Line-protocol subprocess scorer. Input lines are newline-sanitized
  * (fasttext's own stdin contract: one document per line); one output
  * line is read back per input line, in order. */
final class SubprocessScorer(cmd: Seq[String]) extends ExternalScorer {
  // stderr INHERITs the executor's stderr (→ executor logs): a scorer
  // that logs per-line warnings must never fill an unread pipe and
  // wedge the task
  private val proc = new ProcessBuilder(cmd: _*)
    .redirectError(ProcessBuilder.Redirect.INHERIT).start()
  private val in = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
  private val out = new java.io.BufferedReader(
    new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))

  def scoreBatch(texts: Seq[String]): Seq[LidResult] = {
    val results = scala.collection.mutable.ArrayBuffer.empty[LidResult]
    def drainReady(): Unit =
      while (results.size < texts.size && out.ready()) {
        val line = out.readLine()
        if (line == null)
          throw new IllegalStateException(
            s"external scorer exited mid-batch: ${cmd.mkString(" ")}")
        results += SubprocessScorer.parse(line)
      }
    texts.foreach { t =>
      // opportunistic drain between writes: a verbose scorer whose
      // batch output exceeds the OS pipe buffer would otherwise stop
      // consuming stdin while we keep writing — mutual deadlock
      drainReady()
      in.write(if (t == null) ""
        else t.replace('\n', ' ').replace('\r', ' '))
      in.write('\n')
    }
    in.flush() // at most one pipe-buffer round-trip left after drains
    while (results.size < texts.size) {
      val line = out.readLine()
      if (line == null)
        throw new IllegalStateException(
          s"external scorer exited mid-batch: ${cmd.mkString(" ")}")
      results += SubprocessScorer.parse(line)
    }
    results.toSeq
  }

  def close(): Unit = {
    try in.close() catch { case _: java.io.IOException => }
    try out.close() catch { case _: java.io.IOException => }
    proc.destroy()
  }
}

object SubprocessScorer {
  /** Accepts `__label__hi 0.97` (fasttext), `hi\t0.97`, `hi 0.97`, or
    * bare `hi` (confidence 1.0); blank lines abstain. */
  def parse(line: String): LidResult = {
    val t = line.trim
    if (t.isEmpty) LidResult("und", 0.0)
    else {
      val parts = t.split("\\s+")
      val lang =
        if (parts(0).startsWith("__label__")) parts(0).substring(9)
        else parts(0)
      val conf =
        if (parts.length > 1)
          try parts(1).toDouble
          catch { case _: NumberFormatException => 0.0 }
        else 1.0
      if (lang.isEmpty) LidResult("und", 0.0) else LidResult(lang, conf)
    }
  }

  def factory(cmd: String*): ExternalScorerFactory = {
    val c = cmd.toVector // stable serializable capture
    new ExternalScorerFactory { def open(): ExternalScorer = new SubprocessScorer(c) }
  }
}

object ExternalLid {
  val BatchSize = 256

  /** [[Ensemble.annotate]] with the external head voting first:
    * per-detector columns (ext + the 4 built-ins) and the majority
    * vote, with the external scorer opened once per nonempty partition
    * and closed on task completion. */
  def annotate(s: SparkSession, df: DataFrame, idCol: String, textCol: String,
      factory: ExternalScorerFactory): DataFrame = {
    import s.implicits._
    df.select(df(idCol).cast("long"), df(textCol)).as[(Long, String)]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val scorer = factory.open()
          // the listener is the authoritative close (fires on failure
          // too); outside a task (driver-side unit tests) fall back to
          // closing when the iterator exhausts
          val inTask = Option(TaskContext.get())
          inTask.foreach(_.addTaskCompletionListener[Unit](_ => scorer.close()))
          val rows = it.grouped(BatchSize).flatMap { batch =>
            val ext = scorer.scoreBatch(batch.map(_._2))
            batch.zip(ext).map { case ((id, text), e) =>
              val rs = Ensemble.detectors
                .map(d => d.detect(if (text == null) "" else text))
              (id, Ensemble.vote(e +: rs), e.lang, e.confidence,
                rs(0).lang, rs(0).confidence,
                rs(1).lang, rs(1).confidence,
                rs(2).lang, rs(2).confidence,
                rs(3).lang, rs(3).confidence)
            }
          }
          if (inTask.isDefined) rows
          else {
            // driver-side (unit-test) path: a partially consumed lazy
            // iterator (.take/.show) would orphan the process — these
            // partitions are test-sized, so materialize, close, return
            val all = rows.toVector
            scorer.close()
            all.iterator
          }
        }
      }
      .toDF(idCol, "doc_lang", "ext_lang", "ext_conf",
        "indic_lang", "indic_conf", "ngram_lang", "ngram_conf",
        "stop_lang", "stop_conf", "script_lang", "script_conf")
  }
}
