package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure rehearsal (r13 judge directive #1): nothing in 13
  * rounds ever exceeded execution memory — every run fit the 128 GiB
  * sandbox, so the 100-TB claim rested on plans that had never faced a
  * SortMergeJoin spill, an agg hash-map fallback, or eviction of a
  * localCheckpointed frame. This main runs the BENCH_SCALE rows at N×
  * (default 8×) TWICE on the same upsampled tables:
  *
  *  1. ROOMY — `local[32]` in the big driver JVM (the configuration
  *     every prior artifact used), dumping each row's output;
  *  2. TIGHT — real child-process executors with a deliberately small
  *     heap (`local-cluster[2,2,1024]` by default; the reference ran
  *     3 GB executors, we go well below), dumping again and recording
  *     per-row spill metrics (memoryBytesSpilled / diskBytesSpilled
  *     summed over tasks via a SparkListener);
  *
  * then compares the dumps with exact multiset equality (count +
  * exceptAll both directions — the queries are partitioning-invariant
  * by construction, which four local-vs-local-cluster gates already
  * pinned, so ANY difference here is a memory-pressure bug). A row that
  * fails under TIGHT instead of spilling is the scale bug this
  * rehearsal exists to surface; a run where NO row spills was not a
  * rehearsal at all, and says so via `"spilled_any":false`.
  *
  * Needs the same process env as tools/verify_cluster.sh (SPARK_HOME
  * shim + SPARK_SCALA_VERSION) — run via tools/bench_pressure.sh.
  */
object BenchPressure {

  /** Sums spill bytes across completed tasks. Listener delivery is
    * async; [[drainQuiesced]] polls until the bus has gone quiet. */
  final class SpillListener extends SparkListener {
    private val mem = new AtomicLong()
    private val disk = new AtomicLong()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        mem.addAndGet(m.memoryBytesSpilled)
        disk.addAndGet(m.diskBytesSpilled)
        ()
      }
    }
    def snapshot: (Long, Long) = (mem.get(), disk.get())
    def drainQuiesced(): (Long, Long) = {
      var prev = snapshot
      var stable = 0
      while (stable < 2) {
        Thread.sleep(300)
        val cur = snapshot
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      mem.set(0); disk.set(0)
      prev
    }
  }

  private def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", v)

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mult = args.headOption.map(_.toInt).getOrElse(8)
    val rows = if (args.length > 1) args.drop(1).toSeq else BenchScale.DefaultRows
    val tightMaster = sys.env.getOrElse(
      "SPARK_GRAFT_PRESSURE_MASTER", "local-cluster[2,2,1024]")

    val work = java.nio.file.Files.createTempDirectory("graft-pressure").toFile
    def rmRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(rmRec)); f.delete(); ()
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() => rmRec(work)))
    val scaledDir = new java.io.File(work, "scaled").getAbsolutePath
    val roomyOut = new java.io.File(work, "roomy").getAbsolutePath
    val tightOut = new java.io.File(work, "tight").getAbsolutePath

    def session(master: String, shuffle: Int): SparkSession = {
      val b = SparkSession.builder()
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
      if (master.startsWith("local-cluster")) {
        b.config("spark.executor.extraClassPath", sys.props("java.class.path"))
        // local-cluster[n,c,mem] sizes the WORKER; the executor request
        // defaults to 1024 MiB and must fit inside it, so ask for
        // exactly the worker's budget (this is what makes sub-1GiB
        // pressure masters like local-cluster[2,2,640] launchable)
        "\\[\\s*\\d+\\s*,\\s*\\d+\\s*,\\s*(\\d+)\\s*\\]".r
          .findFirstMatchIn(master)
          .foreach(m => b.config("spark.executor.memory", s"${m.group(1)}m"))
      }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("WARN")
      s
    }

    final case class Run(sec: Double, memSpill: Long, diskSpill: Long,
        error: Option[String])

    def runAll(spark: SparkSession, outDir: String, tag: String): Map[String, Run] = {
      val listener = new SpillListener
      spark.sparkContext.addSparkListener(listener)
      val out = rows.map { name =>
        val fn = SparkEntry.queries(name)
        val t0 = System.nanoTime()
        val err =
          try {
            fn(spark, scaledDir).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            None
          } catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(300))
          }
        val sec = (System.nanoTime() - t0) / 1e9
        val (m, d) = listener.drainQuiesced()
        graft.ops.Checkpoints.sweepAll(spark)
        System.err.println(
          f"[pressure] $tag $name: ${sec}%.1fs spill mem ${m / 1e6}%.0fMB " +
            f"disk ${d / 1e6}%.0fMB${err.map(e => s" FAILED: $e").getOrElse("")}")
        name -> Run(sec, m, d, err)
      }.toMap
      spark.sparkContext.removeSparkListener(listener)
      out
    }

    // Phase 1: materialize the N× tables + roomy control run.
    val roomy = session(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", 32)
    BenchScale.upsample(roomy, srcDir, scaledDir, mult)
    System.err.println(s"[pressure] ${mult}x tables at $scaledDir")
    val roomyRuns = runAll(roomy, roomyOut, "roomy")
    roomy.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // Phase 2: the same rows under small real-executor heaps.
    val tight = session(tightMaster, 32)
    val tightRuns = runAll(tight, tightOut, "tight")
    tight.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()

    // Phase 3: exact multiset compare of the two dumps.
    val cmp = session("local[8]", 8)
    val identical = rows.map { name =>
      val ok =
        if (roomyRuns(name).error.nonEmpty || tightRuns(name).error.nonEmpty) false
        else try {
          val a = cmp.read.parquet(s"$roomyOut/$name")
          val b = cmp.read.parquet(s"$tightOut/$name")
          a.count() == b.count() &&
            a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
        } catch { case e: Throwable =>
          System.err.println(s"[pressure] compare $name failed: ${e.getMessage}")
          false
        }
      name -> ok
    }.toMap
    cmp.stop()

    val spilledAny = tightRuns.values.exists(r => r.diskSpill > 0 || r.memSpill > 0)
    val allGreen = rows.forall(n => tightRuns(n).error.isEmpty && identical(n))
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("[\\x00-\\x1f]", " ") + "\""
    val rowsJson = rows.map { n =>
      val r = roomyRuns(n); val t = tightRuns(n)
      s"${q(n)}:{" +
        s""""roomy_sec":${num(r.sec)},"tight_sec":${num(t.sec)},""" +
        s""""mem_spill_mb":${num(t.memSpill / 1e6)},"disk_spill_mb":${num(t.diskSpill / 1e6)},""" +
        s""""green":${t.error.isEmpty},"identical":${identical(n)}""" +
        t.error.map(e => s""","error":${q(e)}""").getOrElse("") + "}"
    }.mkString("{", ",", "}")
    val line =
      s"""{"metric":"bench_pressure","mult":$mult,"sf":${q(srcDir)},"tight_master":${q(tightMaster)},"all_green":$allGreen,"spilled_any":$spilledAny,"rows":$rowsJson}"""
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_PRESSURE_OUT", "BENCH_PRESSURE.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(out), line + "\n")
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[pressure] could not write $out: ${e.getMessage}")
    }
  }
}
