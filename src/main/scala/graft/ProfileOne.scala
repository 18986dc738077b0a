package graft

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Per-query time breakdown for the optimization rounds (guide §1:
  * decide whether time goes to planning, scheduling, task compute or
  * shuffle before changing anything). Runs one bench spec exactly the
  * way [[Bench]] does (noop sink, sweep between samples) under a
  * listener that collects job/stage/task counts and per-stage task
  * time, then prints a breakdown for the LAST (steady-state) sample.
  *
  * Usage: sbt "runMain graft.ProfileOne <queryName> [samples]"
  */
object ProfileOne {

  final class Collector extends SparkListener {
    case class StageRow(id: Int, name: String, tasks: Int,
        taskTimeMs: Long, wallMs: Long,
        shuffleReadMB: Double, shuffleWriteMB: Double, spilledMB: Double)
    val stages = mutable.ArrayBuffer[StageRow]()
    @volatile var jobs = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    private val taskTime = mutable.Map[Int, Long]().withDefaultValue(0L)
    private val taskCount = mutable.Map[Int, Int]().withDefaultValue(0)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      taskTime(t.stageId) += Option(t.taskMetrics).map(_.executorRunTime).getOrElse(0L)
      taskCount(t.stageId) += 1
    }
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = synchronized {
      val i = s.stageInfo
      val wall = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(0L)
      val m = i.taskMetrics
      stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n').take(90),
        taskCount(i.stageId), taskTime(i.stageId), wall,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        (m.memoryBytesSpilled + m.diskBytesSpilled) / 1e6)
    }
    def reset(): Unit = synchronized { stages.clear(); taskTime.clear(); taskCount.clear(); jobs = 0 }
  }

  /** Optional stack sampler (SPARK_GRAFT_PROFILE_STACKS=1): samples
    * executor task threads every 50 ms and prints the most common
    * frames at the end — the in-JVM replacement for jstack, which
    * cannot attach across the sandbox's PID namespace. */
  final class StackSampler extends Thread {
    setDaemon(true)
    val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var on = false
    override def run(): Unit = while (true) {
      if (on) {
        val it = Thread.getAllStackTraces.entrySet.iterator
        while (it.hasNext) {
          val e = it.next()
          if (e.getKey.getName.startsWith("Executor task launch")) {
            val st = e.getValue
            // top N frames as signature, skip pure waits
            if (st.nonEmpty && !st.head.toString.contains("Unsafe.park")) {
              val sig = st.take(8).mkString(" <- ")
              counts.merge(sig, 1, (a, b) => a + b)
            }
          }
        }
      }
      Thread.sleep(50)
    }
    def report(top: Int): Unit = {
      import scala.jdk.CollectionConverters._
      println("--- top sampled task stacks ---")
      counts.asScala.toSeq.sortBy(-_._2).take(top).foreach { case (sig, n) =>
        println(s"[$n samples]")
        sig.split(" <- ").take(8).foreach(f => println(s"    $f"))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val name = args.head
    val samples = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val col = new Collector
    spark.sparkContext.addSparkListener(col)
    val sampler = new StackSampler
    if (sys.env.get("SPARK_GRAFT_PROFILE_STACKS").contains("1")) sampler.start()
    val sp = SparkEntry.benchQueries.find(_.name == name)
      .getOrElse(sys.error(s"no bench spec named $name"))

    def run(): Double = {
      val t0 = System.nanoTime()
      sp.fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup at sf0.001 then untimed at target, mirroring Bench
    try sp.fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => }
    graft.ops.Checkpoints.sweepAll(spark)
    run(); graft.ops.Checkpoints.sweepAll(spark)
    var best = Double.MaxValue
    for (i <- 1 to samples) {
      col.reset()
      sampler.on = true
      val dt = run()
      sampler.on = false
      Thread.sleep(300) // let the listener bus drain before reading metrics
      val taskSum = col.stages.map(_.taskTimeMs).sum
      val wallSum = col.stages.map(_.wallMs).sum
      println(f"--- sample $i: wall=$dt%.3f s, jobs=${col.jobs}, stages=${col.stages.size}, " +
        f"sum(task run)=${taskSum / 1e3}%.3f s, sum(stage wall)=${wallSum / 1e3}%.3f s, " +
        f"outside-stages=${dt - wallSum / 1e3}%.3f s")
      if (dt < best) best = dt
      if (i == samples) {
        println(f"${"stage"}%6s ${"tasks"}%5s ${"taskMs"}%8s ${"wallMs"}%7s ${"shRdMB"}%7s ${"shWrMB"}%7s ${"spillMB"}%8s  name")
        col.stages.sortBy(-_.wallMs).foreach { s =>
          println(f"${s.id}%6d ${s.tasks}%5d ${s.taskTimeMs}%8d ${s.wallMs}%7d ${s.shuffleReadMB}%7.2f ${s.shuffleWriteMB}%7.2f ${s.spilledMB}%8.2f  ${s.name}")
        }
      }
      graft.ops.Checkpoints.sweepAll(spark)
    }
    if (sys.env.get("SPARK_GRAFT_PROFILE_STACKS").contains("1")) sampler.report(10)
    println(f"best=$best%.3f s")
    spark.stop()
  }
}
