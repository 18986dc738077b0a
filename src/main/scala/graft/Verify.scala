package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // args: <sfDir> <outDir> [queryName...] — extra names run a subset
    // (local iteration); the driver passes exactly two.
    val Array(sfDir, outDir, only @ _*) = args: @unchecked
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only.contains(n) }
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(deleteRec))
      f.delete(); ()
    }
    selected.foreach { case (name, fn) =>
      // stderr marker so driver-log warnings attribute to a query
      System.err.println(s"[verify] running $name")
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Star-cap observability, wired into the gate: every oracle
        // except dd_capped_star_pairs states NO-CAP semantics, so a
        // tripped cap there means the output silently diverged from its
        // oracle — delete the dump so the compare goes red instead.
        // The query's plans all executed (the write above succeeded), so
        // an observation that failed to report within the drain deadline
        // means cap state UNKNOWN — fail closed, never fail open.
        val (caps, unreported) = graft.ops.Buckets.drainCapCounts()
        val tripped = caps.values.sum
        if (unreported.nonEmpty) {
          deleteRec(new java.io.File(s"$outDir/$name"))
          throw new IllegalStateException(
            s"cap observation(s) never reported (cap state unknown): $unreported")
        }
        if (name == "dd_capped_star_pairs") {
          // The query output carries n_capped on every row; the observe
          // metric must agree with it exactly, not merely be non-zero.
          // Exact equality assumes exactly-once accumulator updates,
          // which holds in local[n] (no stage retry / speculation); on a
          // real cluster a retried stage can over-count, so there we
          // only require tripped >= expected and warn on the overshoot.
          val expected = spark.read.parquet(s"$outDir/$name")
            .select("n_capped").head.getLong(0)
          if (!spark.sparkContext.isLocal && tripped >= expected) {
            if (tripped > expected) System.err.println(
              s"[verify] $name: observe metric $tripped > n_capped " +
                s"$expected (accumulator over-count under retry; tolerated off-local)")
          } else if (tripped != expected) {
            deleteRec(new java.io.File(s"$outDir/$name"))
            throw new IllegalStateException(
              s"observe metric $tripped != query n_capped $expected: $caps")
          }
        } else if (tripped != 0) {
          deleteRec(new java.io.File(s"$outDir/$name"))
          throw new IllegalStateException(
            s"star cap tripped under a no-cap oracle: $caps")
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Discard observations a failed plan left behind — they must
        // not be attributed to the NEXT query's drain.
        val _ = graft.ops.Buckets.drainCapCounts(timeoutMs = 100)
      }
      // Drop cached plans / lingering localCheckpoints between queries:
      // 250+ queries in one JVM would otherwise accumulate block-manager
      // state (memory pressure, not correctness).
      graft.ops.Checkpoints.sweepAll(spark)
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
