package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for every bench-flagged spec to
  * <outDir>/<name>_<tag>.txt — the plan evidence for the optimization
  * rounds (guide §1: capture plan shape before and after each change).
  *
  * Streaming rows (st_*) execute their micro-batch query inside the
  * spec fn and return a memory-sink table, so the batch `explain` of
  * the returned frame is just a LocalTableScan; those rows get a note
  * instead of a misleading plan. Usage:
  *   sbt "runMain graft.ExplainDump plans/r14 before [name...]"
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r14")
    val tag = if (args.length > 1) args(1) else "before"
    val only = args.drop(2).toSet
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
    Files.createDirectories(Paths.get(outDir))
    val specs = SparkEntry.benchQueries
      .filter(sp => only.isEmpty || only.contains(sp.name))
    specs.foreach { sp =>
      val path = Paths.get(outDir, s"${sp.name}_$tag.txt")
      val text =
        if (sp.name.startsWith("st_"))
          "streaming query: plan is per-micro-batch (memory sink); " +
            "see OPTIMIZATION notes for the stateful operator shape\n"
        else
          try {
            val df = sp.fn(spark, sfDir)
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
          } catch {
            case e: Throwable => s"explain failed: ${e.getMessage}\n"
          }
      Files.writeString(path, text)
      System.err.println(s"[explain] wrote $path")
      graft.ops.Checkpoints.sweepAll(spark)
    }
    spark.stop()
  }
}

/** Plan evidence for the r15 graph-edge-build change that the bench
  * rows cannot show: every pagerank/centrality query localCheckpoints
  * its edges, so their `explain` truncates at an ExistingRDD and the
  * LSH scaffold underneath never prints. This main dumps the
  * [[graft.queries.Similarity.lshLabelEdges]] plan itself, plus the
  * pre-r15 form (reconstructed inline: full band-bucket pairs →
  * cosine verify → label joins → label filter) for the side-by-side
  * diff. Usage: runMain graft.ExplainEdges <outDir> */
object ExplainEdges {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r15")
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
    Files.createDirectories(Paths.get(outDir))
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sfDir, "embeddings")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = Paths.get(outDir, s"$name.txt")
      Files.writeString(p, df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      System.err.println(s"[explain] wrote $p")
    }
    // pre-r15 form: all (band, key) bucket pairs -> payload joins +
    // cosine verify -> two label joins -> label filter
    val lbl = emb.select(col("vec_id"), col("label"))
    val legacy = graft.ops.Vectors.neardupLsh(emb, threshold = 0.35)
      .join(lbl.select(col("vec_id").as("id_a"), col("label").as("la")),
        Seq("id_a"))
      .join(lbl.select(col("vec_id").as("id_b"), col("label").as("lb")),
        Seq("id_b"))
      .filter(col("la") === col("lb"))
      .select(col("id_a"), col("id_b"))
    dump("lsh_label_edges_before", legacy)
    dump("lsh_label_edges_after",
      graft.queries.Similarity.lshLabelEdges(emb, threshold = 0.35))
    spark.stop()
  }
}
