package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Document sources/sinks (SURVEY §2.1).
  *
  * The reference's custom per-partition JSON readers (S5/S6) exist to
  * work around driver-side file listing; Spark's own json source with an
  * explicit schema does the same distributed read with pushdown and
  * corrupt-file tolerance, so that's the implementation (S1).
  */
object DocSources {

  /** S1: schema'd JSON scan (multiline-capable, corrupt-tolerant). */
  def readJson(
      s: SparkSession, path: String, schema: StructType,
      multiline: Boolean = false): DataFrame =
    s.read
      .schema(schema)
      .option("multiLine", multiline)
      .option("ignoreCorruptFiles", "true")
      .json(path)

  /** S2: parquet scan (glob/list form unions files for free). */
  def readParquet(s: SparkSession, paths: String*): DataFrame =
    s.read.parquet(paths: _*)

  /** XML scan (Spark 4 built-in; the Wikipedia-dump / sitemap ingest
    * shape): one row per `rowTag` element, schema explicit for the
    * same no-infer-pass reason as [[readCsv]]. */
  def readXml(s: SparkSession, path: String, rowTag: String,
      schema: StructType): DataFrame =
    s.read
      .format("xml")
      .option("rowTag", rowTag)
      .schema(schema)
      .load(path)

  /** CSV scan (format-breadth twin of S1): explicit schema — never
    * inferSchema, which triggers an extra full pass over 100 TB —
    * header-aware, malformed rows tolerated as nulls (PERMISSIVE). */
  def readCsv(s: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read
      .schema(schema)
      .option("header", header)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** S3: manifest scan — newline-separated parquet paths. */
  def readManifest(s: SparkSession, manifestPath: String): DataFrame = {
    val src = scala.io.Source.fromFile(manifestPath)
    try readParquet(s, src.getLines().map(_.trim).filter(_.nonEmpty).toSeq: _*)
    finally src.close()
  }

  /** S12: remote object-store scan (the reference's GCS fetch,
    * setu/main.py:141-150, downloads objects to local disk driver-side;
    * on Spark the RIGHT shape is no fetch step at all).
    *
    * Spark reads object stores natively through the Hadoop FileSystem
    * connector keyed by URI scheme — `gs://bucket/...` (GCS connector),
    * `s3a://bucket/...` (hadoop-aws), `abfss://...` (ABFS), `hdfs://`,
    * `file://`. Deployment story for a 100 TB run:
    *  1. ship the connector jar (e.g. gcs-connector or hadoop-aws) on
    *     the executor classpath;
    *  2. credentials via Hadoop conf (`spark.hadoop.fs.gs.auth.*` /
    *     `spark.hadoop.fs.s3a.*`), never in code;
    *  3. read DIRECTLY with the same `readParquet`/`readJson` calls —
    *     listing, splitting and range reads are distributed across
    *     executors, with predicate/column pushdown intact, so there is
    *     no local-disk staging bottleneck and no driver-side download.
    * This helper only validates the scheme is a configured FileSystem —
    * the local test environment ships no cloud connectors, so remote
    * schemes fail fast with a clear message instead of mid-job. */
  def readRemote(s: SparkSession, uri: String): DataFrame = {
    val u = new java.net.URI(uri)
    try org.apache.hadoop.fs.FileSystem.get(
      u, s.sparkContext.hadoopConfiguration)
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"no Hadoop FileSystem for scheme '${u.getScheme}' — ship the " +
          "connector jar (gcs-connector / hadoop-aws) and configure " +
          "spark.hadoop.fs.* credentials", e)
    }
    readParquet(s, uri)
  }

  /** ORC scan (format-breadth: the other columnar format Hive-era
    * lakes hold; Spark's reader pushes predicates and prunes columns
    * exactly as with parquet, so a migration reads in place instead of
    * converting 100 TB first). */
  def readOrc(s: SparkSession, paths: String*): DataFrame =
    s.read.orc(paths: _*)

  /** S8: overwrite parquet sink. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** ORC sink (zlib default — the ORC ecosystem's parquet-gzip). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** S9: hive-partitioned sink (downstream per-language reads prune). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Strip the `col=` prefix from hive-partitioned directories
    * (reference: setu/utilities.py:59-72 rename_partitioned_directories
    * — their downstream consumers expect bare `<value>/` dirs, e.g.
    * `hi/` not `lang=hi/`). Hadoop-FS rename, so unlike the
    * reference's os.listdir walk it works on any configured filesystem
    * (HDFS/object stores with a rename-capable committer, not just
    * local). Refuses to clobber: an existing bare-name target fails
    * loudly rather than merging two partitions silently.
    *
    * @return the renamed directory count. */
  def renamePartitionedDirs(s: SparkSession, baseDir: String,
      partitionCol: String): Int = {
    val base = new org.apache.hadoop.fs.Path(baseDir)
    val fs = base.getFileSystem(s.sparkContext.hadoopConfiguration)
    val prefix = partitionCol + "="
    val parts = fs.listStatus(base)
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
    parts.foreach { st =>
      val bare = new org.apache.hadoop.fs.Path(base,
        st.getPath.getName.substring(prefix.length))
      require(!fs.exists(bare),
        s"rename target $bare already exists — refusing to merge partitions")
      require(fs.rename(st.getPath, bare), s"rename failed: ${st.getPath}")
    }
    parts.length
  }

  /** Small-file COMPACTION: rewrite a parquet dataset into files of
    * ~`targetBytes` each. Streaming sinks and fine-grained partitioned
    * writes leave thousands of KB-scale files per directory; at 100 TB
    * the resulting listing + open overhead dominates scan time (every
    * file is a driver listing entry and an executor open/footer read).
    * The file count is computed from the dataset's actual on-disk size
    * (a FileSystem metadata walk, no data read), then one
    * `repartition(n)` round-robin shuffle balances rows across exactly
    * n writers — unlike `coalesce`, which merges without balancing and
    * can leave one giant file per original partition chain.
    *
    * @return the number of output files written. */
  def compactParquet(s: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    require(targetBytes > 0, s"targetBytes=$targetBytes must be positive")
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    // overwrite-while-reading either fails or destroys the input
    // depending on committer behavior — refuse same/nested targets
    val inQ = fs.makeQualified(p)
    val outQ = fs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    require(!(outQ == inQ || outQ.toString.startsWith(inQ.toString + "/") ||
        inQ.toString.startsWith(outQ.toString + "/")),
      s"compaction target $outQ must not equal or nest with input $inQ")
    val bytes = fs.getContentSummary(p).getLength
    val n = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    s.read.parquet(inPath).repartition(n)
      .write.mode("overwrite").parquet(outPath)
    n
  }

  /** Training-shard JSONL export: the standard LLM training-data
    * delivery format (one JSON object per line, sharded). Spark's json
    * sink IS JSONL per part-file; partitioning by the shard column —
    * typically [[graft.ops.Skew.prefixSumByKey]]-derived
    * `shard_idx` (d_shard_packing) — gives directory-per-shard layout
    * with token-budgeted shard sizes, and `maxRecordsPerFile` bounds
    * any single file. Gzip keeps the bytes-on-disk shape trainers
    * expect; compression is splittable-irrelevant here because shard
    * files are the read unit. */
  def writeJsonlShards(df: DataFrame, path: String, shardCol: String,
      maxRecordsPerFile: Long = 0L): Unit =
    df.write.mode("overwrite")
      .partitionBy(shardCol)
      .option("compression", "gzip")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .json(path)
}
