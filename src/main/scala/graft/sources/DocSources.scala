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

  /** S3: manifest scan — newline-separated parquet paths. */
  def readManifest(s: SparkSession, manifestPath: String): DataFrame = {
    val src = scala.io.Source.fromFile(manifestPath)
    try readParquet(s, src.getLines().map(_.trim).filter(_.nonEmpty).toSeq: _*)
    finally src.close()
  }

  /** S8: overwrite parquet sink. */
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** S9: hive-partitioned sink (downstream per-language reads prune). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
