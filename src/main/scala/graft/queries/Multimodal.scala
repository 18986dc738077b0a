package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Multimodal => MM}

object Multimodal {

  /** Binary decode→metadata pipeline; the oracle replays the stub's
    * arithmetic on the UTF-8 text bytes (md5(varchar) hashes UTF-8 in
    * DuckDB, same bytes the Spark side digests). */
  val mmDecodeMeta: Spec = Spec(
    "mm_decode_meta",
    oracle = Some("""
      SELECT doc_id,
        CAST(strlen(text) AS BIGINT) AS byte_len,
        CAST(640 + strlen(text) % 1280 AS BIGINT) AS width,
        CAST(360 + (strlen(text) * 7) % 720 AS BIGINT) AS height,
        CAST(1 + strlen(text) % 100 AS BIGINT) AS n_frames,
        md5(text) AS checksum
      FROM documents WHERE doc_id % 10 = 0 ORDER BY doc_id""")) { (s, dir) =>
    import s.implicits._
    MM.extractMeta(
        MM.asBlobs(s, Tables.load(s, dir, "documents").filter($"doc_id" % 10 === 0)))
      .toDF()
      .orderBy($"doc_id")
  }

  val specs: Seq[Spec] = Seq(mmDecodeMeta)
}
