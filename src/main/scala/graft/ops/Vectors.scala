package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-similarity operators over `array<float>` columns — all
  * built-in HOFs (zip_with + left-fold aggregate), so the dot product
  * stays codegen'd and deterministic (sequential fold, exactly
  * mirrorable in an oracle).
  *
  * Scale path: brute-force top-k broadcasts the (small) query set
  * against the corpus — one scan, no shuffle of the big side; the
  * partitioned variant prunes candidates by a cell/bucket column first
  * (IVF shape: probe only matching cells). Norms are precomputed once
  * per side, never per pair.
  */
object Vectors {

  /** Sequential-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Scored pairs → per-query top-k via the typed TopK aggregator:
    * map-side partial top-k means each partition ships ≤k entries per
    * query, instead of a window sorting every scored pair through one
    * exchange. Tie semantics (score desc, id asc) match row_number. */
  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val s = scored.sparkSession
    import s.implicits._
    scored.select(col("qid"), col("cos_sim"), col("cid"))
      .as[(Long, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(TopK.aggregator(k).toColumn)
      .flatMap { case (qid, hits) =>
        hits.iterator.zipWithIndex.map { case ((score, cid), i) =>
          (qid, (i + 1).toLong, cid, score)
        }
      }
      .toDF("qid", "rk", "cid", "cos_sim")
  }

  /** Brute-force cosine top-k: every query row against every corpus row.
    * @param queries (id, vec); broadcast — keep it small.
    * @param corpus  (id, vec) plus optional carry columns. */
  def knnBrute(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(q, col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, k)
  }

  /** Cell-pruned (IVF-style) cosine top-k: candidates restricted to the
    * query's cell (here a precomputed partition column — with learned
    * centroids this is the nearest-centroid assignment). */
  def knnCell(queries: DataFrame, corpus: DataFrame, cellCol: String, k: Int)
      : DataFrame = {
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"), col(cellCol).as("cell"))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"), col(cellCol).as("cell"))
      .withColumn("cn", norm(col("cv")))
    val scored = c.join(q, Seq("cell")).filter(col("qid") =!= col("cid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(scored, k)
  }
}
