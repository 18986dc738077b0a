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

  /** int8 scalar quantization: each vector scaled into [-127,127] by
    * its own max-abs (scale carried alongside for exact dot recovery
    * up to quantization error). The 100 TB memory lever: 4× smaller
    * than float32, integer dot products for coarse scoring. */
  def quantize(vec: Column): Column = {
    val maxAbs = array_max(transform(vec, v => abs(v.cast("double"))))
    struct(
      transform(vec, v =>
        round(v.cast("double") / maxAbs * 127).cast("int")).as("q"),
      (maxAbs / 127).as("scale"))
  }

  /** Quantized coarse dot product (exactly mirrors the float path's
    * fold but over int8 codes × scales). */
  def dotQuantized(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.getField("q"), b.getField("q"),
        (x, y) => (x * y).cast("long")),
      lit(0L), (acc, v) => acc + v).cast("double") *
      a.getField("scale") * b.getField("scale")

  /** Two-stage ANN: coarse top-`rerank` by quantized cosine, exact
    * re-rank of those to top-k. The corpus scan reads int8 codes; the
    * float vectors are fetched only for the shortlisted candidates. */
  def knnQuantized(queries: DataFrame, corpus: DataFrame, k: Int,
      rerank: Int = 50): DataFrame = {
    val q = broadcast(queries
      .select(col("id").as("qid"), col("vec").as("qv"))
      .withColumn("qq", quantize(col("qv")))
      .withColumn("qn", norm(col("qv"))))
    val c = corpus
      .select(col("id").as("cid"), col("vec").as("cv"))
      .withColumn("cq", quantize(col("cv")))
      .withColumn("cn", norm(col("cv")))
    val coarse = c.join(q, col("qid") =!= col("cid"))
      .withColumn("cos_sim",
        dotQuantized(col("qq"), col("cq")) / (col("qn") * col("cn")))
    val shortlist = topK(coarse, rerank)
      .select(col("qid"), col("cid"))
    val exact = shortlist
      .join(c.select(col("cid"), col("cv"), col("cn")), Seq("cid"))
      .join(q.select(col("qid"), col("qv"), col("qn")), Seq("qid"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv"), col("qn"), col("cn")))
    topK(exact, k)
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
