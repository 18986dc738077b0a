package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("cid"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), col("cos_sim"))
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
    val w = Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("cid"))
    scored
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), col("cos_sim"))
  }
}
