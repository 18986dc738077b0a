package graft.tools
import org.apache.spark.sql.functions._
import graft.{Sessions, Tables}
/** Dev probe for cross-engine float->decimal parity (round-9 bug):
  * dumps the Spark-side embedding-outlier distances and centroid head
  * in hex for direct comparison against DuckDB's CTE values. Keep —
  * this is the fastest way to localize a 1-ulp-level oracle
  * divergence to a specific arithmetic step. */
object DistProbe {
  def main(args: Array[String]): Unit = {
    val s = Sessions.local(8)
    import s.implicits._
    val emb = Tables.load(s, "/root/testdata/sf0.1", "embeddings")
    val cent = emb
      .select($"label", posexplode($"embedding").as(Seq("pos", "v")))
      .groupBy($"label", $"pos")
      .agg((sum($"v".cast("decimal(28,14)")).cast("double") /
        count(lit(1))).as("c"))
      .groupBy($"label")
      .agg(transform(array_sort(collect_list(struct($"pos", $"c"))),
        p => p.getField("c")).as("cent"))
    val d = emb.join(broadcast(cent), "label")
      .filter($"vec_id".isin(981L, 1494L))
      .select($"vec_id", $"cent",
        sqrt(aggregate(
          zip_with($"embedding", $"cent",
            (x, h) => (x.cast("double") - h) * (x.cast("double") - h)),
          lit(0.0d), (acc, v) => acc + v)).as("dist"))
      .collect()
    d.foreach { r =>
      println(s"[probe] vec=${r.getLong(0)} dist=${java.lang.Double.toHexString(r.getDouble(2))} ${r.getDouble(2)}")
      println(s"[probe] cent0..3=${r.getSeq[Double](1).take(4).map(java.lang.Double.toHexString).mkString(",")}")
    }
    s.stop()
  }
}
