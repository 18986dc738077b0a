package graft.tools

import graft.{SparkEntry, TestSpark}

/** Scratch audit: physical-plan shapes of the round-12 additions —
  * checks for the scale smells (non-broadcast small sides, cartesian
  * products, missing pushdown, unexpected exchanges). */
object R12PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (q <- Seq("e_knn_hnsw", "e_hnsw_recall", "pipeline_e2e_dom",
        "d_dom_markdown_tables", "q_hll_distinct", "q_hll_union",
        "d_kendall_tau", "ev_mann_kendall", "e_modularity",
        "d_lang_source_mi", "mm_shot_detect", "d_corpus_checksum")) {
      val df = SparkEntry.queries(q)(spark, TestSpark.Sf)
      val plan = df.queryExecution.executedPlan.toString
      println(s"===== $q =====")
      println(plan.take(3600))
      println(s"[audit] $q: exchanges=" +
        "Exchange".r.findAllIn(plan).size +
        " broadcasts=" + "BroadcastExchange".r.findAllIn(plan).size +
        " cartesian=" + plan.contains("CartesianProduct") +
        " wholestage=" + "WholeStageCodegen".r.findAllIn(plan).size)
    }
  }
}
