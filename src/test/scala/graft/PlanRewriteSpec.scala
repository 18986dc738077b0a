package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.WindowDedupToAgg

/** Pins for the WindowDedupToAgg optimizer rule: plan shape (the
  * window-dedup idiom becomes a hash aggregate), result equality
  * against the un-rewritten window form on real testdata, and the
  * guard conditions that must keep the rule silent. */
class PlanRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val em = spark.sessionState.experimentalMethods
    val prev = em.extraOptimizations
    em.extraOptimizations = prev :+ WindowDedupToAgg
    try body finally em.extraOptimizations = prev
  }

  private def naiveDedup(): DataFrame = {
    val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
    spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
  }

  private def hasWindow(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case w: LWindow => w }.nonEmpty
  private def hasAggregate(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty

  test("rn=1 window dedup rewrites to min_by aggregate, results identical") {
    val baseline = naiveDedup().collect().toSet
    assert(hasWindow(naiveDedup()) && !hasAggregate(naiveDedup()))
    withRule {
      val rewritten = naiveDedup()
      assert(!hasWindow(rewritten), "rule must eliminate the Window node")
      assert(hasAggregate(rewritten), "rule must introduce the aggregate")
      assert(rewritten.collect().toSet == baseline)
      // rn column survives as literal 1 under the original reference
      assert(rewritten.select($"rn").distinct().collect()
        .map(_.getInt(0)).toSeq == Seq(1))
      // downstream operations over the rewritten attributes still resolve
      val downstream = naiveDedup()
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
        .orderBy($"l_returnflag").collect()
      assert(downstream.nonEmpty)
    }
  }

  test("rn<=1 and 1=rn shapes rewrite; ties refine deterministically-safely") {
    withRule {
      val w = Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")
      val le = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
        .withColumn("rn", row_number().over(w)).filter($"rn" <= 1)
      assert(!hasWindow(le))
      // tie on the order key: both forms must return one row per key
      // whose key/order columns are the (unique) minimums
      val tied = Seq((1, 5, "a"), (1, 5, "b"), (2, 3, "c"), (2, 7, "d"))
        .toDF("k", "o", "payload")
        .withColumn("rn", row_number().over(
          Window.partitionBy($"k").orderBy($"o")))
        .filter(lit(1) === $"rn")
      assert(!hasWindow(tied))
      val rows = tied.select($"k", $"o").orderBy($"k").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSeq
      assert(rows == Seq((1, 5), (2, 3)))
    }
  }

  test("guards: desc order, rank!=1, multiple window exprs stay windows") {
    withRule {
      val base = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
      val desc = base.withColumn("rn", row_number().over(
        Window.partitionBy($"l_orderkey").orderBy($"l_linenumber".desc)))
        .filter($"rn" === 1)
      assert(hasWindow(desc), "descending order must not rewrite")
      val second = base.withColumn("rn", row_number().over(
        Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")))
        .filter($"rn" === 2)
      assert(hasWindow(second), "rn=2 must not rewrite")
      val rk = base.withColumn("rn", rank().over(
        Window.partitionBy($"l_orderkey").orderBy($"l_linenumber")))
        .filter($"rn" === 1)
      assert(hasWindow(rk), "rank() (emits ties) must not rewrite")
      val global = base.withColumn("rn", row_number().over(
        Window.orderBy($"l_orderkey", $"l_linenumber"))).filter($"rn" === 1)
      assert(hasWindow(global),
        "empty partition spec must not rewrite (empty-input divergence)")
    }
  }

  test("GraftExtensions injects the rule (config-driven deployment path)") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
    val rules = org.apache.spark.sql.graft.testbridge.optimizerRules(ext, spark)
    assert(rules.exists(_ eq WindowDedupToAgg))
  }
}
