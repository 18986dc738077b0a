package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.ops.Skew

/** Skew utilities must be drop-in equivalent to their naive forms. */
class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("saltedAgg == direct groupBy (sum/count) on a skewed key") {
    val li = spark.read.parquet(s"${TestSpark.Sf}/lineitem.parquet")
    val direct = li.groupBy($"l_returnflag")
      .agg(sum($"l_quantity").cast("decimal(18,2)").as("q"),
        count(lit(1)).as("n"))
      .as[(String, java.math.BigDecimal, Long)].collect().toSet
    val salted = Skew.saltedAgg(li, Seq("l_returnflag"), 8)(
      ("q", sum($"l_quantity".cast("decimal(18,2)"))),
      ("n", count(lit(1))))(
      ("q", c => sum(col(c)).cast("decimal(18,2)")),
      ("n", c => sum(col(c))))
      .as[(String, java.math.BigDecimal, Long)].collect().toSet
    assert(salted.map(t => (t._1, t._2.doubleValue, t._3)) ==
      direct.map(t => (t._1, t._2.doubleValue, t._3)))
  }

  test("globalRowNumber == unpartitioned window row_number") {
    val part = spark.read.parquet(s"${TestSpark.Sf}/part.parquet")
    val order = Seq($"p_retailprice".desc, $"p_partkey".asc)
    val expected = part
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select($"p_partkey", $"rn").as[(Long, Long)].collect().toMap
    val got = Skew.globalRowNumber(part, order)
      .select($"p_partkey", $"rn").as[(Long, Long)].collect().toMap
    assert(got == expected)

    // High-partition-count path: offsets merge via a broadcast join
    // instead of an O(#parts)-per-row literal-map scan. Forcing the
    // threshold to 0 must not change a single rank.
    val broadcastPath = Skew.globalRowNumber(part, order, literalMapMaxParts = 0)
      .select($"p_partkey", $"rn").as[(Long, Long)].collect().toMap
    assert(broadcastPath == expected)
  }
}
