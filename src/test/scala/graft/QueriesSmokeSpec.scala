package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must execute at sf0.001; entry must be
  * non-empty (the driver's t1 smoke). */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name executes") {
      val n = fn(spark, TestSpark.Sf).count()
      assert(n >= 0)
    }
  }

  test("oracle keys are a subset of query names") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
