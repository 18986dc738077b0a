package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}

/** Skew-handling utilities. AQE's skew-join splitting covers joins; these
  * cover the aggregation side (a hot groupBy key melting one reducer)
  * and global ranking (a single-partition window sort) — the two shapes
  * AQE can't fix for you.
  */
object Skew {

  /** Two-phase (salted) aggregation: partial aggregate on (keys, salt),
    * then merge on keys. The hot key's rows spread over `saltBuckets`
    * reducers in phase 1; phase 2 only sees `saltBuckets` partial rows
    * per key. `aggs` must be mergeable pairs: (partial expr, merge expr
    * over the partial column name). */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int)(
      partials: (String, Column)*)(
      merges: (String, String => Column)*): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head._2(merges.head._1).as(merges.head._1),
        merges.tail.map { case (n, f) => f(n).as(n) }: _*)
  }

  /** Scalable global row_number: partition-local ranks + an offset merge
    * from per-partition counts (tiny driver array), instead of pulling
    * every row through one unpartitioned window sort.
    * Rows are range-partitioned by the sort key first so partition-local
    * order concatenates to global order. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], n: Int = 0,
      literalMapMaxParts: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // Materialize once: the counts job and the rank job must see the SAME
    // partitioning — re-executing repartitionByRange re-samples range
    // boundaries per run, which would let offsets drift from the final
    // partition contents.
    val withPart = sorted.withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // bounded collect: exactly one 12-byte row per partition of the
    // range shuffle (cluster-config-sized, not data-sized) — no key
    // cardinality can inflate it, unlike prefixSumsByKey's partials
    val counts = withPart.groupBy($"_pid").count()
      .as[(Int, Long)].collect().sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid + 1, acc + c) }
      .take(counts.length).map(_._2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"_pid").orderBy(orderCols: _*)
    if (counts.length <= literalMapMaxParts) {
      // Few partitions: bake the (pid → offset) table into the plan as a
      // literal map — element_at stays inside whole-stage codegen, where
      // a lookup UDF would break the rank projection out of it. Literal
      // maps have NO hash index (ArrayBasedMapData scans keys linearly),
      // which is why this path is gated on partition count.
      val offsetMap = map_from_arrays(
        typedlit(counts.map(_._1).toSeq), typedlit(offsets.toSeq))
      withPart
        .withColumn("rn",
          row_number().over(w).cast("long") + element_at(offsetMap, $"_pid"))
        .drop("_pid")
    } else {
      // Many partitions (a 100 TB run range-partitions into 1e4+): an
      // O(#parts)-per-row key scan regresses past the UDF it replaced —
      // broadcast-hash-join the offset table on _pid instead (O(1)
      // probes, and the join is on the rank stage's existing rows, no
      // extra shuffle).
      val offsetsDf = counts.map(_._1).zip(offsets).toSeq.toDF("_pid", "_off")
      withPart
        .join(broadcast(offsetsDf), Seq("_pid"))
        .withColumn("rn", row_number().over(w).cast("long") + $"_off")
        .drop("_pid", "_off")
    }
  }

  /** Scalable keyed prefix sum (inclusive running total of `value`
    * within each `key` group, ordered by `orderCols`): the running-sum
    * twin of [[globalRowNumber]]. A plain
    * `sum().over(Window.partitionBy(key).orderBy(...))` funnels every
    * row of a key through ONE reducer — with a handful of language
    * strata over 100 TB that is billions of rows per task. Here rows
    * are range-partitioned by (key, order) so each key occupies a run
    * of partitions, partials are summed per (partition, key) — a tiny
    * driver-side table, #partitions × #keys — and the per-partition
    * running sum is shifted by the broadcast offset. Result is
    * bit-identical to the single-reducer window (Long arithmetic is
    * associative), which TrainingPrepSpec pins.
    *
    * `value` must be integral (summed as Long) so the split-and-shift
    * recomposition is exact. */
  def prefixSumByKey(
      df: DataFrame,
      key: String,
      orderCols: Seq[Column],
      value: Column,
      out: String): DataFrame =
    prefixSumsByKey(df, key, orderCols, Seq(value -> out))

  /** [[prefixSumByKey]] over SEVERAL value columns in one pass: one
    * range shuffle, one checkpoint, one partials collect and one
    * broadcast join cover every running total (a per-column call would
    * repeat all four). Needed wherever two cumulative counts advance in
    * lockstep over the same sorted frame — e.g. the two ECDFs of a
    * Kolmogorov–Smirnov scan. Semantics per column are exactly
    * [[prefixSumByKey]] (inclusive running Long total within `key`
    * ordered by `orderCols`, bit-identical to the single-reducer
    * window). */
  /** Driver-memory ceiling for the (partition × key) partials collect:
    * one row per partition per distinct key. Every intended caller has
    * keys of bounded cardinality (event types, languages, a constant);
    * a high-cardinality key (user_id, doc_id) would OOM the driver
    * SILENTLY without this gate — fail loudly instead, naming the key. */
  private val MaxPrefixPartials = 100000

  /** Scalable EXCLUSIVE global prefix minimum (for each row, the
    * minimum of `value` over all rows STRICTLY BEFORE it in
    * `orderCols` order; null on the global first row): the running-min
    * twin of [[globalRowNumber]], built the same way — range-partition
    * by the order key, one bounded collect of per-partition minima
    * (one row per partition, cluster-config-sized), exclusive
    * cumulative minima broadcast back, and a partition-LOCAL window
    * (never an unpartitioned sort) for the within-partition prefix.
    * Min is associative/idempotent so the split-and-shift
    * recomposition is exact — bit-identical to the single-reducer
    * `min().over(Window.orderBy(...).rowsBetween(-inf, -1))`.
    *
    * The canonical consumer is the skyline/Pareto-front scan: sorted
    * by one objective, a row survives iff the exclusive prefix min of
    * the other objective does not dominate it — O(n log n) where the
    * textbook NOT EXISTS self-join is O(n^2).
    *
    * `value` must be integral (compared as Long). Order keys must be
    * globally distinct (the caller pre-groups to one row per key) so
    * "strictly before in row order" = "strictly smaller order key". */
  def exclusivePrefixMin(
      df: DataFrame,
      orderCols: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    require(!df.columns.contains(out),
      s"exclusivePrefixMin: output name '$out' collides with an input column")
    val spark = df.sparkSession
    import spark.implicits._
    val sorted = df.repartitionByRange(orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
    // materialize once — same range-boundary rationale as globalRowNumber
    val withPart = sorted.withColumn("_v", value.cast("long"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    val partials = withPart.groupBy($"_pid").agg(min($"_v").as("m"))
      .as[(Int, Long)].collect().sortBy(_._1)
    // exclusive scan: offset for partition p = min over partitions < p
    val offsets = partials.scanLeft((0, Option.empty[Long])) {
      case ((_, acc), (pid, m)) =>
        (pid + 1, Some(acc.fold(m)(math.min(_, m))))
    }.take(partials.length).map(_._2)
    val offRows = partials.map(_._1).zip(offsets).map { case (pid, off) =>
      Row(pid, off.map(Long.box).orNull)
    }
    val offSchema = StructType(Seq(
      StructField("_pid", IntegerType, nullable = false),
      StructField("_off", LongType, nullable = true)))
    val offsetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offRows.toSeq, 1), offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"_pid").orderBy(orderCols: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // least() skips nulls (null local prefix on a partition's first row,
    // null offset on the first partition) — exactly the semantics the
    // exclusive-prefix recomposition needs
    withPart
      .join(broadcast(offsetsDf), Seq("_pid"))
      .withColumn(out, least(min($"_v").over(w), $"_off"))
      .drop("_pid", "_v", "_off")
  }

  def prefixSumsByKey(
      df: DataFrame,
      key: String,
      orderCols: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    require(values.nonEmpty, "prefixSumsByKey needs at least one value column")
    val outNames = values.map(_._2)
    require(outNames.distinct.size == outNames.size,
      s"prefixSumsByKey: duplicate output names ${outNames.mkString(", ")}")
    // col("*") +: sums would silently emit DUPLICATE columns if an
    // output name already exists on the input (ambiguous downstream) —
    // reject up front.
    val collide = outNames.filter(df.columns.contains)
    require(collide.isEmpty,
      s"prefixSumsByKey: output name(s) ${collide.mkString(", ")} collide " +
        "with input columns — rename the output or drop the input column")
    val spark = df.sparkSession
    import spark.implicits._
    val sortCols = col(key) +: orderCols
    val sorted = df.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    // Same materialize-once rationale as globalRowNumber: the partials
    // job and the final job must see identical range boundaries.
    // The partials collect goes through a string image of the key so
    // the API works for any key type (int doc ids, dates, …), not just
    // StringType — casting to string is injective per distinct value,
    // and the offsets join keys on the same casted column.
    val vCols = values.indices.map(i => s"_v$i")
    val offCols = values.indices.map(i => s"_off$i")
    val withPart = values.zip(vCols)
      .foldLeft(sorted) { case (d, ((c, _), vn)) =>
        d.withColumn(vn, c.cast("long"))
      }
      .withColumn("_kstr", col(key).cast("string"))
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint()
    // limit(max+1) bounds what can ever reach the driver: if the guard
    // trips we never held more than max+1 rows, so the failure mode is
    // an exception, not an OOM after the fact.
    val partialRows = withPart.groupBy($"_pid", $"_kstr")
      .agg(sum(col(vCols.head)).as(vCols.head),
        vCols.tail.map(n => sum(col(n)).as(n)): _*)
      .limit(MaxPrefixPartials + 1)
      .collect()
    require(partialRows.length <= MaxPrefixPartials,
      s"prefixSumsByKey: partition×key partials for key '$key' exceed " +
        s"$MaxPrefixPartials rows — '$key' is too high-cardinality for " +
        "the broadcast-offset prefix sum (use a bounded-cardinality key, " +
        "or a per-key window if the key is the parallelism unit)")
    val partials = partialRows
      .map(r => (r.getInt(0), r.getString(1),
        vCols.indices.map(i => r.getLong(2 + i)).toArray))
    val offsetRows = partials
      .groupBy(_._2).toSeq
      .flatMap { case (k, rows) =>
        val byPid = rows.sortBy(_._1)
        val cums = byPid.scanLeft(Array.fill(values.size)(0L)) {
          (acc, r) => acc.zip(r._3).map { case (a, b) => a + b }
        }
        byPid.map(_._1).zip(cums).map { case (pid, off) =>
          Row.fromSeq(pid +: k +: off.toSeq)
        }
      }
    val offSchema = StructType(
      StructField("_pid", IntegerType, nullable = false) +:
        StructField("_kstr", StringType, nullable = true) +:
        offCols.map(n => StructField(n, LongType, nullable = false)))
    val offsets = spark.createDataFrame(
      spark.sparkContext.parallelize(offsetRows, 1), offSchema)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"_pid", $"_kstr").orderBy(orderCols: _*)
    val joined = withPart.join(broadcast(offsets), Seq("_pid", "_kstr"))
    // ONE select carrying every running sum: same window spec → the
    // analyzer plans a single WindowExec (a withColumn per value would
    // stack one Window operator per column)
    val sums = values.zipWithIndex.map { case ((_, out), i) =>
      (sum(col(vCols(i))).over(w) + col(offCols(i))).as(out)
    }
    joined
      .select(col("*") +: sums: _*)
      .drop("_pid" +: "_kstr" +: (vCols ++ offCols): _*)
  }
}
