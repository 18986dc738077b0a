package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ops.{Hll, TDigest}

/** Star-schema relational operators (SURVEY §2.2-§2.7): aggregation,
  * equi-joins (broadcast + shuffle), semi/anti joins, windows, top-k,
  * set ops, rollup, pivot, percentiles.
  *
  * Scale notes (100 TB design): dims (region/nation/supplier/part/
  * customer) are broadcast explicitly where they are orders-of-magnitude
  * smaller than the fact table, so the big join never shuffles lineitem
  * more than once; aggregates are single hash-aggregates with map-side
  * partials (never the reference's join-of-aggregates, SURVEY J1);
  * windows partition by high-cardinality keys so state stays bounded.
  */
object Relational {

  /** Exact, order-independent sum of a double column via decimal. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  private val dsumSql = (c: String) =>
    s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"

  /** TPC-H Q1-style pricing summary: one hash aggregate over the fact
    * table — partial aggregation map-side means the shuffle carries only
    * |groups| x |partitions| rows regardless of input scale. */
  val q1PricingSummary: Spec = Spec(
    "q1_pricing_summary",
    oracle = Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${dsumSql("l_quantity")} AS sum_qty,
        ${dsumSql("l_extendedprice")} AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
        COUNT(*) AS count_order
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** TPC-H Q3-style. No broadcast hints: customer and orders both grow
    * linearly with scale factor, so pinning either side OOMs executors
    * at 100× (hints override AQE's size check). AQE picks broadcast at
    * small SF via `autoBroadcastJoinThreshold` and degrades to a
    * shuffled join when the filtered sides outgrow it — the plan is
    * size-driven, not pinned (PlanSpec asserts the AQE choice). */
  val q3TopOrders: Spec = Spec(
    "q3_top_orders",
    oracle = Some("""
      SELECT l_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        strftime(o_orderdate, '%Y-%m-%d') AS order_date, o_orderpriority
      FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    val cust = Tables.load(s, dir, "customer").filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.load(s, dir, "orders")
      .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp_ntz"))
    val li = Tables.load(s, dir, "lineitem")
      .filter($"l_shipdate" > lit("1998-01-01").cast("timestamp_ntz"))
    li.join(ord.join(cust, $"o_custkey" === $"c_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
        .cast("double").as("revenue"))
      .select($"l_orderkey", $"revenue",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_date"),
        $"o_orderpriority")
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }

  /** TPC-H Q5-style star join: revenue per region/nation. Only the
    * BOUNDED dims (nation: 25 rows, region: 5 rows — fixed cardinality
    * at every scale factor) carry broadcast hints; supplier and
    * customer grow with SF, so their join strategy is left to AQE: at
    * small SF it still broadcasts them via the size threshold, at 100×
    * it degrades to shuffled joins instead of OOMing on a forced
    * multi-GB broadcast. */
  val q5RegionRevenue: Spec = Spec(
    "q5_region_revenue",
    oracle = Some("""
      SELECT r_name, n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""),
    bench = true) { (s, dir) =>
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val sup = Tables.load(s, dir, "supplier")
    val ord = Tables.load(s, dir, "orders")
    val cust = Tables.load(s, dir, "customer")
    val nat = Tables.load(s, dir, "nation")
    val reg = Tables.load(s, dir, "region")
    li.join(sup, $"l_suppkey" === $"s_suppkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .join(cust,
        $"o_custkey" === $"c_custkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"r_name", $"n_name")
  }

  /** Semi-join (EXISTS): orders with at least one line shipped >30 days
    * after the order date, counted per priority. Left-semi keeps only the
    * probe side flowing — no row multiplication. */
  val q4LateShipments: Spec = Spec(
    "q4_late_shipments",
    oracle = Some("""
      SELECT o_orderpriority, COUNT(*) AS n_orders
      FROM orders o
      WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority""")) { (s, dir) =>
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    ord.join(li,
        $"l_orderkey" === $"o_orderkey" &&
          $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"o_orderpriority")
  }

  /** Anti-join (NOT EXISTS): customers with no large order, per segment
    * (every synthetic customer has ≥1 order, so the filter keeps the
    * result non-degenerate). */
  val qAntiCustomers: Spec = Spec(
    "q_anti_customers",
    oracle = Some("""
      SELECT c_mktsegment, COUNT(*) AS n_customers, MIN(c_custkey) AS min_custkey
      FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000)
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment""")) { (s, dir) =>
    import s.implicits._
    val cust = Tables.load(s, dir, "customer")
    val bigOrders = Tables.load(s, dir, "orders").filter($"o_totalprice" > 250000)
    cust.join(bigOrders, $"o_custkey" === $"c_custkey", "left_anti")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"), min($"c_custkey").as("min_custkey"))
      .orderBy($"c_mktsegment")
  }

  /** Top-k per group via row_number window — the scalable top-k pattern
    * (rank state per partition; no global sort of the input). */
  val qTopPartsPerBrand: Spec = Spec(
    "q_top_parts_per_brand",
    oracle = Some("""
      SELECT p_brand, rk, p_partkey, p_retailprice
      FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS rk
        FROM part)
      WHERE rk <= 3
      ORDER BY p_brand, rk""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"p_brand").orderBy($"p_retailprice".desc, $"p_partkey")
    Tables.load(s, dir, "part")
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 3)
      .select($"p_brand", $"rk", $"p_partkey", $"p_retailprice")
      .orderBy($"p_brand", $"rk")
  }

  /** [[qTopPartsPerBrand]]'s idiom RIDING the
    * [[graft.plans.WindowTopKToAgg]] optimizer rule: the body writes
    * the plain `row_number <= 3` window form (the shape users
    * migrating from other engines write), installs the graft rules —
    * the programmatic twin of `spark.sql.extensions=GraftExtensions` —
    * and REQUIREs in-plan that the Window node became the bounded
    * top-n aggregate + explode before returning, so the green driver
    * row proves the rule fired AND preserved semantics against the
    * window-form oracle (p_partkey makes the order total, so the
    * result is deterministic on both engines). Same install
    * scoped-install discipline (RuleScope.withRules, restored in
    * finally) as d_unique_tokens_rewritten. */
  val qTopKRewritten: Spec = Spec(
    "q_topk_per_group_rewritten",
    oracle = Some("""
      SELECT p_brand, p_partkey, p_retailprice, CAST(rk AS INTEGER) AS rk
      FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          row_number() OVER (PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey) AS rk
        FROM part)
      WHERE rk <= 3
      ORDER BY p_brand, rk""")) { (s, dir) =>
    import s.implicits._
    graft.plans.RuleScope.withRules(s, Seq(graft.plans.WindowTopKToAgg)) {
      val w = Window.partitionBy($"p_brand")
        .orderBy($"p_retailprice".desc, $"p_partkey")
      val df = Tables.load(s, dir, "part")
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 3)
        .select($"p_brand", $"p_partkey", $"p_retailprice", $"rk")
        .orderBy($"p_brand", $"rk")
      require(df.queryExecution.optimizedPlan.collect {
          case wn: org.apache.spark.sql.catalyst.plans.logical.Window => wn
        }.isEmpty,
        "WindowTopKToAgg did not fire on the top-k idiom")
      df
    }
  }

  /** The ARGMAX idiom riding [[graft.plans.WindowMaxFilterToJoin]]:
    * every lineitem achieving its order's maximum quantity — quantities
    * are coarse integers, so TIES ARE REAL and the oracle's window form
    * must keep every tied row, which is exactly what makes this rewrite
    * caveat-free (no pick nondeterminism to refine). The body writes
    * the window form, installs the graft rules, and REQUIREs the
    * Window node became the agg + null-safe join before returning.
    * Restricted to a supplier slice to keep the verify output bounded. */
  val qArgmaxRewritten: Spec = Spec(
    "q_argmax_rewritten",
    oracle = Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, mx
      FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
          MAX(l_quantity) OVER (PARTITION BY l_orderkey) AS mx
        FROM lineitem WHERE l_suppkey <= 40)
      WHERE l_quantity = mx
      ORDER BY l_orderkey, l_linenumber""")) { (s, dir) =>
    import s.implicits._
    graft.plans.RuleScope.withRules(s,
        Seq(graft.plans.WindowMaxFilterToJoin)) {
      val w = Window.partitionBy($"l_orderkey")
      val df = Tables.load(s, dir, "lineitem")
        .filter($"l_suppkey" <= 40)
        .withColumn("mx", max($"l_quantity").over(w))
        .filter($"l_quantity" === $"mx")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"mx")
        .orderBy($"l_orderkey", $"l_linenumber")
      require(df.queryExecution.optimizedPlan.collect {
          case wn: org.apache.spark.sql.catalyst.plans.logical.Window => wn
        }.isEmpty,
        "WindowMaxFilterToJoin did not fire on the argmax idiom")
      df
    }
  }

  /** Running total window (frame = unbounded preceding → current row),
    * exact via decimal accumulation. Restricted to a supplier slice to
    * keep the verify output bounded. */
  val qRunningSupplier: Spec = Spec(
    "q_running_supplier_qty",
    oracle = Some(s"""
      SELECT l_suppkey, l_orderkey, l_linenumber,
        strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
          OVER (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
      FROM lineitem WHERE l_suppkey <= 10
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"l_suppkey")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.load(s, dir, "lineitem")
      .filter($"l_suppkey" <= 10)
      .select($"l_suppkey", $"l_orderkey", $"l_linenumber",
        date_format($"l_shipdate", "yyyy-MM-dd").as("ship_date"),
        sum($"l_quantity".cast("decimal(18,2)")).over(w).cast("double").as("running_qty"))
      .orderBy($"l_suppkey", $"ship_date", $"l_orderkey", $"l_linenumber")
  }

  /** Set operations: INTERSECT / EXCEPT / UNION over customer key sets. */
  val qSetOps: Spec = Spec(
    "q_set_ops",
    oracle = Some("""
      WITH big AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_totalprice > 200000),
           bld AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING')
      SELECT op, n FROM (
        SELECT 'except' AS op, COUNT(*) AS n FROM (SELECT k FROM big EXCEPT SELECT k FROM bld)
        UNION ALL SELECT 'intersect', COUNT(*) FROM (SELECT k FROM big INTERSECT SELECT k FROM bld)
        UNION ALL SELECT 'union', COUNT(*) FROM (SELECT k FROM big UNION SELECT k FROM bld))
      ORDER BY op""")) { (s, dir) =>
    import s.implicits._
    val big = Tables.load(s, dir, "orders")
      .filter($"o_totalprice" > 200000).select($"o_custkey".as("k")).distinct()
    val bld = Tables.load(s, dir, "customer")
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
    def cnt(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as("n")).select(lit(tag).as("op"), $"n")
    cnt(big.except(bld), "except")
      .unionAll(cnt(big.intersect(bld), "intersect"))
      .unionAll(cnt(big.union(bld).distinct(), "union"))
      .orderBy($"op")
  }

  /** ROLLUP: order revenue by (year, priority) with subtotal rows. */
  val qRollup: Spec = Spec(
    "q_rollup_revenue",
    oracle = Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY ROLLUP(order_year, o_orderpriority)
      ORDER BY order_year NULLS FIRST, o_orderpriority NULLS FIRST""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "orders")
      .withColumn("order_year", year($"o_orderdate").cast("long"))
      .rollup($"order_year", $"o_orderpriority")
      .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"order_year".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  /** Explicit GROUPING SETS (the general form rollup/cube specialize):
    * three hand-picked grouping levels in ONE pass over orders —
    * Spark's Expand feeds a single hash agg, so the multi-level report
    * costs one scan + one shuffle, not one query per level. grouping()
    * markers disambiguate "NULL because super-aggregate" from data
    * nulls, cast BIGINT on both engines. */
  val qGroupingSets: Spec = Spec(
    "q_grouping_sets",
    oracle = Some("""
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
             o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((order_year, o_orderstatus),
                              (order_year, o_orderpriority),
                              (order_year))
      ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST,
               o_orderpriority NULLS FIRST, g_status, g_priority""")) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql("""
      SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
             o_orderstatus, o_orderpriority,
             CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
             CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY GROUPING SETS ((order_year, o_orderstatus),
                              (order_year, o_orderpriority),
                              (order_year))
      ORDER BY order_year NULLS FIRST, o_orderstatus NULLS FIRST,
               o_orderpriority NULLS FIRST, g_status, g_priority""")
  }

  /** Pivot: order counts per priority × status (fixed pivot values so the
    * output schema is static — required at scale and for the oracle). */
  val qPivot: Spec = Spec(
    "q_pivot_status",
    oracle = Some("""
      SELECT o_orderpriority,
        COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
        COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
        COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("F", "O", "P"))
      .orderBy($"o_orderpriority")
  }

  /** Exact percentiles (dyadic fractions → bit-identical interpolation). */
  val qPercentiles: Spec = Spec(
    "q_quantity_percentiles",
    oracle = Some("""
      SELECT l_returnflag,
        ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
        ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
        ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75,
        MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        round(percentile($"l_quantity", lit(0.25)), 6).as("p25"),
        round(percentile($"l_quantity", lit(0.5)), 6).as("p50"),
        round(percentile($"l_quantity", lit(0.75)), 6).as("p75"),
        min($"l_quantity").as("min_qty"), max($"l_quantity").as("max_qty"))
      .orderBy($"l_returnflag")
  }

  /** Fixed-width histogram over order totals (scan + single agg). */
  val qHistogram: Spec = Spec(
    "q_price_histogram",
    oracle = Some("""
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket,
             COUNT(*) AS n, CAST(MIN(o_orderkey) AS BIGINT) AS min_key
      FROM orders GROUP BY bucket ORDER BY bucket""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy(floor($"o_totalprice" / 50000).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"), min($"o_orderkey").cast("long").as("min_key"))
      .orderBy($"bucket")
  }

  /** Distinct aggregation (expand + two-phase agg under the hood). */
  val qDistinctAgg: Spec = Spec(
    "q_distinct_agg",
    oracle = Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(DISTINCT l_suppkey) AS n_supps,
        COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy($"l_returnflag")
  }

  /** Calendar aggregation: orders per month. */
  val qMonthly: Spec = Spec(
    "q_monthly_orders",
    oracle = Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY order_month ORDER BY order_month""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "orders")
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("order_month"))
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("revenue"))
      .orderBy($"order_month")
  }

  /** CASE WHEN projection + filter pushdown sample (modulo sampling keeps
    * the verify payload bounded while scanning the full table). */
  val qCaseWhen: Spec = Spec(
    "q_discount_classes",
    oracle = Some("""
      SELECT l_returnflag,
        CASE WHEN l_discount >= 0.05 THEN 'HI' ELSE 'LO' END AS disc_class,
        COUNT(*) AS n,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS base_price
      FROM lineitem WHERE l_orderkey % 7 = 0
      GROUP BY l_returnflag, disc_class ORDER BY l_returnflag, disc_class""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .filter($"l_orderkey" % 7 === 0)
      .groupBy($"l_returnflag",
        when($"l_discount" >= 0.05, "HI").otherwise("LO").as("disc_class"))
      .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("base_price"))
      .orderBy($"l_returnflag", $"disc_class")
  }

  /** CUBE over part dims: all grouping-set combinations. */
  val qCube: Spec = Spec(
    "q_cube_parts",
    oracle = Some("""
      SELECT p_brand, CAST(p_size AS BIGINT) AS psize, COUNT(*) AS n,
        CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM part WHERE p_size <= 5
      GROUP BY CUBE(p_brand, psize)
      ORDER BY p_brand NULLS FIRST, psize NULLS FIRST""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "part")
      .filter($"p_size" <= 5)
      .withColumn("psize", $"p_size".cast("long"))
      .cube($"p_brand", $"psize")
      .agg(count(lit(1)).as("n"), dsum($"p_retailprice").as("total_price"))
      .orderBy($"p_brand".asc_nulls_first, $"psize".asc_nulls_first)
  }

  /** The SQL surface: same engine through `spark.sql` over registered
    * views (+ the graft_* function registry), not the DataFrame DSL. */
  val qSqlSurface: Spec = Spec(
    "q_sql_surface",
    oracle = Some("""
      SELECT n_name, COUNT(*) AS n_suppliers,
        CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_acctbal > 0
      GROUP BY n_name ORDER BY n_name""")) { (s, dir) =>
    Tables.registerAll(s, dir)
    graft.functions.GraftFunctions.registerSql(s)
    s.sql("""
      SELECT n_name, COUNT(*) AS n_suppliers,
        CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      WHERE s_acctbal > 0
      GROUP BY n_name ORDER BY n_name""")
  }

  /** Approximate sketches (HLL distinct + approx quantiles), made
    * ORACLE-VERIFIABLE despite being approximate: the row carries the
    * exact distinct count plus two bound-check verdicts the engine
    * computes against its own exact values —
    *  - `median_ok`: percentile_approx(accuracy=1000) carries a HARD
    *    rank-error guarantee ε = 1/accuracy (GK sketch); the verdict
    *    checks the estimate's exact rank window overlaps
    *    [(0.5−ε)·n, (0.5+ε)·n], so it can only be true if the sketch
    *    honored its proven bound.
    *  - `parts_ok`: HLL±'s error is probabilistic (rsd = 0.05 here);
    *    the verdict gates at 5σ relative error — on a FIXED dataset
    *    the estimate is deterministic, so this pins the recorded
    *    accuracy, and a regression to garbage estimates flips it.
    * The oracle states both verdicts as TRUE and the exact count
    * exactly — an out-of-bounds sketch hash-mismatches and goes red. */
  val qSketches: Spec = Spec(
    "q_approx_sketches",
    oracle = Some("""
      SELECT l_returnflag,
        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        TRUE AS parts_ok, TRUE AS median_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val sk = li.groupBy($"l_returnflag").agg(
      approx_count_distinct($"l_partkey", 0.05).as("est_parts"),
      countDistinct($"l_partkey").as("exact_parts"),
      percentile_approx($"l_quantity", lit(0.5), lit(1000)).as("est_median"))
    // exact rank window of the estimate, one more scan + broadcast of
    // the flag-count-sized sketch frame (the check is corpus-scale-safe)
    val ranks = li
      .join(broadcast(sk.select($"l_returnflag", $"est_median")),
        Seq("l_returnflag"))
      .groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(when($"l_quantity" < $"est_median", 1L).otherwise(0L)).as("c_lt"),
        sum(when($"l_quantity" <= $"est_median", 1L).otherwise(0L)).as("c_le"))
    sk.join(ranks, "l_returnflag").select(
      $"l_returnflag",
      $"exact_parts".cast("long").as("exact_parts"),
      ($"est_parts" >= $"exact_parts" * 0.75 &&
        $"est_parts" <= $"exact_parts" * 1.25).as("parts_ok"),
      ($"c_le" >= $"n" * 0.499 && $"c_lt" <= $"n" * 0.501).as("median_ok"))
      .orderBy($"l_returnflag")
  }

  /** Association rules over order baskets at the brand level (classic
    * market-basket support/confidence/lift, Agrawal et al. '93).
    * Baskets are the DISTINCT (order, brand) pairs — bounded at
    * ≤|brands| (25, fixed at every SF) rows per order, so the
    * within-order pair expansion is ≤C(25,2) rows per order and the
    * self-join shuffles the basket frame on orderkey exactly once;
    * pair counts then reduce with map-side partials. All three metrics
    * are emitted in exact integer micros (floor division) — no float
    * division for the engines to disagree on. lift > 1e6 means the
    * brands co-occur MORE than independence predicts. */
  val qMarketBasket: Spec = Spec(
    "q_market_basket",
    bench = true,
    oracle = Some("""
      WITH b AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS br
        FROM lineitem JOIN part ON l_partkey = p_partkey),
      n AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n_orders FROM b),
      bc AS (SELECT br, CAST(COUNT(*) AS BIGINT) AS n_br FROM b GROUP BY br),
      pr AS (SELECT a.br AS brand_a, c.br AS brand_b,
          CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM b a JOIN b c ON a.ok = c.ok AND a.br < c.br
        GROUP BY a.br, c.br)
      SELECT brand_a, brand_b, n_ab,
        (n_ab * 1000000) // n.n_orders AS support_micros,
        (n_ab * 1000000) // ba.n_br AS confidence_micros,
        CAST((CAST(n_ab AS HUGEINT) * n.n_orders * 1000000)
          // (CAST(ba.n_br AS HUGEINT) * bb.n_br) AS BIGINT) AS lift_micros
      FROM pr CROSS JOIN n
        JOIN bc ba ON ba.br = pr.brand_a
        JOIN bc bb ON bb.br = pr.brand_b
      ORDER BY brand_a, brand_b""")) { (s, dir) =>
    import s.implicits._
    val baskets = Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "part"),
        $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("ok"), $"p_brand".as("br"))
      .distinct()
      .localCheckpoint() // one basket build: pairs, brand counts, total
    val nOrders = broadcast(
      baskets.agg(countDistinct($"ok").as("n_orders")))
    val brandCounts = baskets.groupBy($"br")
      .agg(count(lit(1)).as("n_br"))
    // r15 REJECTED alternative, kept out after a measured A/B: pair
    // expansion from a per-order collect_set (pairs partial-aggregated
    // map-side, the pair-count exchange shrinking 11.5 MB → 0.05 MB and
    // the plan losing both SortMergeJoins) ran 1.64–1.65 s vs this
    // form's 1.23–1.27 s back-to-back at sf0.1 — the interpreted HOF
    // expansion (transform/filter/flatten per order row) costs more CPU
    // than the pair shuffle it saves at this scale. The shuffle-bytes
    // argument only wins once pair volume actually stresses the
    // exchange; revisit with a codegen'd pair-expansion expression if a
    // real corpus gets there.
    val pairs = baskets.as("a")
      .join(baskets.as("c"), $"a.ok" === $"c.ok" && $"a.br" < $"c.br")
      .groupBy($"a.br".as("brand_a"), $"c.br".as("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .crossJoin(nOrders)
      .join(broadcast(brandCounts.select($"br".as("brand_a"),
        $"n_br".as("n_a"))), Seq("brand_a"))
      .join(broadcast(brandCounts.select($"br".as("brand_b"),
        $"n_br".as("n_b"))), Seq("brand_b"))
      .select($"brand_a", $"brand_b", $"n_ab",
        expr("(n_ab * 1000000L) div n_orders").as("support_micros"),
        expr("(n_ab * 1000000L) div n_a").as("confidence_micros"),
        // lift rides DECIMAL(38,0): n_ab·n_orders·1e6 overflows BIGINT
        // once |orders| passes ~3M (TPC-H SF≥2) — Spark would wrap
        // silently while the oracle errors. div on decimals yields the
        // same BIGINT floor both engines compute in 128-bit.
        expr("(cast(n_ab as decimal(38,0)) * n_orders * 1000000)" +
          " div (cast(n_a as decimal(38,0)) * n_b)")
          .as("lift_micros"))
      .orderBy($"brand_a", $"brand_b")
  }

  /** Mergeable t-digest quantile sketch ([[graft.ops.TDigest]], Dunning
    * & Ertl) over per-flag prices — the custom-Aggregator counterpart of
    * [[qSketches]]' native percentile_approx: map-side partials fold
    * rows into O(δ) centroids, partials merge associatively, no global
    * sort. Like every parallel sketch the estimate depends on partition
    * merge order, so the gate is a rank-tolerance bound (same discipline
    * as q_approx_sketches): the p50/p95 estimates must sit within ±3
    * rank points of their targets, checked by one exact counting pass. */
  val qTdigest: Spec = Spec(
    "q_tdigest_quantiles",
    bench = true, // r10-family headline row: sketch-aggregator regression guard
    oracle = Some("""
      SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        TRUE AS p50_ok, TRUE AS p95_ok
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
    import s.implicits._
    val tdq = udaf(
      TDigest.aggregator(Seq(0.5, 0.95)),
      org.apache.spark.sql.Encoders.scalaDouble)
    val li = Tables.load(s, dir, "lineitem")
    val sk = li.groupBy($"l_returnflag")
      .agg(tdq($"l_extendedprice").as("est"))
      .select($"l_returnflag", $"est".getItem(0).as("e50"),
        $"est".getItem(1).as("e95"))
    val ranks = li
      .join(broadcast(sk), Seq("l_returnflag"))
      .groupBy($"l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(when($"l_extendedprice" < $"e50", 1L).otherwise(0L)).as("c50"),
        sum(when($"l_extendedprice" < $"e95", 1L).otherwise(0L)).as("c95"))
    ranks.select($"l_returnflag", $"n",
        ($"c50" >= $"n" * 0.47 && $"c50" <= $"n" * 0.53).as("p50_ok"),
        ($"c95" >= $"n" * 0.92 && $"c95" <= $"n" * 0.98).as("p95_ok"))
      .orderBy($"l_returnflag")
  }

  /** EXACT distributed quantiles WITHOUT a global sort — the classic
    * two-pass selection (histogram, then bin-local rank): pass 1 bins
    * every price into 1024 buckets per flag (one hash agg), the
    * cumulative bin counts locate the bucket holding each target rank,
    * pass 2 ranks ONLY that bucket's rows (a window over ~n/1024 rows
    * per flag, never the whole table). The exact complement of
    * [[qTdigest]]: same answer a full sort would give, at two scans +
    * one tiny window. The oracle computes the rank-r values directly
    * (row_number over each flag) — equality proves the selection
    * algorithm, not a shared code path. Ranks: lower median
    * r = (n+1)÷2 and p99 r = ceil(99n/100) = (99n+99)÷100. */
  val qExactQuantile2Pass: Spec = Spec(
    "q_exact_quantile_2pass",
    oracle = Some("""
      WITH r AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
          row_number() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice) AS rn,
          COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        FROM lineitem)
      SELECT flag, CAST(MAX(n) AS BIGINT) AS n,
        MAX(CASE WHEN rn = (n + 1) // 2 THEN v END) AS median,
        MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS p99
      FROM r GROUP BY flag ORDER BY flag""")) { (s, dir) =>
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
      .select($"l_returnflag".as("flag"), $"l_extendedprice".as("v"))
      .localCheckpoint() // two passes over one materialization
    val stats = li.groupBy($"flag")
      .agg(count(lit(1)).as("n"), min($"v").as("mn"), max($"v").as("mx"))
    def binOf(v: org.apache.spark.sql.Column, mn: org.apache.spark.sql.Column,
        mx: org.apache.spark.sql.Column) =
      when(mx === mn, lit(0L)).otherwise(
        least(floor((v - mn) / (mx - mn) * 1024), lit(1023L)).cast("long"))
    val binned = li.join(broadcast(stats), "flag")
      .select($"flag", $"v", binOf($"v", $"mn", $"mx").as("bin"))
    val counts = binned.groupBy($"flag", $"bin")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum($"cnt").over(
        Window.partitionBy($"flag").orderBy($"bin")))
      .withColumn("prev", $"cum" - $"cnt")
      .join(broadcast(stats.select($"flag", $"n")), "flag")
      .localCheckpoint() // 1024 rows/flag: locates both target buckets
    // one row per (flag, target): which bucket holds the rank, and the
    // residual rank inside it
    val targets = counts
      .select($"flag", $"bin", $"cum", $"prev", $"n",
        explode(array(
          struct(lit("median").as("q"), expr("(n + 1) div 2").as("r")),
          struct(lit("p99").as("q"), expr("(99 * n + 99) div 100").as("r"))))
          .as("t"))
      .filter($"t.r" > $"prev" && $"t.r" <= $"cum")
      .select($"flag", $"t.q".as("q"), $"bin", ($"t.r" - $"prev").as("k"))
    // pass 2: rank only the located buckets' rows
    val picked = binned.join(broadcast(targets), Seq("flag", "bin"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"flag", $"q").orderBy($"v")))
      .filter($"rn" === $"k")
      .groupBy($"flag").pivot("q", Seq("median", "p99")).agg(first($"v"))
    stats.select($"flag", $"n").join(picked, "flag")
      .select($"flag", $"n", $"median", $"p99")
      .orderBy($"flag")
  }

  /** Analytic-window shapes: dense_rank, ntile, lag/lead, first/last
    * value over one supplier-ordered frame. Supplier GROWS with scale
    * factor (TPC-H: 10k × SF), so the global rank/ntile columns do NOT
    * ride an unpartitioned window (one reducer sorting the whole
    * table): the global row number comes from the two-phase
    * [[graft.ops.Skew.globalRowNumber]] (range-partitioned local ranks
    * + broadcast offsets, SkewSpec-pinned) — dense_rank equals it
    * because the order key (s_acctbal, s_suppkey) is unique — and
    * ntile(4) is derived row-locally from that row number and the
    * broadcast total via SQL ntile's first-buckets-get-the-remainder
    * rule. The oracle states the window forms, so the green row IS the
    * pinned equality proof. The per-nation lag/lead/first/last windows
    * stay windows: they partition by nation key and scale out. */
  val qWindowShapes: Spec = Spec(
    "q_window_shapes",
    oracle = Some("""
      SELECT s_suppkey,
        CAST(dense_rank() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS dr,
        CAST(ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey) AS BIGINT) AS quartile,
        ROUND(COALESCE(lag(s_acctbal) OVER w, 0), 2) AS prev_bal,
        ROUND(COALESCE(lead(s_acctbal) OVER w, 0), 2) AS next_bal,
        ROUND(first_value(s_acctbal) OVER w, 2) AS nation_top,
        ROUND(last_value(s_acctbal) OVER (PARTITION BY s_nationkey
          ORDER BY s_acctbal DESC, s_suppkey
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS nation_bottom
      FROM supplier
      WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
      ORDER BY s_suppkey""")) { (s, dir) =>
    import s.implicits._
    val w = Window.partitionBy($"s_nationkey").orderBy($"s_acctbal".desc, $"s_suppkey")
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = graft.ops.Skew.globalRowNumber(
      Tables.load(s, dir, "supplier"),
      Seq($"s_acctbal".desc, $"s_suppkey"))
    val nTot = broadcast(ranked.agg(count(lit(1)).as("_n")))
    ranked.crossJoin(nTot).select(
      $"s_suppkey",
      $"rn".cast("long").as("dr"), // unique order key: dense_rank == rn
      expr("""CAST(CASE WHEN rn <= (_n % 4) * (_n div 4 + 1)
              THEN (rn - 1) div (_n div 4 + 1) + 1
              ELSE (_n % 4) + (rn - 1 - (_n % 4) * (_n div 4 + 1)) div (_n div 4) + 1
              END AS BIGINT)""").as("quartile"),
      round(coalesce(lag($"s_acctbal", 1).over(w), lit(0)), 2).as("prev_bal"),
      round(coalesce(lead($"s_acctbal", 1).over(w), lit(0)), 2).as("next_bal"),
      round(first($"s_acctbal").over(w), 2).as("nation_top"),
      round(last($"s_acctbal").over(wAll), 2).as("nation_bottom"))
      .orderBy($"s_suppkey")
  }

  /** Calendar arithmetic: ship latency in days per priority. No
    * broadcast hint: orders is fact-scale (grows with SF), so a pinned
    * broadcast OOMs at 100× — project to the three needed columns and
    * let AQE pick (threshold-broadcast at small SF, shuffle join at
    * scale). */
  val qOrderLatency: Spec = Spec(
    "q_order_latency",
    oracle = Some("""
      SELECT o_orderpriority,
        CAST(SUM(CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT)) AS BIGINT) AS total_days,
        COUNT(*) AS n,
        CAST(MAX(date_diff('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_days
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
    import s.implicits._
    val ord = Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority", $"o_orderdate")
    val li = Tables.load(s, dir, "lineitem")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select($"o_orderpriority",
        datediff($"l_shipdate".cast("date"), $"o_orderdate".cast("date"))
          .cast("long").as("days"))
      .groupBy($"o_orderpriority")
      .agg(sum($"days").as("total_days"), count(lit(1)).as("n"),
        max($"days").as("max_days"))
      .orderBy($"o_orderpriority")
  }

  /** String-function family over part names. */
  val qStringOps: Spec = Spec(
    "q_string_ops",
    oracle = Some("""
      SELECT p_partkey,
        upper(substr(p_name, 1, 8)) AS head,
        replace(p_type, ' ', '_') AS type_key,
        lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_key,
        concat_ws('|', p_brand, p_type) AS brand_type,
        CAST(length(p_name) AS BIGINT) AS name_len
      FROM part WHERE p_partkey % 20 = 0 ORDER BY p_partkey""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "part")
      .filter($"p_partkey" % 20 === 0)
      .select($"p_partkey",
        upper(substring($"p_name", 1, 8)).as("head"),
        regexp_replace($"p_type", " ", "_").as("type_key"),
        lpad($"p_size".cast("string"), 4, "0").as("size_key"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        length($"p_name").cast("long").as("name_len"))
      .orderBy($"p_partkey")
  }

  /** Fuzzy self-join (record linkage): part-name pairs within edit
    * distance 2, blocked by `p_size` — the declared-block fuzzy-match
    * policy (like language-blocking in dedup), so candidates never
    * form across blocks BY DESIGN. Candidates come from the capped
    * bucket scaffold ([[graft.ops.Buckets.pairs]] — star cap +
    * observe gate, never an unbounded block²), and the oracle encodes
    * the SAME cap (blocks over 1000 members contribute only their
    * min-key star candidates), so query and oracle agree BY
    * CONSTRUCTION at every scale factor — p_size blocks grow linearly
    * with SF (TPC-H SF1 ≈ 4000 parts/size), so past the cap both
    * sides degrade identically instead of the oracle silently keeping
    * pairs the capped side never generates. Then a LOSSLESS
    * length-band prefilter (levenshtein ≥ |len(a)-len(b)|, so ≤2
    * requires the band) cuts the O(len²) distance computations before
    * they run. Spark and DuckDB `levenshtein` agree: unit-cost
    * insert/delete/substitute. */
  val qFuzzyPartNames: Spec = Spec(
    "q_fuzzy_part_names",
    oracle = Some("""
      WITH blk AS (SELECT p_size, COUNT(*) AS n, MIN(p_partkey) AS mn
        FROM part GROUP BY p_size)
      SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
        a.p_name AS name_a, b.p_name AS name_b,
        CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
      FROM part a JOIN part b
        ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
        JOIN blk ON blk.p_size = a.p_size
      WHERE (blk.n <= 1000 OR a.p_partkey = blk.mn)
        AND abs(len(a.p_name) - len(b.p_name)) <= 2
        AND levenshtein(a.p_name, b.p_name) <= 2
      ORDER BY key_a, key_b""")) { (s, dir) =>
    import s.implicits._
    val part = Tables.load(s, dir, "part")
    val named = part.select($"p_partkey", $"p_name")
    graft.ops.Buckets.pairs(part, Seq("p_size"), "p_partkey")
      .join(named.select($"p_partkey".as("id_a"), $"p_name".as("name_a")), "id_a")
      .join(named.select($"p_partkey".as("id_b"), $"p_name".as("name_b")), "id_b")
      .filter(abs(length($"name_a") - length($"name_b")) <= 2)
      .filter(levenshtein($"name_a", $"name_b") <= 2)
      .select($"id_a".as("key_a"), $"id_b".as("key_b"), $"name_a", $"name_b",
        levenshtein($"name_a", $"name_b").cast("long").as("edit_dist"))
      .orderBy($"key_a", $"key_b")
  }

  /** Rolling EXACT MEDIAN: 7-day trailing median of daily revenue per
    * order priority — the robust trend line dashboards overlay on
    * noisy daily totals (median shrugs off single-day spikes that
    * drag a rolling mean). Exercises an exact percentile as a WINDOW
    * aggregate: Spark `percentile(…, 0.5)` over a rows frame and
    * DuckDB `median` share the interpolated definition, and the frame
    * inputs are exact decimal day sums cast once, so both engines
    * interpolate the same doubles.
    *
    * Scale shape: day totals are a calendar-bounded hash agg; the
    * window partitions by priority over days — frames are days-scale,
    * never fact-scale. */
  val qRollingMedian: Spec = Spec(
    "q_rolling_median",
    oracle = Some("""
      WITH d AS (
        SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        FROM orders GROUP BY o_orderpriority, order_day)
      SELECT o_orderpriority, order_day, day_total,
        round(median(day_total) OVER (PARTITION BY o_orderpriority
          ORDER BY order_day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
          AS rolling_median
      FROM d ORDER BY o_orderpriority, order_day""")) { (s, dir) =>
    import s.implicits._
    val d = Tables.load(s, dir, "orders")
      .groupBy($"o_orderpriority",
        date_format($"o_orderdate", "yyyy-MM-dd").as("order_day"))
      .agg(dsum($"o_totalprice").as("day_total"))
    val w = Window.partitionBy($"o_orderpriority").orderBy($"order_day")
      .rowsBetween(-6, 0)
    d.select($"o_orderpriority", $"order_day", $"day_total",
        round(expr("percentile(day_total, 0.5)").over(w), 6)
          .as("rolling_median"))
      .orderBy($"o_orderpriority", $"order_day")
  }

  /** Join-key SKEW REPORT: the diagnostic a 100 TB operator runs
    * BEFORE picking a join strategy — per-key frequencies of the
    * prospective join key, the hottest keys, their share of the table
    * and their multiple of the mean key load (the number that says
    * whether AQE skew-split or an explicit salt is warranted). All
    * ratios are single divisions of exact integer sums.
    *
    * Scale shape: one map-side-combined hash agg to key counts, the
    * two global scalars ride a broadcast crossJoin (the repo's
    * broadcast-scalar idiom), and the top-5 is a TakeOrdered — no
    * global sort. */
  val qSkewReport: Spec = Spec(
    "q_skew_report",
    oracle = Some("""
      WITH c AS (
        SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY l_suppkey),
      s AS (SELECT COUNT(*) AS n_keys, SUM(n) AS total FROM c)
      SELECT c.l_suppkey, CAST(c.n AS BIGINT) AS n,
        round(CAST(c.n AS DOUBLE) / s.total, 6) AS share,
        round(CAST(c.n AS DOUBLE) * s.n_keys / s.total, 6) AS skew_vs_mean
      FROM c CROSS JOIN s
      ORDER BY n DESC, l_suppkey LIMIT 5""")) { (s, dir) =>
    import s.implicits._
    val c = Tables.load(s, dir, "lineitem")
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n"))
    val stats = c.agg(count(lit(1)).as("n_keys"), sum($"n").as("total"))
    c.crossJoin(broadcast(stats))
      .select($"l_suppkey", $"n",
        round($"n".cast("double") / $"total", 6).as("share"),
        round($"n".cast("double") * $"n_keys" / $"total", 6).as("skew_vs_mean"))
      .orderBy($"n".desc, $"l_suppkey")
      .limit(5)
  }

  /** REFERENTIALLY CONSISTENT sampling: sample the PARENT table by a
    * deterministic id hash, then bring every child row of the sampled
    * parents — the only way to build a small integration corpus whose
    * joins still work (independent per-table sampling breaks foreign
    * keys with probability ≈ 1). Same md5 hash48 idiom as the corpus
    * samplers, so the sample is replayable in both engines.
    *
    * Scale shape: the 5% parent sample is filter-pushed at the orders
    * scan; the child restriction is one keyed join the optimizer
    * handles (broadcast while the sample fits, shuffle when it
    * doesn't — no pinned hint on the scale-variant sample). */
  val qConsistentSample: Spec = Spec(
    "q_consistent_sample",
    oracle = Some(s"""
      WITH so AS (
        SELECT o_orderkey, o_orderstatus FROM orders
        WHERE CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),1,12)
          AS BIGINT) % 100 < 5)
      SELECT so.o_orderstatus,
        CAST(COUNT(DISTINCT so.o_orderkey) AS BIGINT) AS n_orders,
        CAST(COUNT(*) AS BIGINT) AS n_lineitems,
        ${dsumSql("l.l_extendedprice")} AS sampled_revenue
      FROM so JOIN lineitem l ON l.l_orderkey = so.o_orderkey
      GROUP BY so.o_orderstatus ORDER BY so.o_orderstatus""")) { (s, dir) =>
    import s.implicits._
    val so = Tables.load(s, dir, "orders")
      .filter(graft.ops.Sampling.hash48($"o_orderkey") % 100 < 5)
      .select($"o_orderkey", $"o_orderstatus")
    so.join(Tables.load(s, dir, "lineitem"),
        $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderstatus")
      .agg(countDistinct($"o_orderkey").as("n_orders"),
        count(lit(1)).as("n_lineitems"),
        dsum($"l_extendedprice").as("sampled_revenue"))
      .orderBy($"o_orderstatus")
  }

  /** Two-phase SALTED aggregation surfaced as a query: the hot-key
    * shape AQE can't fix (a melting reducer under groupBy) goes through
    * Skew.saltedAgg — partials on (key, salt), merge on key — and must
    * produce EXACTLY the plain GROUP BY result the oracle states.
    * Decimal partials keep the two-phase double sum order-independent. */
  val qSaltedAgg: Spec = Spec(
    "q_salted_agg",
    oracle = Some(s"""
      SELECT l_returnflag,
        ${dsumSql("l_quantity")} AS sum_qty,
        CAST(COUNT(*) AS BIGINT) AS n,
        CAST(MIN(l_orderkey) AS BIGINT) AS min_key
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")) { (s, dir) =>
    import s.implicits._
    graft.ops.Skew.saltedAgg(
        Tables.load(s, dir, "lineitem"), Seq("l_returnflag"), saltBuckets = 16)(
      "sum_qty" -> sum($"l_quantity".cast("decimal(18,2)")),
      "n" -> count(lit(1)),
      "min_key" -> min($"l_orderkey"))(
      "sum_qty" -> (c => sum(col(c))),
      "n" -> (c => sum(col(c))),
      "min_key" -> (c => min(col(c))))
      .select($"l_returnflag",
        $"sum_qty".cast("double").as("sum_qty"),
        $"n".cast("long").as("n"),
        $"min_key".cast("long").as("min_key"))
      .orderBy($"l_returnflag")
  }

  /** Interval (range) join: orders priced into NON-uniform bands via a
    * broadcast interval table and a BETWEEN predicate — the band table
    * is dim-sized, so the non-equi join plans as a broadcast nested
    * loop, never a cartesian shuffle. */
  val qRangeBandJoin: Spec = Spec(
    "q_range_band_join",
    oracle = Some("""
      WITH bands(band_id, lo, hi) AS (VALUES
        (0, 0.0, 50000.0), (1, 50000.0, 150000.0),
        (2, 150000.0, 350000.0), (3, 350000.0, 1000000.0))
      SELECT band_id, COUNT(*) AS n,
        CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders JOIN bands
        ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY band_id ORDER BY band_id""")) { (s, dir) =>
    import s.implicits._
    val bands = Seq(
      (0, 0.0, 50000.0), (1, 50000.0, 150000.0),
      (2, 150000.0, 350000.0), (3, 350000.0, 1000000.0))
      .toDF("band_id", "lo", "hi")
    Tables.load(s, dir, "orders")
      .join(broadcast(bands),
        $"o_totalprice" >= $"lo" && $"o_totalprice" < $"hi")
      .groupBy($"band_id")
      .agg(count(lit(1)).as("n"),
        min($"o_orderkey").cast("long").as("min_key"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy($"band_id")
  }

  /** Benford leading-digit audit on order totals — the forensic
    * data-quality check (fabricated or unit-mangled numeric columns
    * betray themselves by a non-logarithmic first-digit law). Per
    * digit d: observed share vs Benford's log10(1+1/d), with the
    * chi-square contribution (o−e)²/e per digit and the total. The
    * leading digit comes from the DECIMAL string image (no float
    * log-magnitude games), expected probs round at 6dp, contributions
    * at 6dp DECIMAL-sum — the engine-parity recipe throughout. One
    * scan, one 9-row agg. */
  val qBenford: Spec = Spec(
    "q_benford_audit",
    oracle = Some("""
      WITH o AS (
        SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
          AS d
        FROM orders WHERE o_totalprice > 0),
      c AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY d),
      t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
      b AS (SELECT CAST(dd AS VARCHAR) AS d,
          round(log10(1 + 1.0::DOUBLE / dd), 6) AS expected
        FROM (SELECT unnest(range(1, 10)) AS dd)),
      j AS (SELECT b.d, COALESCE(c.n, 0) AS n, b.expected,
          round(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.total, 6) AS observed
        FROM b LEFT JOIN c ON c.d = b.d CROSS JOIN t),
      x AS (SELECT d, n, observed, expected,
          CAST(round((observed - expected) * (observed - expected)
            / expected, 6) AS DECIMAL(18,6)) AS chi
        FROM j)
      SELECT d AS digit, n, observed, expected,
        CAST(chi AS DOUBLE) AS chi_term,
        CAST(SUM(chi) OVER () AS DOUBLE) AS chi_total
      FROM x ORDER BY digit""")) { (s, dir) =>
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
      .filter($"o_totalprice" > 0)
      .select(substring($"o_totalprice".cast("decimal(18,2)").cast("string"),
        1, 1).as("d"))
    val c = o.groupBy($"d").agg(count(lit(1)).as("n"))
    val t = broadcast(c.agg(sum($"n").as("total")))
    val b = Seq.range(1, 10)
      .map(dd => (dd.toString, BigDecimal(math.log10(1 + 1.0 / dd))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .toDF("d", "expected")
    val j = broadcast(b).join(c, Seq("d"), "left").crossJoin(t)
      .select($"d", coalesce($"n", lit(0L)).as("n"), $"expected",
        round(coalesce($"n", lit(0L)).cast("double") / $"total", 6)
          .as("observed"))
    val x = j.withColumn("chi",
      round(($"observed" - $"expected") * ($"observed" - $"expected")
        / $"expected", 6).cast("decimal(18,6)"))
    // chi_total rides the broadcast-scalar idiom (agg + crossJoin), not
    // an unpartitioned window — keeps WindowExec warnings meaningful
    val chiTot = broadcast(x.agg(sum($"chi").as("_chi_total")))
    x.crossJoin(chiTot)
      .select($"d".as("digit"), $"n", $"observed", $"expected",
        $"chi".cast("double").as("chi_term"),
        $"_chi_total".cast("double").as("chi_total"))
      .orderBy($"digit")
  }

  /** Bucketed co-located fact-fact join: orders and lineitem are first
    * written as 8-bucket tables on the join key (sorted within
    * buckets), then sort-merge joined — and because both sides share
    * the bucketing, the join subtree has NO shuffle exchange: each
    * task zips bucket i of one table with bucket i of the other (a
    * cheap partition-local sort remains — Spark consumes bucket COUNT
    * co-location by default but sortBy order only behind a legacy
    * flag). This is THE layout lever for repeated fact-fact joins at
    * 100 TB (pay the shuffle once at write time, amortize it across
    * every later join); PlanSpec pins the exchange-free/sort-free join
    * subtree. The `merge` hint is not a scale pin — it steers the
    * planner off the tiny-SF broadcast plan so the query exercises the
    * bucketed-SMJ path it exists to demonstrate; at real scale SMJ is
    * what the planner picks unaided. Bucket twins are rebuilt per call
    * into session-scoped scratch ([[graft.ops.Scratch]]) keyed by the
    * source dir, so cross-SF runs in one session can never read a
    * stale layout. */
  val qBucketedJoin: Spec = Spec(
    "q_bucketed_join",
    oracle = Some("""
      SELECT o_orderpriority,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")) { (s, dir) =>
    import s.implicits._
    Seq(("orders", "o_orderkey"), ("lineitem", "l_orderkey")).foreach {
      case (t, k) =>
        // repartition on the bucket key first: hash-partitioning uses the
        // same murmur3 function as bucketing, so each task writes exactly
        // one bucket → one file per bucket → the scan reports its sort
        // order and the SMJ needs neither exchange NOR sort
        Tables.load(s, dir, t).repartition(8, col(k)).write
          .bucketBy(8, k).sortBy(k)
          .option("path", graft.ops.Scratch.dir(s"bucket_$t"))
          .mode("overwrite")
          .saveAsTable(s"graft_bucketed_$t")
    }
    val ord = s.table("graft_bucketed_orders")
    val li = s.table("graft_bucketed_lineitem")
    ord.hint("merge").join(li, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_orderpriority")
      .agg(
        sum($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - $"l_discount".cast("decimal(18,2)")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy($"o_orderpriority")
  }

  // Morton interleave: the shared op (graft.ops.Layout) — one source
  // for the Spark expression and the DuckDB twin.
  private def zvalSql(a: String, b: String): String =
    graft.ops.Layout.zOrder2Sql(a, b, bits = 8)

  private def zval(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.ops.Layout.zOrder2(a, b, bits = 8)

  /** Z-ORDER clustering for multidimensional data skipping: interleave
    * the low 8 bits of two filter dimensions (part, supplier) into a
    * Morton code, range-order rows by it, and cut 16 contiguous layout
    * buckets — the Delta/Iceberg OPTIMIZE ZORDER recipe, in-plan. The
    * output is each bucket's min/max envelope on BOTH dimensions: under
    * a z-order layout both stay narrow (a linear sort narrows only its
    * leading column), which is exactly what file/row-group min-max
    * pruning consumes — a predicate on EITHER dimension skips most
    * buckets. At 100 TB the buckets are files: the same plan with the
    * bucket id as a write partition IS the table layout job.
    *
    * Scale shape: the Morton code is 16 codegen'd bit ops per row (no
    * UDF); the global order rides [[graft.ops.Skew.globalRowNumber]]
    * (range partition + in-partition rank + broadcast offsets — the
    * scale-safe global rank, never one window over everything); bucket
    * cut is integer division on both sides; the envelope agg is one
    * hash agg on 16 keys. */
  val qZorderCluster: Spec = Spec(
    "q_zorder_cluster",
    oracle = Some(s"""
      WITH ab AS (
        SELECT l_partkey % 256 AS a, l_suppkey % 256 AS b,
          l_orderkey, l_linenumber
        FROM lineitem),
      z AS (
        SELECT a, b, ${zvalSql("a", "b")} AS zv, l_orderkey, l_linenumber
        FROM ab),
      r AS (
        SELECT a, b,
          row_number() OVER (ORDER BY zv, l_orderkey, l_linenumber) AS rn,
          COUNT(*) OVER () AS cnt
        FROM z)
      SELECT CAST((rn - 1) * 16 // cnt AS BIGINT) AS bucket,
        COUNT(*) AS n_rows,
        CAST(MIN(a) AS BIGINT) AS min_a, CAST(MAX(a) AS BIGINT) AS max_a,
        CAST(MIN(b) AS BIGINT) AS min_b, CAST(MAX(b) AS BIGINT) AS max_b
      FROM r GROUP BY 1 ORDER BY bucket""")) { (s, dir) =>
    import s.implicits._
    val ab = Tables.load(s, dir, "lineitem")
      .select(($"l_partkey" % 256).as("a"), ($"l_suppkey" % 256).as("b"),
        $"l_orderkey", $"l_linenumber")
      .withColumn("zv", zval($"a", $"b"))
    val ranked = graft.ops.Skew.globalRowNumber(
      ab, Seq($"zv", $"l_orderkey", $"l_linenumber"))
    val total = ranked.agg(count(lit(1)).as("cnt"))
    ranked.crossJoin(broadcast(total))
      .withColumn("bucket", expr("(rn - 1) * 16 div cnt"))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_rows"),
        min($"a").as("min_a"), max($"a").as("max_a"),
        min($"b").as("min_b"), max($"b").as("max_b"))
      .orderBy($"bucket")
  }

  /** MERGE INTO / upsert semantics without a table format: the Delta
    * `MERGE` contract (WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT)
    * expressed as one full-outer join + coalesce projection — the plan
    * every merge-on-read engine lowers to. The source batch is derived
    * deterministically from the target (keys ≡ 0 mod 13 get a status
    * flip and a +10.00 price adjustment; keys ≡ 0 mod 97 re-enter
    * shifted by 1e9 as inserts), and the output is the merged rows with
    * their merge_action, unchanged rows filtered out. Price arithmetic
    * runs in DECIMAL(18,2) and casts to double once, so both engines
    * see the identical IEEE value.
    *
    * Scale shape: ONE shuffle on the merge key for the full-outer join
    * (the unavoidable one — both sides are fact-scale here; a dim-sized
    * source would broadcast under AQE); the action tag and coalesces
    * are row-local codegen. At 100 TB with a bucketed/z-ordered target
    * (q_bucketed_join / q_zorder_cluster) the same plan skips the
    * target-side exchange entirely. */
  val qMergeUpsert: Spec = Spec(
    "q_merge_upsert",
    oracle = Some("""
      WITH src AS (
        SELECT o_orderkey, 'U' AS s_status,
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 10.00 AS DOUBLE) AS s_price
          FROM orders WHERE o_orderkey % 13 = 0
        UNION ALL
        SELECT o_orderkey + 1000000000 AS o_orderkey, 'N' AS s_status,
            CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS s_price
          FROM orders WHERE o_orderkey % 97 = 0),
      m AS (
        SELECT COALESCE(t.o_orderkey, s.o_orderkey) AS o_orderkey,
          COALESCE(s.s_status, t.o_orderstatus) AS o_orderstatus,
          COALESCE(s.s_price, t.o_totalprice) AS o_totalprice,
          CASE WHEN t.o_orderkey IS NULL THEN 'insert'
               WHEN s.o_orderkey IS NULL THEN 'unchanged'
               ELSE 'update' END AS merge_action
        FROM orders t FULL OUTER JOIN src s ON s.o_orderkey = t.o_orderkey)
      SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice,
        merge_action
      FROM m WHERE merge_action <> 'unchanged'
      ORDER BY o_orderkey""")) { (s, dir) =>
    import s.implicits._
    val t = Tables.load(s, dir, "orders")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    // Same silent-skew hazard as the dedup planted corpora: the
    // synthetic insert branch shifts keys by 1e9; a real o_orderkey at
    // or past the offset would collide with a planted insert while the
    // oracle (sharing the arithmetic) stays hash-green.
    Dedup.requirePlantedHeadroom(t, "o_orderkey", 1000000000L)
    val price2 = $"o_totalprice".cast("decimal(18,2)")
    val src = t.filter($"o_orderkey" % 13 === 0)
      .select($"o_orderkey".as("s_key"), lit("U").as("s_status"),
        (price2 + lit(BigDecimal("10.00"))).cast("double").as("s_price"))
      .unionByName(t.filter($"o_orderkey" % 97 === 0)
        .select(($"o_orderkey" + 1000000000L).as("s_key"),
          lit("N").as("s_status"), price2.cast("double").as("s_price")))
    t.join(src, $"o_orderkey" === $"s_key", "full_outer")
      .select(
        coalesce($"o_orderkey", $"s_key").as("o_orderkey"),
        coalesce($"s_status", $"o_orderstatus").as("o_orderstatus"),
        round(coalesce($"s_price", $"o_totalprice"), 2).as("o_totalprice"),
        when($"o_orderkey".isNull, "insert")
          .when($"s_key".isNull, "unchanged")
          .otherwise("update").as("merge_action"))
      .filter($"merge_action" =!= "unchanged")
      .orderBy($"o_orderkey")
  }

  /** SCD TYPE-2 dimension history built from a change log: each
    * customer's order stream is the feed of attribute observations
    * (o_orderpriority as the tracked attribute); consecutive duplicate
    * observations COLLAPSE (a version opens only when the attribute
    * actually changes — the defining SCD2 rule), and each surviving
    * version carries valid_from / valid_to (next version's start, open
    * sentinel 9999-12-31), a per-key version number, and is_current.
    * This is the warehouse-side complement of [[qMergeUpsert]]: merge
    * applies the latest state, SCD2 preserves the full validity
    * timeline for as-of joins ([[Events]] ev_asof_*).
    *
    * Scale shape: two windows, both partitioned by the dimension key —
    * frames are change-log-depth per key (dimension-scale, not
    * fact-scale); ties break on the order key so both engines pick the
    * same version chain deterministically. One shuffle on o_custkey
    * feeds both windows (same partitioning, no re-exchange). */
  val qScd2History: Spec = Spec(
    "q_scd2_history",
    oracle = Some("""
      WITH v AS (
        SELECT o_custkey, o_orderkey,
          strftime(o_orderdate, '%Y-%m-%d') AS d, o_orderpriority AS attr
        FROM orders),
      chg AS (
        SELECT *, lag(attr) OVER w AS prev
        FROM v WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey)),
      kept AS (SELECT o_custkey, o_orderkey, d, attr FROM chg
        WHERE prev IS NULL OR prev <> attr),
      hist AS (
        SELECT o_custkey, attr, d AS valid_from,
          lead(d) OVER w AS valid_to,
          CAST(row_number() OVER w AS BIGINT) AS version
        FROM kept WINDOW w AS (PARTITION BY o_custkey ORDER BY d, o_orderkey))
      SELECT o_custkey, version, attr, valid_from,
        COALESCE(valid_to, '9999-12-31') AS valid_to,
        CAST(valid_to IS NULL AS BOOLEAN) AS is_current
      FROM hist ORDER BY o_custkey, version""")) { (s, dir) =>
    import s.implicits._
    val v = Tables.load(s, dir, "orders")
      .select($"o_custkey", $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("d"),
        $"o_orderpriority".as("attr"))
    val w = Window.partitionBy($"o_custkey").orderBy($"d", $"o_orderkey")
    val kept = v
      .withColumn("prev", lag($"attr", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"attr")
      .select($"o_custkey", $"o_orderkey", $"d", $"attr")
    kept
      .withColumn("valid_to_raw", lead($"d", 1).over(w))
      .withColumn("version", row_number().over(w).cast("long"))
      .select($"o_custkey", $"version", $"attr",
        $"d".as("valid_from"),
        coalesce($"valid_to_raw", lit("9999-12-31")).as("valid_to"),
        $"valid_to_raw".isNull.as("is_current"))
      .orderBy($"o_custkey", $"version")
  }

  /** Data-quality EXPECTATIONS suite (the deequ/Great-Expectations
    * pattern): a declarative battery of constraint checks — primary-key
    * uniqueness, referential integrity, value domains, numeric ranges,
    * format conformity — evaluated in one pass per table and reported
    * as (check, violations, total, passed) rows. The acctbal check
    * carries REAL violations (TPC-H account balances go negative), so
    * the report proves the counting path, not just the happy path.
    *
    * Scale shape: each table contributes ONE aggregation (all its
    * scalar checks fused as conditional sums — adding a check adds a
    * column, not a scan); referential checks ride the existing join
    * strategy space (customer/nation keys broadcast under the dims-are-
    * small rule, lineitem→orders a keyed shuffle join — the same plan a
    * standalone FK audit would need, here amortized into the table's
    * single pass). Each per-table row unpivots via `stack`; the final
    * union is |checks| rows, constant no matter the input scale. */
  val qExpectations: Spec = Spec(
    "q_expectations",
    oracle = Some("""
      WITH o AS (
        SELECT COUNT(*) AS total,
          COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dup,
          SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS fk_miss,
          SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END)
            AS bad_status,
          SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price
        FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON c.c_custkey = orders.o_custkey),
      l AS (
        SELECT COUNT(*) AS total,
          SUM(CASE WHEN ok.o_orderkey IS NULL THEN 1 ELSE 0 END) AS fk_miss,
          SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
            AS bad_qty,
          SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END)
            AS bad_disc
        FROM lineitem
          LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ok
          ON ok.o_orderkey = lineitem.l_orderkey),
      c AS (
        SELECT COUNT(*) AS total,
          SUM(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END) AS fk_miss,
          SUM(CASE WHEN c_acctbal < 0 THEN 1 ELSE 0 END) AS neg_bal,
          SUM(CASE WHEN NOT regexp_matches(c_name, '^Customer#[0-9]+$')
              THEN 1 ELSE 0 END) AS bad_name
        FROM customer
          LEFT JOIN (SELECT DISTINCT n_nationkey FROM nation) n
          ON n.n_nationkey = customer.c_nationkey),
      p AS (
        SELECT COUNT(*) AS total,
          SUM(CASE WHEN p_retailprice <= 0 THEN 1 ELSE 0 END) AS bad_price
        FROM part),
      u AS (
        SELECT 'orders_pk_unique' AS check, pk_dup AS violations, total FROM o
        UNION ALL SELECT 'orders_fk_customer', fk_miss, total FROM o
        UNION ALL SELECT 'orders_status_domain', bad_status, total FROM o
        UNION ALL SELECT 'orders_totalprice_positive', bad_price, total FROM o
        UNION ALL SELECT 'lineitem_fk_orders', fk_miss, total FROM l
        UNION ALL SELECT 'lineitem_qty_range', bad_qty, total FROM l
        UNION ALL SELECT 'lineitem_discount_range', bad_disc, total FROM l
        UNION ALL SELECT 'customer_fk_nation', fk_miss, total FROM c
        UNION ALL SELECT 'customer_acctbal_nonnegative', neg_bal, total FROM c
        UNION ALL SELECT 'customer_name_format', bad_name, total FROM c
        UNION ALL SELECT 'part_retailprice_positive', bad_price, total FROM p)
      SELECT "check", CAST(violations AS BIGINT) AS violations,
        CAST(total AS BIGINT) AS total, violations = 0 AS passed
      FROM u ORDER BY "check" """),
    bench = true) { (s, dir) =>
    import s.implicits._
    def viol(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))
    val custKeys = Tables.load(s, dir, "customer")
      .select($"c_custkey").distinct()
    val orderKeys = Tables.load(s, dir, "orders")
      .select($"o_orderkey".as("ok_key")).distinct()
    val nationKeys = Tables.load(s, dir, "nation")
      .select($"n_nationkey").distinct()
    val o = Tables.load(s, dir, "orders")
      .join(broadcast(custKeys), $"c_custkey" === $"o_custkey", "left")
      .agg(count(lit(1)).as("total"),
        (count(lit(1)) - countDistinct($"o_orderkey")).as("pk_dup"),
        viol($"c_custkey".isNull).as("fk_miss"),
        viol(!$"o_orderstatus".isin("O", "F", "P")).as("bad_status"),
        viol($"o_totalprice" <= 0).as("bad_price"))
      .select(expr("stack(4, " +
        "'orders_pk_unique', pk_dup, total, " +
        "'orders_fk_customer', fk_miss, total, " +
        "'orders_status_domain', bad_status, total, " +
        "'orders_totalprice_positive', bad_price, total) " +
        "AS (check, violations, total)"))
    val l = Tables.load(s, dir, "lineitem")
      .join(orderKeys, $"ok_key" === $"l_orderkey", "left")
      .agg(count(lit(1)).as("total"),
        viol($"ok_key".isNull).as("fk_miss"),
        viol($"l_quantity" < 1 || $"l_quantity" > 50).as("bad_qty"),
        viol($"l_discount" < 0 || $"l_discount" > 0.1).as("bad_disc"))
      .select(expr("stack(3, " +
        "'lineitem_fk_orders', fk_miss, total, " +
        "'lineitem_qty_range', bad_qty, total, " +
        "'lineitem_discount_range', bad_disc, total) " +
        "AS (check, violations, total)"))
    val c = Tables.load(s, dir, "customer")
      .join(broadcast(nationKeys), $"n_nationkey" === $"c_nationkey", "left")
      .agg(count(lit(1)).as("total"),
        viol($"n_nationkey".isNull).as("fk_miss"),
        viol($"c_acctbal" < 0).as("neg_bal"),
        viol(!$"c_name".rlike("^Customer#[0-9]+$")).as("bad_name"))
      .select(expr("stack(3, " +
        "'customer_fk_nation', fk_miss, total, " +
        "'customer_acctbal_nonnegative', neg_bal, total, " +
        "'customer_name_format', bad_name, total) " +
        "AS (check, violations, total)"))
    val p = Tables.load(s, dir, "part")
      .agg(count(lit(1)).as("total"),
        viol($"p_retailprice" <= 0).as("bad_price"))
      .select(expr("stack(1, " +
        "'part_retailprice_positive', bad_price, total) " +
        "AS (check, violations, total)"))
    o.unionAll(l).unionAll(c).unionAll(p)
      .select($"check", $"violations".cast("long").as("violations"),
        $"total".cast("long").as("total"),
        ($"violations" === 0).as("passed"))
      .orderBy($"check")
  }

  /** Skyline (Pareto front) of parts minimizing (retailprice, size):
    * the multi-objective "best tradeoffs" query (cheapest part at every
    * size class). The textbook formulation is a NOT EXISTS dominance
    * self-join — O(n^2) and a scale-killer. Here: one hash agg to the
    * per-price min size (distinct prices), then
    * [[graft.ops.Skew.exclusivePrefixMin]] over price order (range
    * partition + per-partition minima + partition-local window — never
    * an unpartitioned sort), and a row is on the front iff no strictly
    * cheaper price achieved an equal-or-smaller size. O(n log n) total;
    * the front itself is tiny for any non-adversarial distribution
    * (O(log n) expected under independence), so the reattach join
    * broadcasts it. Equal (price, size) duplicates are mutually
    * non-dominated and all survive — both engines agree by the same
    * strict-inequality rule. */
  val qSkylineParts: Spec = Spec(
    "q_skyline_parts",
    oracle = Some("""
      WITH pp AS (
        SELECT CAST(p_retailprice AS DECIMAL(12,2)) AS price,
               CAST(MIN(p_size) AS BIGINT) AS msize
        FROM part GROUP BY 1),
      pm AS (
        SELECT price, msize,
          MIN(msize) OVER (ORDER BY price
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS smin
        FROM pp),
      sky AS (SELECT price, msize FROM pm
              WHERE smin IS NULL OR smin > msize)
      SELECT p.p_partkey, CAST(s.price AS DOUBLE) AS price,
        CAST(p.p_size AS BIGINT) AS p_size
      FROM part p
      JOIN sky s ON CAST(p.p_retailprice AS DECIMAL(12,2)) = s.price
                AND CAST(p.p_size AS BIGINT) = s.msize
      ORDER BY s.price, p.p_partkey""")) { (s, dir) =>
    val pp = Tables.load(s, dir, "part")
      .groupBy(col("p_retailprice").cast("decimal(12,2)").as("price"))
      .agg(min(col("p_size").cast("long")).as("msize"))
    val sky = graft.ops.Skew
      .exclusivePrefixMin(pp, Seq(col("price")), col("msize"), "smin")
      .filter(col("smin").isNull || col("smin") > col("msize"))
      .select(col("price"), col("msize"))
    Tables.load(s, dir, "part")
      .withColumn("price", col("p_retailprice").cast("decimal(12,2)"))
      .join(broadcast(sky), Seq("price"))
      .filter(col("p_size").cast("long") === col("msize"))
      .select(col("p_partkey"), col("price").cast("double").as("price"),
        col("p_size").cast("long").as("p_size"))
      .orderBy(col("price"), col("p_partkey"))
  }

  /** k-anonymity audit over a generalization ladder — the privacy gate
    * a training corpus with user-derived records needs before release.
    * Quasi-identifiers (nation, market segment, balance band) define
    * equivalence classes; a class of size k < 5 re-identifies its
    * members. One GROUPING SETS pass evaluates THREE generalization
    * levels at once (full QID → drop segment → nation only): Spark's
    * Expand feeds a single hash agg, so the whole lattice walk costs
    * one scan + one shuffle. Per level: class count, worst-case k,
    * worst-case l-diversity of the sensitive value (exact balance in
    * cents), and how many records suppression-at-k=5 would drop — the
    * release decision is "generalize until n_suppressed is
    * acceptable". */
  val qKAnonymity: Spec = {
    // dialect-shared text: Spark and DuckDB agree on every construct
    val sql = """
      WITH q AS (
        SELECT c_nationkey AS nation, c_mktsegment AS segment,
          CAST(FLOOR(CAST(c_acctbal AS DECIMAL(12,2)) / 1000) AS BIGINT) AS bal_band,
          CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS sens
        FROM customer),
      classes AS (
        SELECT CAST(GROUPING(segment) + GROUPING(bal_band) AS BIGINT) AS level,
               COUNT(*) AS k, COUNT(DISTINCT sens) AS l
        FROM q
        GROUP BY GROUPING SETS ((nation, segment, bal_band),
                                (nation, bal_band), (nation)))
      SELECT level, COUNT(*) AS n_classes,
        CAST(MIN(k) AS BIGINT) AS min_k,
        CAST(MIN(l) AS BIGINT) AS min_l,
        CAST(COUNT(CASE WHEN k < 5 THEN 1 END) AS BIGINT) AS n_violating,
        CAST(SUM(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS n_suppressed
      FROM classes GROUP BY level ORDER BY level"""
    Spec("q_kanonymity", oracle = Some(sql)) { (s, dir) =>
      Tables.registerAll(s, dir)
      s.sql(sql)
    }
  }

  /** Incremental materialized-view maintenance: the monthly revenue MV
    * refreshed from a delta batch WITHOUT re-reading the base — the
    * shape every warehouse rollup at 100 TB depends on. The stored MV
    * keeps MERGEABLE partials (count, decimal sum — avg is derived at
    * read time, never stored, because avg doesn't merge); refresh is
    * partial-agg(delta) unioned with the snapshot and re-merged, so it
    * touches |mv| + |delta groups| rows while the base is scanned only
    * when the snapshot was first built. The oracle is the full
    * recompute over all of orders — the contract IS
    * incremental-equals-full, which decimal (associative,
    * order-independent) summation guarantees. */
  val qIncrMv: Spec = Spec(
    "q_incr_mv",
    oracle = Some("""
      SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          / COUNT(*), 6) AS avg_price
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders")
    val split = lit("1997-01-01").cast("timestamp")
    def mvPartials(df: DataFrame): DataFrame = df
      .groupBy(col("o_orderpriority"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val snapshot = mvPartials(orders.filter(col("o_orderdate") < split))
    val delta = mvPartials(orders.filter(col("o_orderdate") >= split))
    snapshot.unionByName(delta)
      .groupBy(col("o_orderpriority"), col("month"))
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("rev")).as("rev"))
      .select(col("o_orderpriority"), col("month"), col("n_orders"),
        col("rev").cast("double").as("revenue"),
        round(col("rev").cast("double") / col("n_orders"), 6).as("avg_price"))
      .orderBy(col("o_orderpriority"), col("month"))
  }

  /** Incremental maintenance of a JOIN materialized view — the
    * bilinear-delta rule Δ(A ⋈ B) = ΔA ⋈ B applied to the fact side
    * (customer is the slowly-changing dim; its deltas are SCD2
    * territory, [[qScd2History]]). The stored MV keeps per-(nation,
    * month) MERGEABLE partials of orders ⋈ customer; refresh joins
    * ONLY the order delta against the dim and re-merges — |delta| join
    * work + |mv| merge rows, never a base re-scan, which is what keeps
    * a 100 TB fact's rollup maintainable. The dim side of the delta
    * join is key-hashed (broadcast-able when the dim fits); the oracle
    * is the full recompute, so the green row IS the
    * incremental-equals-full proof (exact by decimal associativity). */
  val qIncrJoinMv: Spec = Spec(
    "q_incr_join_mv",
    oracle = Some("""
      SELECT n.n_name AS nation, strftime(o.o_orderdate, '%Y-%m') AS month,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2 ORDER BY 1, 2""")) { (s, dir) =>
    val orders = Tables.load(s, dir, "orders")
    val dim = Tables.load(s, dir, "customer")
      .join(Tables.load(s, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation"))
    val split = lit("1997-01-01").cast("timestamp")
    def mvPartials(facts: DataFrame): DataFrame = facts
      .join(dim, col("c_custkey") === col("o_custkey"))
      .groupBy(col("nation"),
        date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val snapshot = mvPartials(orders.filter(col("o_orderdate") < split))
    val delta = mvPartials(orders.filter(col("o_orderdate") >= split))
    snapshot.unionByName(delta)
      .groupBy(col("nation"), col("month"))
      .agg(sum(col("n_orders")).as("n_orders"), sum(col("rev")).as("rev"))
      .select(col("nation"), col("month"), col("n_orders"),
        col("rev").cast("double").as("revenue"))
      .orderBy(col("nation"), col("month"))
  }

  /** HLL distinct-order estimate per returnflag from 256 explicit
    * registers ([[graft.ops.Hll]]) — one hash-aggregate over (flag, reg)
    * whose shuffle carries at most m rows per group regardless of input
    * scale, then a 256-row-per-group fold: the constant-state
    * mergeable-distinct workhorse for 100 TB shard counting. The oracle
    * replays the ESTIMATE exactly (md5-derived registers; see Hll's
    * float-exactness argument). Exact distinct shipped alongside so the
    * row documents the observed error (~2-6% at m=256). */
  val qHllDistinct: Spec = Spec(
    "q_hll_distinct",
    bench = true, // r12 sketch-family row: register build is one fact scan
    oracle = Some(s"""
      WITH regs AS ${Hll.regSql("l_returnflag", "l_orderkey", "lineitem", "l_returnflag")},
      est AS (${Hll.estSql("l_returnflag")})
      SELECT e.l_returnflag, e.nonzero_regs, e.zeros, e.used_linear,
        e.est_distinct, x.exact_distinct
      FROM est e JOIN (SELECT l_returnflag,
          CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct
        FROM lineitem GROUP BY l_returnflag) x USING (l_returnflag)
      ORDER BY e.l_returnflag""")) { (s, dir) =>
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val regs = Hll.registers(li, Seq("l_returnflag"), $"l_orderkey")
    val est = Hll.estimate(regs, Seq("l_returnflag"))
    val exact = li.groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("exact_distinct"))
    est.join(exact, "l_returnflag")
      .select($"l_returnflag", $"nonzero_regs", $"zeros", $"used_linear",
        $"est_distinct", $"exact_distinct")
      .orderBy($"l_returnflag")
  }

  /** HLL MERGEABILITY: registers from two overlapping shards
    * (l_linenumber parity) union by ELEMENTWISE MAX — the property that
    * makes HLL the cross-shard distinct sketch (ship 256 bytes per
    * shard, never re-scan); intersection via inclusion-exclusion.
    * Exact counts shipped alongside: the union estimate and the
    * from-merged-registers estimate are THE SAME NUMBER by construction
    * (max is associative), which the oracle replays. */
  val qHllUnion: Spec = Spec(
    "q_hll_union",
    oracle = Some(s"""
      WITH regs AS ${Hll.regSql(
        "l_linenumber % 2 AS shard", "l_orderkey", "lineitem", "shard")},
      merged AS (SELECT 'u' AS shard_key, reg, MAX(mr) AS mr FROM regs GROUP BY reg
        UNION ALL SELECT CAST(shard AS VARCHAR), reg, mr FROM regs),
      est AS (${Hll.estSql("shard_key", "merged")}),
      p AS (SELECT
          MAX(CASE WHEN shard_key = '0' THEN est_distinct END) AS est_a,
          MAX(CASE WHEN shard_key = '1' THEN est_distinct END) AS est_b,
          MAX(CASE WHEN shard_key = 'u' THEN est_distinct END) AS est_union
        FROM est),
      x AS (SELECT
          CAST(COUNT(DISTINCT CASE WHEN l_linenumber % 2 = 0 THEN l_orderkey END) AS BIGINT) AS exact_a,
          CAST(COUNT(DISTINCT CASE WHEN l_linenumber % 2 = 1 THEN l_orderkey END) AS BIGINT) AS exact_b,
          CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_union
        FROM lineitem)
      SELECT p.est_a, p.est_b, p.est_union,
        ROUND(p.est_a + p.est_b - p.est_union, 4) AS est_intersection,
        x.exact_a, x.exact_b, x.exact_union,
        CAST(x.exact_a + x.exact_b - x.exact_union AS BIGINT) AS exact_intersection
      FROM p CROSS JOIN x""")) { (s, dir) =>
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val regs = li
      .select(($"l_linenumber" % 2).cast("string").as("shard_key"),
        Hll.regRho($"l_orderkey").as("rr"))
      .groupBy($"shard_key", $"rr.reg".as("reg"))
      .agg(max($"rr.rho").as("mr"))
      .localCheckpoint() // per-shard registers feed both shard + union ests
    val merged = regs.groupBy($"reg").agg(max($"mr").as("mr"))
      .select(lit("u").as("shard_key"), $"reg", $"mr")
    val est = Hll.estimate(regs.unionByName(merged), Seq("shard_key"))
      .select($"shard_key", $"est_distinct")
    val p = est.groupBy().agg(
      max(when($"shard_key" === "0", $"est_distinct")).as("est_a"),
      max(when($"shard_key" === "1", $"est_distinct")).as("est_b"),
      max(when($"shard_key" === "u", $"est_distinct")).as("est_union"))
    val x = li.agg(
      countDistinct(when($"l_linenumber" % 2 === 0, $"l_orderkey"))
        .as("exact_a"),
      countDistinct(when($"l_linenumber" % 2 === 1, $"l_orderkey"))
        .as("exact_b"),
      countDistinct($"l_orderkey").as("exact_union"))
    p.crossJoin(broadcast(x))
      .select($"est_a", $"est_b", $"est_union",
        round($"est_a" + $"est_b" - $"est_union", 4).as("est_intersection"),
        $"exact_a", $"exact_b", $"exact_union",
        ($"exact_a" + $"exact_b" - $"exact_union").cast("long")
          .as("exact_intersection"))
  }

  /** JOIN-SIZE ESTIMATION from AMS sketch products — the tug-of-war
    * sketch applied to its ORIGINAL purpose (Alon-Matias-Szegedy '96
    * §3: |R ⋈ S| = Σ_k c_R(k)·c_S(k) is estimated by the product of
    * the two relations' sign-sums under a SHARED hash), i.e. the
    * optimizer statistic a CBO needs before picking a join strategy,
    * computed in one streaming-friendly pass per side with 61 counters
    * of state each — no key histogram, no shuffle of keys. R = all
    * lineitem partkeys, S = the returned subset (a genuinely
    * many-to-many overlap); 5×24 sign functions from md5 bits — all
    * 120 usable bits of the ev_ams_f2 family's exact construction, so
    * both engines replay bit-for-bit (join-size products have higher
    * variance than F2, Var ∝ F2(R)·F2(S)/width, so this sketch uses
    * double the F2 row's width) — estimate = median of 5 means of 24
    * products; 121 counters of state per side.
    * Integer discipline: every Z_R·Z_S product is exact in BIGINT up
    * to n ≈ 3·10⁹ per side — past that the same query rides
    * DECIMAL(38,0) unchanged. Exact join size shipped alongside from
    * the per-key count join, so the row reports its own error. */
  val qJoinSizeAms: Spec = Spec(
    "q_join_size_ams",
    oracle = Some {
      def bitSql(i: Int) =
        s"""((CAST('0x' || substr(h, ${i / 4 + 1}, 1) AS INT) >> ${3 - i % 4}) & 1)"""
      def bitSums(pfx: String) = (0 until 120).map(i =>
        s"CAST(SUM(${bitSql(i)}) AS BIGINT) AS ${pfx}$i").mkString(", ")
      val prods = (0 until 120).map(i =>
        s"(2*r.br$i - r.nr)*(2*s.bs$i - s.ns)")
      val groups = prods.grouped(24).zipWithIndex.map { case (g, j) =>
        s"(${g.mkString(" + ")}) // 24 AS g$j" }.mkString(", ")
      s"""
      WITH hr AS (SELECT md5('ams_' || l_partkey::VARCHAR) AS h FROM lineitem),
      hs AS (SELECT md5('ams_' || l_partkey::VARCHAR) AS h FROM lineitem
             WHERE l_returnflag = 'R'),
      r AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr, ${bitSums("br")} FROM hr),
      s AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns, ${bitSums("bs")} FROM hs),
      gm AS (SELECT $groups FROM r CROSS JOIN s),
      med AS (SELECT gv AS est_join_size FROM (
          SELECT gv, row_number() OVER (ORDER BY gv) AS rn
          FROM (SELECT unnest([g0, g1, g2, g3, g4]) AS gv FROM gm))
        WHERE rn = 3),
      cr AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM lineitem
             GROUP BY 1),
      cs AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM lineitem
             WHERE l_returnflag = 'R' GROUP BY 1),
      ex AS (SELECT CAST(SUM(cr.c * cs.c) AS BIGINT) AS exact_join_size
             FROM cr JOIN cs USING (l_partkey))
      SELECT m.est_join_size, x.exact_join_size,
        (SELECT nr FROM r) AS n_r, (SELECT ns FROM s) AS n_s
      FROM med m CROSS JOIN ex x"""
    }) { (s, dir) =>
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    def bit(i: Int) =
      shiftright(conv(substring(col("h"), i / 4 + 1, 1), 16, 10).cast("int"),
        3 - i % 4).bitwiseAND(1)
    def bitSums(df: DataFrame, pfx: String, nName: String): DataFrame = {
      val hashed = df.select(
        md5(concat(lit("ams_"), $"l_partkey".cast("string"))).as("h"))
      val aggs = count(lit(1)).as(nName) +:
        (0 until 120).map(i => sum(bit(i)).cast("long").as(s"$pfx$i"))
      hashed.agg(aggs.head, aggs.tail: _*)
    }
    val r = bitSums(li, "br", "nr")
    val sS = bitSums(li.filter($"l_returnflag" === "R"), "bs", "ns")
    val groupMeans = (0 until 5).map(j =>
      expr(s"(${(0 until 24).map(i =>
        s"((2*br${j * 24 + i} - nr)*(2*bs${j * 24 + i} - ns))").mkString(" + ")
      }) div 24").as(s"g$j"))
    // one scan per side: counts ride along with the sign-sums so the
    // 1-row sketch frames are never recomputed for the n_r/n_s columns
    val est = r.crossJoin(broadcast(sS))
      .select((groupMeans :+ $"nr".as("n_r") :+ $"ns".as("n_s")): _*)
      .select(element_at(sort_array(array((0 until 5).map(j =>
        col(s"g$j")): _*)), 3).as("est_join_size"), $"n_r", $"n_s")
    val cr = li.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
    val cs = li.filter($"l_returnflag" === "R")
      .groupBy($"l_partkey").agg(count(lit(1)).as("c2"))
    val ex = cr.join(cs, "l_partkey")
      .agg(sum($"c" * $"c2").cast("long").as("exact_join_size"))
    est.crossJoin(broadcast(ex))
      .select($"est_join_size", $"exact_join_size", $"n_r", $"n_s")
  }

  /** Sample-based NDV estimation (Chao '84: d̂ = d_seen + f₁²/(2f₂),
    * from the singleton/doubleton abundance counts of a sample) — the
    * OTHER way a CBO gets a distinct count, complementing the
    * full-scan sketch path ([[qHllDistinct]]): when even one pass over
    * the corpus is too expensive, scan a block sample and extrapolate
    * from how many values were seen exactly once vs twice. The sample
    * is the deterministic md5 1-in-16 rule (q_consistent_sample's
    * discipline), so both engines draw THE SAME sample and the
    * estimate hash-matches. All integer until one division;
    * exact NDV alongside so the row reports its own error. f₂ = 0
    * degenerates to the Chao1 bias-corrected form f₁(f₁−1)/2 — same
    * branch on both engines. */
  val qNdvChao: Spec = Spec(
    "q_ndv_chao",
    oracle = Some("""
      WITH smp AS (SELECT l_partkey FROM lineitem
        WHERE CAST('0x' || substr(md5('ndv_' || l_orderkey::VARCHAR
            || '_' || l_linenumber::VARCHAR), 1, 12) AS BIGINT) % 16 = 0),
      ab AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM smp
        GROUP BY 1),
      f AS (SELECT CAST(COUNT(*) AS BIGINT) AS d_seen,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
          CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
          CAST(SUM(c) AS BIGINT) AS n_sample
        FROM ab),
      x AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_ndv,
          CAST(COUNT(*) AS BIGINT) AS n_rows FROM lineitem)
      SELECT f.n_sample, f.d_seen, f.f1, f.f2,
        ROUND(f.d_seen + CASE WHEN f.f2 > 0
          THEN CAST(f.f1 AS DOUBLE) * f.f1 / (2.0e0 * f.f2)
          ELSE CAST(f.f1 AS DOUBLE) * (f.f1 - 1) / 2.0e0 END, 4)
          AS est_ndv,
        x.exact_ndv, x.n_rows
      FROM f CROSS JOIN x""")) { (s, dir) =>
    import s.implicits._
    val li = Tables.load(s, dir, "lineitem")
    val smp = li.filter(
      conv(substring(md5(concat(lit("ndv_"), $"l_orderkey".cast("string"),
        lit("_"), $"l_linenumber".cast("string"))), 1, 12), 16, 10)
        .cast("long") % 16 === 0)
    val f = smp.groupBy($"l_partkey").agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("d_seen"),
        sum(when($"c" === 1, 1L).otherwise(0L)).as("f1"),
        sum(when($"c" === 2, 1L).otherwise(0L)).as("f2"),
        sum($"c").as("n_sample"))
    val x = li.agg(countDistinct($"l_partkey").as("exact_ndv"),
      count(lit(1)).as("n_rows"))
    f.crossJoin(broadcast(x))
      .select($"n_sample", $"d_seen", $"f1", $"f2",
        round($"d_seen" + when($"f2" > 0,
          $"f1".cast("double") * $"f1" / (lit(2.0) * $"f2"))
          .otherwise($"f1".cast("double") * ($"f1" - 1) / lit(2.0)), 4)
          .as("est_ndv"),
        $"exact_ndv", $"n_rows")
  }

  /** Range-predicate SELECTIVITY from a 16-bucket equi-depth histogram
    * — the third CBO statistic next to NDV ([[qNdvChao]],
    * [[qHllDistinct]]) and join size ([[qJoinSizeAms]]): boundaries are
    * exact interpolated quantiles (the Spark `percentile` /
    * DuckDB `quantile_cont` pair the Theil-Sen family already proved
    * engine-equal), and sel(lo ≤ x ≤ hi) = mean over buckets of the
    * clamped linear overlap fraction — THE SAME generated expression
    * text runs on both engines over boundary columns b0..b16, so the
    * float op order is identical by construction. Exact selectivity
    * alongside; the observed error at sf0.01 is the honest histogram
    * resolution story (uniform-within-bucket assumption). Scale note:
    * `percentile` buffers per-distinct-value counts in the aggregation
    * buffer — fine while the value domain is bounded (prices here); for
    * an unbounded domain at 100 TB the SAME estimate expression takes
    * its b0..b16 from [[qExactQuantile2Pass]]'s histogram-then-rank
    * selector or [[qTdigest]]'s sketch instead — the estimator is
    * boundary-source-agnostic by construction. */
  val qSelectivityHistogram: Spec = {
    val (lo, hi) = ("20000.0e0", "60000.0e0")
    def term(k: Int) =
      s"""(CASE WHEN b$k <= b${k - 1}
           THEN (CASE WHEN b$k >= $lo AND b$k <= $hi THEN 1.0e0 ELSE 0.0e0 END)
           ELSE least(1.0e0, greatest(0.0e0,
             (least($hi, b$k) - greatest($lo, b${k - 1})) / (b$k - b${k - 1})))
           END)"""
    val estExpr =
      s"ROUND((${(1 to 16).map(term).mkString(" + ")}) / 16.0e0, 6)"
    Spec(
      "q_selectivity_histogram",
      oracle = Some(s"""
        WITH b AS (SELECT MIN(l_extendedprice) AS b0,
            ${(1 to 15).map(k =>
              s"quantile_cont(l_extendedprice, ${k / 16.0}) AS b$k").mkString(", ")},
            MAX(l_extendedprice) AS b16,
            CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN l_extendedprice >= $lo AND l_extendedprice <= $hi
              THEN 1 ELSE 0 END) AS BIGINT) AS exact_rows
          FROM lineitem)
        SELECT $estExpr AS est_sel,
          ROUND(CAST(exact_rows AS DOUBLE) / CAST(n AS DOUBLE), 6) AS exact_sel,
          exact_rows, n
        FROM b""")) { (s, dir) =>
      import s.implicits._
      val li = Tables.load(s, dir, "lineitem").select($"l_extendedprice".as("v"))
      val aggs = Seq(min($"v").as("b0")) ++
        (1 to 15).map(k => expr(s"percentile(v, ${k / 16.0})").as(s"b$k")) ++
        Seq(max($"v").as("b16"), count(lit(1)).as("n"),
          sum(when($"v" >= 20000.0 && $"v" <= 60000.0, 1L).otherwise(0L))
            .as("exact_rows"))
      li.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"$estExpr AS est_sel",
          "ROUND(CAST(exact_rows AS DOUBLE) / CAST(n AS DOUBLE), 6) AS exact_sel",
          "exact_rows", "n")
    }
  }

  /** UNPIVOT (melt) — the inverse of [[qPivot]], completing the
    * reshaping pair: the q1-style wide aggregate turns into tidy
    * (group, metric, value) rows via ONE `stack` generator (no
    * per-metric re-scan, no union of N aggregates — the reshape is a
    * projection over a single hash-agg pass). Counts ride as exact
    * doubles (integers < 2^53); sums are the DECIMAL-exact q1
    * discipline. */
  val qUnpivotMetrics: Spec = Spec(
    "q_unpivot_metrics",
    oracle = Some(s"""
      WITH a AS (
        SELECT l_returnflag, l_linestatus,
          ${dsumSql("l_quantity")} AS sum_qty,
          ${dsumSql("l_extendedprice")} AS sum_base_price,
          CAST(COUNT(*) AS DOUBLE) AS count_order
        FROM lineitem GROUP BY 1, 2)
      SELECT l_returnflag, l_linestatus, metric, value FROM (
        SELECT l_returnflag, l_linestatus, 'sum_qty' AS metric,
          sum_qty AS value FROM a
        UNION ALL
        SELECT l_returnflag, l_linestatus, 'sum_base_price', sum_base_price
        FROM a
        UNION ALL
        SELECT l_returnflag, l_linestatus, 'count_order', count_order
        FROM a) u
      ORDER BY l_returnflag, l_linestatus, metric""")) { (s, dir) =>
    import s.implicits._
    Tables.load(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        count(lit(1)).cast("double").as("count_order"))
      .selectExpr("l_returnflag", "l_linestatus",
        "stack(3, 'sum_qty', sum_qty, 'sum_base_price', sum_base_price," +
          " 'count_order', count_order) AS (metric, value)")
      .orderBy($"l_returnflag", $"l_linestatus", $"metric")
  }

  /** LEAVE-ONE-OUT TARGET ENCODING of `p_brand` against the line-item
    * price — the categorical-feature transform every tabular training
    * pipeline ships (Micci-Barreca '01): each row's category is encoded
    * by the mean target of the OTHER rows in its category, blended
    * toward the global prior by a smoothing pseudo-count m=10, so rare
    * categories shrink to the prior instead of memorizing their own
    * labels (the leakage the LOO form exists to prevent).
    *
    *   enc_i = (S_g − x_i + m·μ) / (n_g − 1 + m)
    *
    * Per brand the query reports the encoding's min/max/spread — the
    * audit view a feature store materializes (a wide spread means the
    * encoding leaks row identity; a zero spread means it collapsed to
    * the category mean).
    *
    * Scale shape (r14: ONE fact pass, was two): enc_i is STRICTLY
    * MONOTONE DECREASING in x_i — S_g, n_g, μ are constants per brand
    * and every step (exact decimal S_g − x, cast to double, add 10μ,
    * divide by the positive constant n_g−1+m) preserves order under
    * IEEE correct rounding — so min(enc) = enc(max x) and max(enc) =
    * enc(min x), bit-for-bit (it IS the same op sequence evaluated at
    * the extreme x). The audit therefore needs only per-brand
    * (n, S, min x, max x): ONE hash agg over the fact scan (map-side
    * partials, shuffle carries |brands| rows) and a |brands|-row tail.
    * The r12 design's second pruned fact scan + broadcast rejoin +
    * re-aggregation are gone — guide §8's rule (decide on small rows,
    * never re-touch the payload) applied to the audit itself.
    *
    * Engine parity: S_g and S_g − x are exact DECIMAL(18,2) cents;
    * μ and the encode are fixed-order IEEE double ops on those exact
    * values, so min/max pick identical bits on both engines;
    * floor-micros makes the surfaced values integer-stable. The oracle
    * states the original per-row LOO form — the monotonicity argument
    * above is exactly why the two agree hash-for-hash. */
  val qTargetEncoding: Spec = Spec(
    "q_target_encoding",
    bench = true, // r12 wave-3 row: double fact scan + broadcast rejoin
    oracle = Some("""
      WITH base AS (SELECT p_brand,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS x
        FROM lineitem JOIN part ON p_partkey = l_partkey),
      bs AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS s
        FROM base GROUP BY p_brand),
      g AS (SELECT CAST(SUM(s) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS mu
        FROM bs),
      enc AS (SELECT b.p_brand, bs.n,
          (CAST(bs.s - b.x AS DOUBLE) + 10.0e0 * g.mu)
            / CAST(bs.n - 1 + 10 AS DOUBLE) AS e
        FROM base b JOIN bs ON bs.p_brand = b.p_brand CROSS JOIN g)
      SELECT p_brand, n AS n_rows,
        CAST(FLOOR(MIN(e) * 1000000) AS BIGINT) AS enc_min_micros,
        CAST(FLOOR(MAX(e) * 1000000) AS BIGINT) AS enc_max_micros,
        CAST(FLOOR(MAX(e) * 1000000) - FLOOR(MIN(e) * 1000000) AS BIGINT)
          AS spread_micros
      FROM enc GROUP BY p_brand, n ORDER BY p_brand""")) { (s, dir) =>
    import s.implicits._
    val base = Tables.load(s, dir, "lineitem")
      .join(broadcast(Tables.load(s, dir, "part")),
        $"p_partkey" === $"l_partkey")
      .select($"p_brand", $"l_extendedprice".cast("decimal(18,2)").as("x"))
    // |brands| rows, materialized once: TWO consumers (the broadcast μ
    // subquery and the audit tail) would otherwise each re-run the
    // fact scan — AQE's exchange reuse does not dedupe across a
    // broadcast-subquery boundary (r14 profile: two concurrent 3-task
    // scan stages until this checkpoint).
    val bs = base.groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), sum($"x").as("s"),
        min($"x").as("x_min"), max($"x").as("x_max"))
      .localCheckpoint()
    val g = broadcast(bs.agg(
      (sum($"s").cast("double") / sum($"n").cast("double")).as("mu")))
    // enc evaluated at the per-brand extreme x — the identical op
    // sequence the per-row form would run on that row, so the min/max
    // bits match the LOO oracle exactly (monotonicity note above).
    def e(x: org.apache.spark.sql.Column) =
      (($"s" - x).cast("double") + lit(10.0) * $"mu") /
      ($"n" - 1 + 10).cast("double")
    bs.crossJoin(g)
      .select($"p_brand", $"n".as("n_rows"),
        floor(e($"x_max") * 1e6).cast("long").as("enc_min_micros"),
        floor(e($"x_min") * 1e6).cast("long").as("enc_max_micros"),
        (floor(e($"x_min") * 1e6) - floor(e($"x_max") * 1e6)).cast("long")
          .as("spread_micros"))
      .orderBy($"p_brand")
  }

  val specs: Seq[Spec] = Seq(
    q1PricingSummary, q3TopOrders, q5RegionRevenue, q4LateShipments,
    qAntiCustomers, qTopPartsPerBrand, qRunningSupplier, qSetOps,
    qRollup, qGroupingSets, qPivot, qPercentiles, qHistogram, qDistinctAgg,
    qMonthly, qCaseWhen, qCube, qSqlSurface, qSketches, qWindowShapes,
    qOrderLatency, qStringOps, qFuzzyPartNames, qSaltedAgg, qRangeBandJoin,
    qBenford, qSkewReport, qConsistentSample, qRollingMedian, qBucketedJoin,
    qZorderCluster, qMergeUpsert, qScd2History, qExpectations,
    qSkylineParts, qKAnonymity, qIncrMv, qIncrJoinMv, qMarketBasket,
    qTdigest, qExactQuantile2Pass, qTopKRewritten, qArgmaxRewritten,
    qHllDistinct, qHllUnion, qJoinSizeAms, qNdvChao,
    qSelectivityHistogram, qTargetEncoding, qUnpivotMetrics)
}
