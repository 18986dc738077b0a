package graft.ops

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared bucket-local candidate-pair generation — the one scaffold
  * behind every LSH/blocking path (MinHash bands, prefix-filter token
  * buckets, SimHash bands, hyperplane bands). Keeping it in one place
  * means the star-pair cap semantics cannot drift between callers.
  *
  * Scale design: bucket membership stats come from a WINDOW over the
  * bucket key, not a `collect_list` aggregation — window sort state is
  * an external (spilling) sorter, so a degenerate bucket with 10⁸
  * members streams through disk instead of materializing one
  * aggregation-buffer row. Oversized buckets emit their star pairs as a
  * pure row-local projection (never any list); only buckets at or under
  * `maxBucket` are list-collected (buffer ≤ maxBucket ids by
  * construction) for all-pairs expansion. The window exchange and the
  * small-bucket groupBy hash-partition on the same key, so the group-by
  * reuses the window's shuffle.
  */
object Buckets {

  private val allPairs = expr(
    """flatten(transform(ids,
      |  x -> transform(filter(ids, y -> y > x),
      |       y -> named_struct('id_a', x, 'id_b', y))))""".stripMargin)

  private val obsId = new AtomicLong()

  /** Every pairs() plan registers its cap Observation here so a driver
    * (graft.Verify) can DRAIN the realized metrics per query and assert
    * capped_buckets==0 wherever the oracle states no-cap semantics —
    * the documented observability wired into the gate, not just
    * available to it.
    *
    * THREAD-scoped, not global: graft.Verify's parallel gate builds and
    * runs each query entirely on one pool thread, so per-thread queues
    * are exactly per-query attribution — a cap tripped by query A can
    * never surface in query B's drain (a global queue would interleave
    * registrations under concurrency and mis-attribute). Single-threaded
    * callers (tests, the serial gate) see identical behavior to the old
    * global queue because registration and drain share their thread. */
  private val observations =
    new ThreadLocal[java.util.ArrayDeque[Observation]] {
      override def initialValue(): java.util.ArrayDeque[Observation] =
        new java.util.ArrayDeque[Observation]()
    }

  /** Register a cap Observation from another bounded-degradation path
    * (e.g. the incremental-dedup corpus cap) so Verify's drain sees it
    * with the same semantics as the star cap's. The observed row must
    * carry a `capped_buckets` long. */
  private[ops] def registerCapObservation(prefix: String): Observation = {
    val obs = Observation(s"${prefix}_${obsId.incrementAndGet()}")
    val q = observations.get()
    q.add(obs)
    while (q.size > MaxPendingObservations) q.poll()
    obs
  }

  /** A long-lived driver that never drains (anything but Verify) must
    * not accumulate Observation refs forever — older entries beyond
    * this bound are discarded on registration (bound is per thread). */
  private val MaxPendingObservations = 1024

  /** Collect (observation name → capped_buckets) for every registered
    * observation that has reported since the last drain, removing all
    * registered observations. Returns the realized counts plus the
    * names that did NOT report within the (shared, not per-observation)
    * deadline — either a plan that was built but never executed, or one
    * that executed under a listener bus too slow to deliver. The two
    * are indistinguishable from the Observation API, so a caller that
    * knows its plans executed (graft.Verify's success path) must treat
    * a non-empty second component as "cap state unknown" and fail
    * closed rather than assume no cap tripped. */
  def drainCapCounts(timeoutMs: Long = 10000): (Map[String, Long], Seq[String]) = {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    val q = observations.get()
    val pending = scala.collection.mutable.ListBuffer[Observation]()
    var o = q.poll()
    while (o != null) { pending += o; o = q.poll() }
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    val out = scala.collection.mutable.Map[String, Long]()
    val unreported = scala.collection.mutable.ListBuffer[String]()
    def harvest(obs: Observation, waitMs: Long): Boolean =
      try {
        val r = Await.result(obs.future, waitMs.millis)
        // Three delivery shapes, all meaning "cap state known":
        //  - named row: the normal CollectMetrics result; sum() over an
        //    empty star branch is SQL NULL — zero trips.
        //  - EMPTY row (length 0): AQE empty-relation propagation
        //    eliminated the CollectMetrics node because the observed
        //    star branch was adaptively proven empty — no branch rows,
        //    no trips (first seen on d_ranking_agreement at sf0.1).
        //  - schemaless positional row: same elimination path on older
        //    listener deliveries; metrics keep construction order
        //    (capped_buckets, capped_rows) — read position 0.
        val v: Any =
          if (r.length == 0) null
          else if (r.schema == null) r.get(0)
          else r.getAs[Any]("capped_buckets")
        out(obs.name) = if (v == null) 0L else v.asInstanceOf[Long]
        true
      } catch {
        case _: java.util.concurrent.TimeoutException => false
      }
    // Two passes over a SHARED deadline: first harvest already-completed
    // observations at 0ms so one slow listener-bus delivery cannot eat
    // the whole budget and surface executed-but-undelivered siblings as
    // unreported; only then spend the remaining budget waiting on the
    // genuinely incomplete ones.
    val incomplete = pending.filterNot(harvest(_, 0L))
    incomplete.foreach { obs =>
      val leftMs = math.max(0L, (deadline - System.nanoTime()) / 1000000L)
      if (!harvest(obs, leftMs)) unreported += obs.name
    }
    (out.toMap, unreported.toList)
  }

  /** Distinct ordered candidate pairs (id_a < id_b) generated INSIDE
    * each bucket — the only shuffles are the bucket-key exchange and the
    * pair dedup; nothing recomputes per join side and nothing reaches
    * the driver.
    *
    * Buckets above `maxBucket` emit O(n) star CANDIDATES to the
    * bucket-min id instead of O(n²) pairs. That keeps recall for members
    * similar to the bucket minimum; cross pairs below-threshold vs the
    * minimum can be missed after exact verification — a documented
    * recall/cost trade for degenerate buckets, strictly better than
    * dropping them outright. Every call carries the cap (it is not
    * optional): an uncapped bucket is the one remaining way a blocking
    * scheme goes quadratic at 100 TB.
    *
    * Cap visibility: the plan carries an `observe` metric
    * (`graft_buckets_<n>`: `capped_buckets`, `capped_rows`) so a
    * triggered cap — which changes output vs a no-cap oracle — is
    * loggable/assertable rather than silent (see BucketsSpec).
    */
  def pairs(df: DataFrame, bucketCols: Seq[String], idCol: String,
      maxBucket: Int = 1000): DataFrame = {
    require(maxBucket >= 2, s"maxBucket=$maxBucket must be >= 2")
    val w = Window.partitionBy(bucketCols.map(col): _*)
    val withStats = df
      .select((bucketCols.map(col) :+ col(idCol).as("_id")): _*)
      .withColumn("_n", count(lit(1)).over(w))
      .withColumn("_min", min(col("_id")).over(w))
      .filter(col("_n") > 1)
    val obs = registerCapObservation("graft_buckets")
    val star = withStats
      .filter(col("_n") > maxBucket)
      .observe(obs,
        sum(when(col("_id") === col("_min"), 1L).otherwise(0L))
          .as("capped_buckets"),
        count(lit(1)).as("capped_rows"))
      .filter(col("_id") =!= col("_min"))
      .select(col("_min").as("id_a"), col("_id").as("id_b"))
    val small = withStats
      .filter(col("_n") <= maxBucket)
      .groupBy(bucketCols.map(col): _*)
      .agg(collect_list(col("_id")).as("ids"))
      .select(explode(allPairs).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
    star.unionByName(small).distinct()
  }
}
