package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Link-graph scoring for web-corpus curation: PageRank-style centrality
  * (the classic page-quality prior — harmonic/centrality scores feed
  * URL-level quality weighting the same way fasttext scores feed text
  * quality weighting).
  *
  * Scale design: the canonical two-shuffles-per-iteration shape —
  * ranks ⋈ edges on `src` (edges pre-hash-partitioned ONCE and
  * persisted, so each iteration shuffles only the rank table), then an
  * aggregation keyed on `dst`. Dangling mass is a per-iteration scalar
  * from an O(nodes) aggregate (never an edge-scan). Each iteration's
  * rank table is eagerly localCheckpoint-ed, which both materializes it
  * and TRUNCATES the logical plan to a LogicalRDD — the rank table
  * feeds the next round twice (dangling + contributions), so without
  * truncation the plan doubles per round and analysis cost explodes
  * exponentially long before any data moves. No driver-side loops over
  * data: the only value ever collected is the node count (the dangling
  * mass rides as a 1-row broadcast attach, and convergence deltas only
  * exist in `pageRankUntil`).
  */
object Graph {

  /** Normalized, persisted graph tables shared by every iteration. */
  private case class Prepared(e: DataFrame, nodes: DataFrame, deg: DataFrame,
      n: Long) {
    def unpersistAll(): Unit =
      Seq(e, nodes, deg).foreach(_.unpersist(blocking = false))
  }

  private def prepare(edges: DataFrame, srcCol: String, dstCol: String): Prepared = {
    val spark = edges.sparkSession
    val nPart = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .repartition(nPart, col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    require(n > 0, "pageRank of an empty graph")
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    Prepared(e, nodes, deg, n)
  }

  /** One damped step over prepared tables. The dangling mass (Σ r over
    * zero-out-degree nodes) rides as a 1-ROW cross-join attach — a
    * broadcast scalar, NOT a driver action — so a fixed-iteration run
    * triggers no job at all between plan truncations.
    */
  private def step(p: Prepared, ranks: DataFrame, alpha: Double): DataFrame = {
    val dang = ranks.join(p.deg, ranks("id") === p.deg("src"), "left_anti")
      .agg(coalesce(sum("r"), lit(0.0)).as("__dang"))
    val contribs = p.e
      .join(ranks.withColumnRenamed("id", "src"), Seq("src"))
      .join(p.deg, Seq("src"))
      .select(col("dst").as("id"), (col("r") / col("deg")).as("c"))
    p.nodes.join(contribs.groupBy("id").agg(sum("c").as("c")), Seq("id"), "left")
      .crossJoin(dang)
      .select(col("id"),
        (lit((1.0 - alpha) / p.n) +
          lit(alpha) * (coalesce(col("c"), lit(0.0)) +
            col("__dang") / lit(p.n))).as("r"))
  }

  /** Damped PageRank with uniform dangling-mass redistribution:
    * `r' = (1−α)/N + α·(Σ_in r/deg + dangling/N)`. Self-loops count as
    * ordinary edges; duplicate edges collapse. Returns `(id, r)` after
    * exactly `iterations` rounds (fixed-round semantics keep the result
    * deterministic and oracle-expressible; convergence-driven stopping
    * is `pageRankUntil`).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      alpha: Double = 0.85, iterations: Int = 10): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    val p = prepare(edges, srcCol, dstCol)
    var ranks = p.nodes.withColumn("r", lit(1.0 / p.n))
    var it = 0
    while (it < iterations) {
      // localCheckpoint (eager) TRUNCATES the logical plan to a
      // LogicalRDD: `ranks` feeds the next step twice (dangling +
      // contributions), so an un-truncated loop doubles the plan per
      // round — exponential analysis cost long before any data moves.
      // With the dangling mass riding as a broadcast attach (no driver
      // action), the checkpoint is the round's ONLY job; measured,
      // per-round truncation also beats every-3rd-round truncation (a
      // deep multi-exchange AQE plan costs more than it saves).
      ranks = step(p, ranks, alpha).localCheckpoint(true)
      it += 1
    }
    // the returned ranks are a LogicalRDD (truncated), independent of the
    // prepared caches — release them so repeated invocations don't pile
    // persisted edge tables up to eviction pressure
    val out = if (iterations == 0) ranks.localCheckpoint(true) else ranks
    p.unpersistAll()
    out
  }

  /** Convergence-driven PageRank: iterate until `max |Δr| < tol` or
    * `maxIter`, whichever first. One extra O(nodes) join per iteration
    * for the delta — fine against the O(edges) contribution join. Each
    * iteration is eagerly localCheckpoint-ed so the plan stays one step
    * deep (see pageRank).
    */
  def pageRankUntil(edges: DataFrame, srcCol: String, dstCol: String,
      alpha: Double = 0.85, tol: Double = 1e-9, maxIter: Int = 50): DataFrame = {
    val p = prepare(edges, srcCol, dstCol)
    var ranks = p.nodes.withColumn("r", lit(1.0 / p.n)).localCheckpoint(true)
    var it = 0
    var delta = Double.MaxValue
    while (it < maxIter && delta >= tol) {
      val next = step(p, ranks, alpha).localCheckpoint(true) // plan truncation, see pageRank
      delta = next.withColumnRenamed("r", "r1")
        .join(ranks, Seq("id"))
        .agg(max(abs(col("r1") - col("r")))).head().getDouble(0)
      ranks = next
      it += 1
    }
    p.unpersistAll() // ranks is a LogicalRDD, independent of the caches
    ranks
  }

  /** One PageRank step from an existing `(id, r)` table — the resumable
    * building block for checkpointed long runs. The step is eagerly
    * materialized (localCheckpoint) so the per-call prepared caches can
    * be released before returning; a driver resuming N steps re-prepares
    * per call, which is the price of a stateless API — long in-process
    * runs should use `pageRank`/`pageRankUntil`, which prepare once.
    */
  def pageRankFrom(edges: DataFrame, srcCol: String, dstCol: String,
      ranks: DataFrame, alpha: Double = 0.85): DataFrame = {
    val p = prepare(edges, srcCol, dstCol)
    val out = step(p, ranks, alpha).localCheckpoint(true)
    p.unpersistAll()
    out
  }

  /** In/out degree per node — the cheap graph-shape profile (one agg
    * per direction + one full-outer merge).
    */
  def degreeStats(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
    val outD = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
    val inD = e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg"))
    outD.join(inD, Seq("id"), "full_outer")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }
}
