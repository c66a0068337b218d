package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Dense driver-side reference: same semantics as Graph.pageRank. */
  private def refPageRank(edges: Seq[(Long, Long)], alpha: Double,
      iters: Int): Map[Long, Double] = {
    val e = edges.distinct
    val ids = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val n = ids.length
    val deg = e.groupBy(_._1).map { case (s, es) => idx(s) -> es.length }
    var r = Array.fill(n)(1.0 / n)
    for (_ <- 0 until iters) {
      val dangling = (0 until n).filterNot(deg.contains).map(r).sum
      val contrib = Array.fill(n)(0.0)
      e.foreach { case (s, d) => contrib(idx(d)) += r(idx(s)) / deg(idx(s)) }
      r = Array.tabulate(n)(i =>
        (1.0 - alpha) / n + alpha * (contrib(i) + dangling / n))
    }
    ids.zip(r).toMap
  }

  test("pageRank matches the dense reference on a small graph") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L), (1L, 3L), (5L, 5L))
    val got = Graph.pageRank(edges.toDF("s", "d"), "s", "d",
      alpha = 0.85, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = refPageRank(edges, 0.85, 5)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, r) => assert(math.abs(r - want(id)) < 1e-12,
      s"node $id: $r vs ${want(id)}") }
  }

  test("rank mass is conserved (sums to 1) with dangling nodes present") {
    // node 4 has no out-edges -> dangling
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val ranks = Graph.pageRank(edges, "s", "d", iterations = 8)
    val total = ranks.agg(sum("r")).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("star graph: hub out-ranks leaves; ring graph: uniform") {
    val star = (2L to 9L).map(i => (i, 1L)).toDF("s", "d")
    val r = Graph.pageRank(star, "s", "d", iterations = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L) * 3)

    val ring = (0L until 6L).map(i => (i, (i + 1) % 6)).toDF("s", "d")
    val rr = Graph.pageRank(ring, "s", "d", iterations = 10)
      .select("r").as[Double].collect()
    rr.foreach(v => assert(math.abs(v - 1.0 / 6) < 1e-12))
  }

  test("pageRankUntil converges to a fixed point of pageRankFrom") {
    // α=0.5 → error halves per round: tol 1e-6 lands within ~20 rounds
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L)).toDF("s", "d")
    val fixed = Graph.pageRankUntil(edges, "s", "d", alpha = 0.5,
      tol = 1e-6, maxIter = 40)
    val stepped = Graph.pageRankFrom(edges, "s", "d", fixed, alpha = 0.5)
    val delta = stepped.withColumnRenamed("r", "r1")
      .join(fixed, Seq("id"))
      .agg(max(abs(col("r1") - col("r")))).head().getDouble(0)
    assert(delta < 1e-5)
  }

  test("degreeStats counts both directions, zero-filled") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("s", "d")
    val m = Graph.degreeStats(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(1L) === ((2L, 0L)))
    assert(m(2L) === ((1L, 1L)))
    assert(m(3L) === ((0L, 2L)))
  }
}
