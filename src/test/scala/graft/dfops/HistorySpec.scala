package graft.dfops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def obs = Seq(
    // key 1: a -> a (no change) -> b -> a
    (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"), (1L, 40L, 4L, "a"),
    // key 2: single observation
    (2L, 15L, 5L, "x"),
    // key 3: null attr handled null-safely
    (3L, 10L, 6L, null.asInstanceOf[String]), (3L, 20L, 7L, null.asInstanceOf[String]),
    (3L, 30L, 8L, "y"),
  ).toDF("k", "t", "seq", "v")

  test("scd2 collapses unchanged runs and closes intervals") {
    val h = History.scd2(obs, Seq("k"), "t", Seq("v"), tieBreak = Seq("seq"))
      .orderBy("k", "valid_from")
      .select("k", "v", "valid_from", "valid_to", "is_current").collect()
    val k1 = h.filter(_.getLong(0) == 1L)
    assert(k1.map(r => (r.getString(1), r.getLong(2), Option(r.getAs[Any](3)),
      r.getBoolean(4))).toSeq === Seq(
      ("a", 10L, Some(30L), false),
      ("b", 30L, Some(40L), false),
      ("a", 40L, None, true)))
    val k2 = h.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2(0).getBoolean(4))
    // null run collapses to one row, then the change to "y"
    val k3 = h.filter(_.getLong(0) == 3L)
    assert(k3.length === 2)
    assert(k3(0).getString(1) === null && k3(1).getString(1) === "y")
  }

  test("scd2 plans exactly one exchange for both windows") {
    val h = History.scd2(obs, Seq("k"), "t", Seq("v"), tieBreak = Seq("seq"))
    val plan = h.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected 1 exchange, plan:\n$plan")
  }

  test("asOf returns the state valid at the probe time") {
    val h = History.scd2(obs, Seq("k"), "t", Seq("v"), tieBreak = Seq("seq"))
    val at35 = History.asOf(h, lit(35L)).filter(col("k") === 1)
      .select("v").as[String].collect()
    assert(at35.toSeq === Seq("b"))
    val at99 = History.asOf(h, lit(99L)).filter(col("k") === 1)
      .select("v").as[String].collect()
    assert(at99.toSeq === Seq("a")) // open current row
  }
}
