package graft.dfops

import graft.SparkSpec

class ResampleSpec extends SparkSpec {
  import spark.implicits._

  test("resampleSeries: LOCF fill on an aligned fixed grid") {
    val obs = Seq(
      (1L, 0L, 10.0, 1L), (1L, 25L, 20.0, 2L), (1L, 40L, 30.0, 3L),
      (2L, 5L, 1.0, 4L), (2L, 6L, 2.0, 5L),
    ).toDF("k", "t", "value", "seq")
    val out = DfOps.resampleSeries(obs, "t", "value", "seq", Seq("k"), stepOrd = 10L)
      .orderBy("k", "grid_ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // key 1: grid 0,10,20,30,40 — obs at 0,25,40
    assert(out.filter(_._1 == 1L).toSeq === Seq(
      (1L, 0L, 10.0), (1L, 10L, 10.0), (1L, 20L, 10.0),
      (1L, 30L, 20.0), (1L, 40L, 30.0)))
    // key 2: span 5..6 < step — single grid point at mn
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 5L, 1.0)))
  }

  test("duplicate observations at one instant collapse to the tie-max row") {
    val obs = Seq(
      (1L, 0L, 5.0, 1L), (1L, 0L, 7.0, 9L), // same t, seq 9 wins
      (1L, 10L, 1.0, 2L),
    ).toDF("k", "t", "value", "seq")
    val out = DfOps.resampleSeries(obs, "t", "value", "seq", Seq("k"), stepOrd = 10L)
      .orderBy("grid_ts").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0L, 7.0), (10L, 1.0)))
  }

  test("grid value at an exact observation instant sees that observation") {
    val obs = Seq((1L, 0L, 1.0, 1L), (1L, 10L, 2.0, 2L))
      .toDF("k", "t", "value", "seq")
    val out = DfOps.resampleSeries(obs, "t", "value", "seq", Seq("k"), stepOrd = 5L)
      .orderBy("grid_ts").collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0L, 1.0), (5L, 1.0), (10L, 2.0)))
  }
}
