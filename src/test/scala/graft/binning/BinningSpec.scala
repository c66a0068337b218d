package graft.binning

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors the reference's kernel tests (`tests/test_binning.py`): edge
  * inclusivity, rounding guard, center/edge conventions, mass conservation.
  */
class BinningSpec extends SparkSpec {
  import spark.implicits._

  private def hist1d(values: Seq[Double], ax: BinAxis): Map[Long, Long] =
    Binning
      .histogram(values.toDF(ax.column), Seq(ax))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap

  test("uniform: interior values land via floor((x-lo)*delta)") {
    // centers [0,10) over 10 bins → width 1, kernel edges [-0.5, 9.5)
    val ax = UniformAxis("x", 10, 0.0, 10.0)
    assert(ax.width === 1.0)
    assert(ax.edgeLo === -0.5)
    val h = hist1d(Seq(0.0, 0.4, 0.6, 1.0, 8.9, 9.4), ax)
    // 0.0, 0.4 → bin 0; 0.6, 1.0 → bin 1; 8.9, 9.4 → bin 9
    assert(h === Map(0L -> 2L, 1L -> 2L, 9L -> 2L))
  }

  test("uniform: right-most edge is inclusive (j==n folds to n-1)") {
    val ax = UniformAxis("x", 4, 0.0, 4.0) // kernel edges [-0.5, 3.5]
    val h = hist1d(Seq(3.5), ax) // exactly on the top edge
    assert(h === Map(3L -> 1L))
    assert(hist1d(Seq(3.5000001), ax).isEmpty) // just above → dropped
    assert(hist1d(Seq(-0.5), ax) === Map(0L -> 1L)) // bottom edge in bin 0
    assert(hist1d(Seq(-0.5000001), ax).isEmpty)
  }

  test("uniform: 1e-11 rounding guard strips FP error on edges") {
    // 0.1+0.2 = 0.30000000000000004; with delta=10 the raw product is
    // 3.0000000000000004 — the guard must land it in bin 3, not keep the
    // FP noise. (numba_bin.py:59)
    val ax = UniformAxis("x", 10, 0.05, 1.05) // edges [0.0, 1.0), width .1
    val h = hist1d(Seq(0.1 + 0.2), ax)
    assert(h === Map(3L -> 1L))
  }

  test("explicit edges: binsearch semantics incl. last-edge inclusivity") {
    val ax = EdgesAxis("x", Array(0.0, 1.0, 3.0, 7.0))
    val h = hist1d(Seq(0.0, 0.99, 1.0, 2.9, 3.0, 6.9, 7.0), ax)
    assert(h === Map(0L -> 2L, 1L -> 2L, 2L -> 3L)) // 7.0 folds into last bin
    assert(hist1d(Seq(-0.01, 7.01), ax).isEmpty)
  }

  test("BinSpec.normalize: the argument-normalization matrix") {
    // mirrors tests/test_binning.py:318-400 accepted forms
    // scalar int bins broadcast across axes
    val a1 = BinSpec.normalize(Seq("x", "y"), Seq(Left(10)),
      Seq((0.0, 1.0), (2.0, 4.0)))
    assert(a1.map(_.nBins) === Seq(10, 10))
    assert(a1.map(_.column) === Seq("x", "y"))
    // per-axis ints with ranges
    val a2 = BinSpec.normalize(Seq("x", "y"), Seq(Left(5), Left(7)),
      Seq((0.0, 1.0), (2.0, 4.0)))
    assert(a2.map(_.nBins) === Seq(5, 7))
    // explicit center arrays need no ranges
    val a3 = BinSpec.normalize(Seq("x"), Seq(Right(Array(1.0, 2.0, 3.0))), Nil)
    assert(a3.head.isInstanceOf[EdgesAxis])
    assert(a3.head.nBins === 3)
    // error cases: length mismatch, missing range, bad range order
    intercept[IllegalArgumentException] {
      BinSpec.normalize(Seq("x", "y"), Seq(Left(5), Left(7), Left(9)),
        Seq((0.0, 1.0), (2.0, 4.0)))
    }
    intercept[IllegalArgumentException] {
      BinSpec.normalize(Seq("x"), Seq(Left(5)), Nil)
    }
    intercept[IllegalArgumentException] { UniformAxis("x", 5, 1.0, 1.0) }
    intercept[IllegalArgumentException] { UniformAxis("x", 0, 0.0, 1.0) }
    intercept[IllegalArgumentException] {
      EdgesAxis("x", Array(1.0, 1.0, 2.0))
    }
  }

  test("centers/edges round trip (bin_centers_to_bin_edges)") {
    val centers = Array(1.0, 2.0, 3.0, 4.0)
    val edges = BinSpec.centersToEdges(centers)
    assert(edges.toSeq === Seq(0.5, 1.5, 2.5, 3.5, 4.5))
    assert(BinSpec.edgesToCenters(edges).toSeq === centers.toSeq)
  }

  test("mass conservation: sum(hist) == rows within range") {
    val df = spark.read
      .parquet("/root/testdata/sf0.001/events.parquet")
    val ax = UniformAxis("value", 37, 0.0, 500.0)
    val total = Binning
      .histogram(df, Seq(ax))
      .agg(sum("cnt"))
      .first()
      .getLong(0)
    val inRange = df
      .filter(col("value") >= ax.edgeLo && col("value") <= ax.edgeHi)
      .count()
    assert(total === inRange)
  }

  test("multi-d histogram matches independent 1-d marginals") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val axQ = UniformAxis("l_quantity", 7, 1.0, 50.0)
    val axD = UniformAxis("l_discount", 5, 0.0, 0.1)
    val h2 = Binning.histogram(df, Seq(axQ, axD))
    val marginalQ = h2
      .groupBy("bin_l_quantity")
      .agg(sum("cnt").as("cnt"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    // 1-d hist restricted to rows in-range on the *other* axis
    val h1 = Binning.histogram(
      df.filter(
        Binning.uniformBinIndex(col(axD.column), axD).isNotNull),
      Seq(axQ))
    val direct =
      h1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(marginalQ === direct)
  }

  test("densify produces the right dense cube and total") {
    val df = Seq((0.5, 0.5), (0.5, 1.5), (1.5, 1.5)).toDF("x", "y")
    val axes = Seq(
      EdgesAxis("x", Array(0.0, 1.0, 2.0)),
      EdgesAxis("y", Array(0.0, 1.0, 2.0)),
    )
    val cube = Binning.densify(Binning.histogram(df, axes), axes)
    assert(cube(0, 0) === 1L)
    assert(cube(0, 1) === 1L)
    assert(cube(1, 1) === 1L)
    assert(cube(1, 0) === 0L)
    assert(cube.total === 3L)
  }

  test("normalizeBy divides along the named axis") {
    val cube = BinnedCube(
      Seq("a", "b"),
      Seq(Array(0.0, 1.0), Array(0.0, 1.0, 2.0)),
      Array(2, 4, 6, 8, 10, 12),
      Seq(2, 3),
    )
    val out = cube.normalizeBy("b", Array(2.0, 4.0, 0.0))
    assert(out.toSeq === Seq(1.0, 1.0, 0.0, 4.0, 2.5, 0.0))
  }
}
