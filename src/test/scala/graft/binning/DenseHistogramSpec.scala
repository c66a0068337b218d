package graft.binning

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DenseHistogramSpec extends SparkSpec {

  test("dense aggregate matches the sparse groupBy path exactly (1-D)") {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val ax = UniformAxis("value", 137, 0.0, 500.0)
    val dense = DenseHistogramAgg.denseHistogram(df, Seq(ax))
    val sparse = Binning.densify(Binning.histogram(df, Seq(ax)), Seq(ax))
    assert(dense.data.toSeq === sparse.data.toSeq)
    assert(dense.total === sparse.total)
  }

  test("dense aggregate matches sparse path on a 2-D cube across partitions") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .repartition(7) // force non-trivial partial-buffer merges
    val axes = Seq(
      UniformAxis("l_quantity", 25, 1.0, 50.0),
      UniformAxis("l_discount", 11, 0.0, 0.11))
    val dense = DenseHistogramAgg.denseHistogram(df, axes)
    val sparse = Binning.densify(Binning.histogram(df, axes), axes)
    assert(dense.data.toSeq === sparse.data.toSeq)
  }

  test("out-of-range events are excluded, matching kernel semantics") {
    import spark.implicits._
    val df = Seq(-100.0, 0.5, 1.5, 900.0).toDF("x")
    val ax = UniformAxis("x", 4, 0.0, 4.0)
    val dense = DenseHistogramAgg.denseHistogram(df, Seq(ax))
    assert(dense.total === 2)
  }
}
