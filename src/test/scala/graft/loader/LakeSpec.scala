package graft.loader

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LakeSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val left = spark.range(1000).select(col("id").as("k"),
      (col("id") * 2).as("a"))
    val right = spark.range(1000).select(col("id").as("k"),
      (col("id") * 3).as("b"))
    Lake.writeBucketed(left, "lake_left", Seq("k"), 4, sortCols = Seq("k"))
    Lake.writeBucketed(right, "lake_right", Seq("k"), 4, sortCols = Seq("k"))
    val l = Lake.readTable(spark, "lake_left")
    val r = Lake.readTable(spark, "lake_right")
    val joined = l.join(r, Seq("k"))
    assert(joined.count() === 1000)
    // both sides pre-hash-partitioned on disk → co-located join, no shuffle
    assert(!Lake.hasExchange(joined),
      "expected an exchange-free co-located join over bucketed tables")
    // the same sort-merge join over plain (unbucketed) data DOES shuffle
    // (hint past the broadcast planner: tiny sides would otherwise be
    // broadcast and hide the exchange)
    val plain = left.hint("merge").join(right.hint("merge"), Seq("k"))
    plain.count()
    assert(Lake.hasExchange(plain))
  }

  test("hasExchange sees materialized AQE query stages (executed plans)") {
    // after the probed df ITSELF executes, AQE replaces its exchanges
    // with ShuffleQueryStageExec LEAVES — the old child-walk returned a
    // false negative exactly on the executed plans the scaladoc asks
    // callers to probe (self-review round-13 catch)
    val left = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("a"))
    val right = spark.range(1000).select(col("id").as("k"), (col("id") * 3).as("b"))
    val shuffling = left.hint("merge").join(right.hint("merge"), Seq("k"))
    shuffling.collect() // executes THIS df's plan (not a derived count)
    assert(Lake.hasExchange(shuffling),
      "executed AQE plan with a shuffle must still report hasExchange")
  }

  test("writeZOrdered fails loudly on empty input (no opaque NPE)") {
    val empty = spark.range(0).select(col("id").as("x"), col("id").as("y"))
    val e = intercept[IllegalArgumentException] {
      Lake.writeZOrdered(empty,
        java.nio.file.Files.createTempDirectory("zempty").toString + "/out",
        Seq("x", "y"))
    }
    assert(e.getMessage.contains("no non-null values"))
  }

  test("aggregation on the bucket key is also exchange-free") {
    val agg = Lake.readTable(spark, "lake_left").groupBy("k").count()
    agg.count()
    assert(!Lake.hasExchange(agg))
  }

  test("zValue interleaves bits dimension-by-dimension") {
    // (x=5, y=3): x bits land at even positions (1 + 16), y at odd (2 + 8)
    val row = spark.range(1)
      .select(Lake.zValue(Seq(lit(5L), lit(3L)), 3).as("z"))
      .head()
    assert(row.getLong(0) === 27L)
    // single column degenerates to the identity
    val id = spark.range(100)
      .select(col("id"), Lake.zValue(Seq(col("id")), 7).as("z"))
      .filter(col("id") =!= col("z")).count()
    assert(id === 0L)
  }

  test("z-ordered layout keeps BOTH columns' per-file ranges narrow") {
    val dir = java.nio.file.Files.createTempDirectory("graft_z").toFile
    dir.deleteOnExit()
    val n = 128
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), floor(col("id") / n).cast("long").as("y"))
    val zPath = new java.io.File(dir, "zorder").getPath
    Lake.writeZOrdered(grid, zPath, Seq("x", "y"), bitsPerCol = 7,
      numFiles = 16)
    val xPath = new java.io.File(dir, "xsort").getPath
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)

    def filesHit(path: String, colName: String, lo: Long, hi: Long): Int = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
      files.count { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min(col(colName)), max(col(colName))).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo // [min,max] intersects
      }
    }
    // a y-range predicate: the x-sorted layout cannot prune at all (every
    // file spans all of y), the Z-curve confines it to a few block rows
    val zHitY = filesHit(zPath, "y", 8, 23)
    val xHitY = filesHit(xPath, "y", 8, 23)
    assert(xHitY === 16, s"x-sorted layout should span y everywhere: $xHitY")
    assert(zHitY <= 8, s"z-order should prune most files on y: $zHitY")
    // and the same layout ALSO prunes on x (the single-sort layout's own
    // strength) — narrow ranges on every curve dimension simultaneously
    assert(filesHit(zPath, "x", 8, 23) <= 8)
  }
}
