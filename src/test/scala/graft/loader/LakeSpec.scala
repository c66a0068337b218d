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

  test("aggregation on the bucket key is also exchange-free") {
    val agg = Lake.readTable(spark, "lake_left").groupBy("k").count()
    agg.count()
    assert(!Lake.hasExchange(agg))
  }
}
