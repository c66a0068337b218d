package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bit-identity pins for the fuzzy guarded-path kernels: candidate
  * bucketing ([[SubBandMinhashes]]) and the lowest-shared-subband dedup
  * rule ([[FirstEqualIndex]]) must reproduce their declarative forms
  * EXACTLY — the bucket layout decides which candidate pairs ever meet
  * the verifying DP, so any drift silently changes emitted pair sets.
  */
class FuzzyKernelsSpec extends SparkSpec {
  import spark.implicits._

  test("SubBandMinhashes == pmod(coalesce(array_min(transform(xxhash64)),0),b)") {
    val rnd = new scala.util.Random(99)
    val rows = (0 until 200).map { i =>
      val n = rnd.nextInt(40)
      (i.toLong, Seq.fill(n)(rnd.nextLong()),
        1L + rnd.nextInt(7)) // buckets 1..7
    } :+ ((200L, Seq.empty[Long], 3L)) // empty q-gram set → bucket 0
    val df = rows.toDF("id", "qg", "buckets")
    val subBands = 6
    val decl = transform(sequence(lit(0), lit(subBands - 1)), i =>
      pmod(coalesce(
        array_min(transform(col("qg"), g => xxhash64(g, i))),
        lit(0L)), col("buckets")))
    val fused = org.apache.spark.sql.GraftBridge.column(SubBandMinhashes(
      org.apache.spark.sql.GraftBridge.expression(col("qg")),
      org.apache.spark.sql.GraftBridge.expression(col("buckets")), subBands))
    val bad = df.select(fused.as("f"), decl.as("d"))
      .filter(not(col("f") <=> col("d"))).count()
    assert(bad === 0L)
  }

  test("SubBandMinhashes null-element fold matches xxhash64's (h unchanged)") {
    // unreachable from qgramsOf (non-null elements), but the declarative
    // form folds a null child as "hash unchanged", so a null element
    // contributes hashInt(i, 42) to the min — the kernel must agree
    val rnd = new scala.util.Random(5)
    val rows = (0 until 100).map { i =>
      val n = rnd.nextInt(12)
      val qg = Seq.fill(n)(
        if (rnd.nextInt(4) == 0) None else Some(rnd.nextLong()))
      (i.toLong, qg, 1L + rnd.nextInt(7))
    } :+ ((100L, Seq[Option[Long]](None, None), 5L)) // all-null elements
    val df = rows.toDF("id", "qg", "buckets")
    val subBands = 6
    val decl = transform(sequence(lit(0), lit(subBands - 1)), i =>
      pmod(coalesce(
        array_min(transform(col("qg"), g => xxhash64(g, i))),
        lit(0L)), col("buckets")))
    val fused = org.apache.spark.sql.GraftBridge.column(SubBandMinhashes(
      org.apache.spark.sql.GraftBridge.expression(col("qg")),
      org.apache.spark.sql.GraftBridge.expression(col("buckets")), subBands))
    val bad = df.select(fused.as("f"), decl.as("d"))
      .filter(not(col("f") <=> col("d"))).count()
    assert(bad === 0L)
  }

  test("FirstEqualIndex == array_position(zip_with(a,b,===), true)") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map { i =>
      val n = rnd.nextInt(8)
      val a = Seq.fill(n)(rnd.nextInt(4).toLong)
      // bias towards partial agreement
      val b = a.zipWithIndex.map { case (v, j) =>
        if (rnd.nextBoolean()) v else rnd.nextInt(4).toLong }
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val decl = array_position(
      zip_with(col("a"), col("b"), (x, y) => x === y), lit(true))
    val fused = org.apache.spark.sql.GraftBridge.column(FirstEqualIndex(
      org.apache.spark.sql.GraftBridge.expression(col("a")),
      org.apache.spark.sql.GraftBridge.expression(col("b"))))
    val bad = df.select(fused.cast("long").as("f"), decl.as("d"))
      .filter(not(col("f") <=> col("d"))).count()
    assert(bad === 0L)
  }

  test("editSimilarityPairs emits the same pairs with guarded blocks engaged") {
    // force the census guard on tiny data (maxBlockSize = 2): correctness
    // of the guarded path end to end, including planted true pairs
    val docs = Seq(
      (1L, "the quick brown fox", "s"),
      (2L, "the quick brown fax", "s"), // dist 1 from 1
      (3L, "the quick brown fox", "s"), // exact dup of 1
      (4L, "completely different", "s"),
      (5L, "the quick brawn fax", "s"), // dist 1 from 2, dist 2 from 1
      (6L, "unrelated text here", "s"),
    ).toDF("doc_id", "text", "source")
    val got = Fuzzy.editSimilarityPairs(docs, "doc_id", "text", "source",
        maxEdit = 2, maxBlockSize = 2, subBands = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got.contains((1L, 3L, 0)))
    assert(got.contains((1L, 2L, 1)))
    assert(got.contains((2L, 3L, 1)))
    assert(got.contains((2L, 5L, 1)))
    assert(got.contains((1L, 5L, 2)))
    assert(got.contains((3L, 5L, 2)))
    assert(!got.exists(p => p._1 == 4L || p._2 == 4L || p._1 == 6L || p._2 == 6L))
  }
}
