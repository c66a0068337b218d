package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "the quick brown fox", "s1"),
    (2L, "the quick brown fux", "s1"), // dist 1 from 1
    (3L, "the quick brown foxes", "s1"), // dist 2 from 1, dist 3 from 2
    (4L, "completely different text here", "s1"),
    (5L, "the quick brown fox", "s2"), // same text, other block
  ).toDF("id", "txt", "blk")

  test("editSimilarityPairs finds all within-block pairs <= maxEdit, exactly once") {
    val pairs = Fuzzy.editSimilarityPairs(corpus, "id", "txt", "blk", maxEdit = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 2L)) === 1)
    assert(pairs((1L, 3L)) === 2)
    assert(!pairs.contains((2L, 3L))) // dist 3 > maxEdit
    assert(!pairs.contains((1L, 5L))) // different block
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L))
    assert(pairs.size === 2)
  }

  test("length banding never misses pairs at the band boundary") {
    // lengths straddling band edges for maxEdit=1 (bandWidth 2)
    val df = (0L until 40L).map { i =>
      (i, "a" * (3 + (i % 5).toInt), "b")
    }.toDF("id", "txt", "blk")
    val got = Fuzzy.editSimilarityPairs(df, "id", "txt", "blk", maxEdit = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference
    val rows = (0L until 40L).map(i => (i, "a" * (3 + (i % 5).toInt)))
    val want = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      if math.abs(ta.length - tb.length) <= 1
    } yield (ia, ib)).toSet // all-'a' strings: dist == length diff
    assert(got === want)
  }

  test("dropFuzzyDuplicates keeps one representative per cluster") {
    val kept = Fuzzy.dropFuzzyDuplicates(corpus, "id", "txt", "blk", maxEdit = 2)
      .select("id").as[Long].collect().sorted
    // cluster {1,2,3} -> keep 1; singletons 4 and 5 survive
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }
}
