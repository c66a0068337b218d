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
    val rowsGot = Fuzzy.editSimilarityPairs(df, "id", "txt", "blk", maxEdit = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = rowsGot.toSet
    // lowest-shared-band rule: each pair emitted exactly once, no distinct()
    assert(rowsGot.length === got.size, "duplicate pair rows")
    // brute-force reference
    val rows = (0L until 40L).map(i => (i, "a" * (3 + (i % 5).toInt)))
    val want = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      if math.abs(ta.length - tb.length) <= 1
    } yield (ia, ib)).toSet // all-'a' strings: dist == length diff
    assert(got === want)
  }

  test("q-gram prefilter is exact: random edits vs brute force") {
    // deterministic corpus: random-ish base strings + planted 0-3 edits
    val rnd = new scala.util.Random(42)
    def randStr(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    def edit(s: String, ops: Int): String = {
      var t = s
      (0 until ops).foreach { _ =>
        val p = if (t.isEmpty) 0 else rnd.nextInt(t.length)
        rnd.nextInt(3) match {
          case 0 if t.nonEmpty => t = t.take(p) + t.drop(p + 1) // delete
          case 1 => t = t.take(p) + ('a' + rnd.nextInt(6)).toChar + t.drop(p) // insert
          case _ if t.nonEmpty =>
            t = t.take(p) + ('a' + rnd.nextInt(6)).toChar + t.drop(p + 1) // subst
          case _ => ()
        }
      }
      t
    }
    val rows = (0 until 30).flatMap { i =>
      val base = randStr(12 + rnd.nextInt(10))
      Seq((i * 10L, base), (i * 10L + 1, edit(base, rnd.nextInt(4))))
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
      d = lev(ta, tb) if d <= 3
    } yield (ia, ib, d)).toSet
    val got = Fuzzy.editSimilarityPairs(
      rows.toDF("id", "txt").withColumn("blk", lit("all")),
      "id", "txt", "blk", maxEdit = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want)
  }

  test("degenerate blocks engage minhash sub-blocking without losing pairs") {
    // constant-length strings in ONE block: the length band is useless
    // (every row co-bands), so the census guard must engage — and the
    // planted distance-2 pairs (q-gram Jaccard ≈ 0.73 worst-case) must
    // all survive the recall-aware sub-split. Deterministic corpus, so
    // the equality below is a stable pin, not a flaky sample.
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val rows = (0 until 600).flatMap { i =>
      val base = randStr(40)
      if (i % 3 == 0) Seq((i * 10L, base), (i * 10L + 1, base.take(38) + "@@"))
      else Seq((i * 10L, base))
    }
    val df = rows.toDF("id", "txt").withColumn("blk", lit("all"))
    def run(cap: Long) =
      Fuzzy.editSimilarityPairs(df, "id", "txt", "blk", maxEdit = 2,
          maxBlockSize = cap)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val exact = run(Long.MaxValue) // guard disabled
    val guarded = run(64)          // every group far above the cap
    assert(exact.size === 200, s"planted pairs: ${exact.size}")
    assert(guarded === exact)
  }

  test("dropFuzzyDuplicates keeps one representative per cluster") {
    val kept = Fuzzy.dropFuzzyDuplicates(corpus, "id", "txt", "blk", maxEdit = 2)
      .select("id").as[Long].collect().sorted
    // cluster {1,2,3} -> keep 1; singletons 4 and 5 survive
    assert(kept.toSeq === Seq(1L, 4L, 5L))
  }
}
