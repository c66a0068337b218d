package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bit-identity pin for [[SortedShingleHashesExpr]] against the
  * declarative projection it replaced in [[Dedup.ngramJaccardPairs]]. */
class SortedShingleHashesExprSpec extends SparkSpec {
  import spark.implicits._

  private val corpus: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "aaaaaaaaaa", // one distinct shingle
    "ab", // shorter than n → empty array
    "", null,
    "héllo wörld, schöne Grüße", // 2-byte UTF-8
    "日本語のテキスト検査", // 3-byte
    "emoji 🦊🦊 mix 🚀", // 4-byte
    ("xy" * 200), // long, heavy duplication
  )

  private def check(n: Int): Unit = {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val decl = array_sort(array_distinct(
      transform(TextOps.charShingles(col("text"), n), s => xxhash64(s))))
    val fused = org.apache.spark.sql.GraftBridge.column(
      SortedShingleHashesExpr(
        org.apache.spark.sql.GraftBridge.expression(col("text")), n))
    val rows = df.select(col("id"), fused.as("f"), decl.as("d")).collect()
    rows.foreach { r =>
      assert(!r.isNullAt(1), "fused output must never be null")
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.getLong(0)} n=$n")
    }
  }

  test("fused == array_sort(array_distinct(transform(xxhash64))) across n") {
    check(1); check(3); check(5); check(9)
  }

  test("fused matches on seeded random strings") {
    val rnd = new scala.util.Random(1234)
    val alphabet = "abcde 🦊é日."
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(100)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val decl = array_sort(array_distinct(
      transform(TextOps.charShingles(col("text"), 3), s => xxhash64(s))))
    val fused = org.apache.spark.sql.GraftBridge.column(
      SortedShingleHashesExpr(
        org.apache.spark.sql.GraftBridge.expression(col("text")), 3))
    assert(df.select(fused.as("f"), decl.as("d"))
      .filter(not(col("f") <=> col("d"))).count() === 0L)
  }

  test("ngramJaccardPairs unchanged on a known corpus") {
    val docs = Seq(
      (0L, "the quick brown fox", "s"),
      (1L, "the quick brown fax", "s"),
      (2L, "something else entirely", "s"),
    ).toDF("doc_id", "text", "source")
    val got = Dedup.ngramJaccardPairs(docs, "text", "doc_id", col("source"), n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.rint(r.getDouble(2) * 1e6) / 1e6)).toSet
    // doc 0 vs 1: 17 distinct shingles each, 15 shared → 15/19
    assert(got.contains((0L, 1L, 0.789474)))
    assert(got.size === 3) // all pairs emitted at threshold 0
  }
}
