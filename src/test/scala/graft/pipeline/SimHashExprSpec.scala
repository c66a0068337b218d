package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bit-identity pin for [[SimHashFromTokensExpr]] against the
  * declarative `simhashFromHashes(tokenHashes(text), bits)` pipeline it
  * replaced, on both hash families. */
class SimHashExprSpec extends SparkSpec {
  import spark.implicits._

  private def declarative(text: Column, bits: Int, portable: Boolean): Column =
    transform(array(Dedup.tokenHashes(text, portable)), hs =>
      Dedup.simhashFromHashes(hs, bits)).getItem(0)

  private def fused(text: Column, bits: Int, portable: Boolean): Column =
    org.apache.spark.sql.GraftBridge.column(SimHashFromTokensExpr(
      org.apache.spark.sql.GraftBridge.expression(TextOps.tokens(text)),
      bits, portable))

  private val corpus: Seq[String] = Seq(
    "the quick brown fox jumps over the lazy dog",
    "one", "", null, "  leading and   multiple   spaces  ",
    "tabs\tand\nnewlines between tokens",
    "averyverylongtokenthatexceedseightcharacters and more",
    "héllo wörld tokens über prüfung", // 2-byte codepoints
    "日本語 トークン 検査", // 3-byte
    "emoji 🦊 tokens 🚀 here", // 4-byte
    ("word " * 80).trim,
  )

  test("fused simhash == declarative, both hash families and widths") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for ((bits, portable) <- Seq((64, false), (62, true))) {
      val rows = df.select(col("id"),
        fused(col("text"), bits, portable).as("f"),
        declarative(col("text"), bits, portable).as("d")).collect()
      rows.foreach { r =>
        assert(r.isNullAt(1) === r.isNullAt(2),
          s"null mismatch id=${r.getLong(0)} portable=$portable")
        if (!r.isNullAt(1))
          assert(r.getLong(1) === r.getLong(2),
            s"id=${r.getLong(0)} bits=$bits portable=$portable")
      }
    }
  }

  test("fused simhash matches on seeded random strings") {
    val rnd = new scala.util.Random(321)
    val alphabet = "ab cd🦊é日 .x"
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(120)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    for (portable <- Seq(false, true)) {
      val bits = if (portable) 62 else 64
      assert(df.select(fused(col("text"), bits, portable).as("f"),
        declarative(col("text"), bits, portable).as("d"))
        .filter(not(col("f") <=> col("d"))).count() === 0L, s"portable=$portable")
    }
  }
}
