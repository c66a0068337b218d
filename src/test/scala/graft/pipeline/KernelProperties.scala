package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Randomized structural invariants for the round-6 native kernels
  * (hand-rolled generation — the scalatest/scalacheck bridge artifact is
  * not in the offline cache, same approach as BinningProperties).
  */
class KernelProperties extends SparkSpec {
  import spark.implicits._

  private def randVecs(seed: Long, n: Int, dim: Int,
      scale: Double = 5.0): Seq[(Long, Seq[Float])] = {
    val r = new scala.util.Random(seed)
    Seq.tabulate(n)(i =>
      (i.toLong, Seq.fill(dim)((r.nextGaussian() * scale).toFloat)))
  }

  test("cosine kernel == declarative fold across 10 random dims/corpora") {
    (1 to 10).foreach { c =>
      val dim = 1 + c * 3
      val df = randVecs(c, 40, dim).toDF("id", "a")
        .withColumn("b", reverse(col("a")))
      val bad = df.select(
        Dedup.cosine(col("a"), col("b")).as("n"),
        Dedup.cosineDeclarative(col("a"), col("b")).as("d"))
        .filter(col("n") =!= col("d")).count()
      assert(bad === 0L, s"case $c (dim $dim)")
    }
  }

  test("cosine range and self-similarity invariants hold") {
    val df = randVecs(99, 200, 16).toDF("id", "a")
      .withColumn("b", reverse(col("a")))
    val out = df.select(Dedup.cosine(col("a"), col("b")).as("c"),
      Dedup.cosine(col("a"), col("a")).as("self"))
    assert(out.filter(col("c") < -1.0000001 || col("c") > 1.0000001).count() === 0L)
    assert(out.filter(abs(col("self") - 1.0) > 1e-9).count() === 0L)
  }

  test("feature-buckets kernel == composed form across random corpora" +
      " and whitespace/unicode edge cases") {
    val r = new scala.util.Random(7)
    val alphabet = "abcdefghij αβγ日本語🌍xyz"
    def randText(): String = {
      val n = r.nextInt(12)
      (0 until n).map { _ =>
        val wordLen = 1 + r.nextInt(12)
        (0 until wordLen).map(_ => alphabet(r.nextInt(alphabet.length)))
          .mkString
      }.mkString(Seq(" ", "  ", "\t", " \t ")(r.nextInt(4)))
    }
    val edge = Seq("", " ", "  ", "\t", "a\t", "\ta", " a ", "a  b",
      "solo", "ab\ncd", "x", "exactly8", "ninechars", "🌍🌍🌍",
      "a 🌍 b", "x\r\ny")
    val texts = (edge ++ Seq.fill(400)(randText())).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    (Seq(1, 7, 64, 1 << 13)).foreach { b =>
      val bad = texts.toDF("id", "text").select(
        Dsir.featureBuckets(col("text"), b).as("n"),
        Dsir.featureBucketsComposed(col("text"), b).as("d"))
        .filter(not(col("n") <=> col("d"))).count()
      assert(bad === 0L, s"numBuckets=$b")
    }
  }

  test("lsh bucket kernel == declarative across random plane sets") {
    (1 to 6).foreach { c =>
      val dim = 4 + c * 5
      val planes = Similarity.hyperplanes(dim, 1 + c * 2, seed = c)
      val df = randVecs(c * 7L, 60, dim).toDF("id", "v")
      val bad = df.select(
        Similarity.lshBucket(col("v"), planes).as("n"),
        Similarity.lshBucketDeclarative(col("v"), planes).as("d"))
        .filter(col("n") =!= col("d")).count()
      assert(bad === 0L, s"case $c")
      // bucket ids stay within numBits bits
      val top = df.select(Similarity.lshBucket(col("v"), planes).as("n"))
        .filter(col("n") < 0 || col("n") >= (1L << (1 + c * 2))).count()
      assert(top === 0L, s"case $c bucket overflow")
    }
  }

  test("nearest-centroid kernel == literal tree across random k") {
    (1 to 6).foreach { c =>
      val dim = 3 + c * 2
      val r = new scala.util.Random(c * 13L)
      val cents = Array.fill(2 + c * 3, dim)(r.nextGaussian() * 4)
      val df = randVecs(c * 31L, 50, dim).toDF("id", "v")
      val bad = df.filter(
        KMeans.assign(df, "v", cents) =!=
          Similarity.ivfAssign(col("v"), cents)).count()
      assert(bad === 0L, s"case $c (k ${cents.length})")
    }
  }

  test("PNG codec round-trips random images across sizes") {
    val r = new scala.util.Random(5)
    (1 to 8).foreach { c =>
      val w = 1 + r.nextInt(40); val h = 1 + r.nextInt(30)
      val ch = Seq(1, 2, 3, 4)(r.nextInt(4))
      val img = PixelCodec.Image(w, h, ch,
        Array.fill(w * h * ch)(r.nextInt(256).toByte))
      val dec = PixelCodec.decodePng(PixelCodec.encodePng(img))
      assert(dec.pixels.toSeq === img.pixels.toSeq, s"case $c ($w×$h×$ch)")
    }
  }

  test("text kernels: hostile random input never throws, always deterministic") {
    val r = new scala.util.Random(0xC0FFEE)
    // bias toward the characters the parsers branch on
    val alphabet =
      "<>&;/=\"' \t\n abcdefgABCDEFG0123.!?#-[]()**__é́𝒳�".toCharArray
    def randStr(maxLen: Int): String = {
      val n = r.nextInt(maxLen)
      val sb = new StringBuilder(n)
      (0 until n).foreach(_ => sb.append(alphabet(r.nextInt(alphabet.length))))
      sb.toString
    }
    (1 to 300).foreach { i =>
      val s = randStr(200)
      def once(): Seq[Any] = Seq(
        Html.computeText(s), Html.computeMarkdown(s),
        Option(Html.computeTitle(s)).getOrElse(""),
        Html.computeLinks(s).toSeq, Html.computeTagTexts(s, "loc").toSeq,
        SentenceSplitExpr.split(s).toSeq, PorterStemExpr.stem(s),
        UnicodeNormalizeExpr.normalize(s, "NFKC"),
        Warc.parseAll(s.getBytes("UTF-8")).size)
      val a = once()
      assert(a === once(), s"nondeterministic on case $i: ${s.take(60)}")
      // extracted text introduces no markup that was not literally there
      val t = a.head.asInstanceOf[String]
      assert(t.length <= s.length + 8, s"growth on case $i") // entities only shrink
    }
  }

  test("sentence splitter partitions its input: no characters invented") {
    val r = new scala.util.Random(7)
    (1 to 100).foreach { i =>
      val words = Seq.fill(1 + r.nextInt(20))(
        Seq("Alpha", "beta.", "Dr.", "ok!", "x", "5.1")(r.nextInt(6)))
      val s = words.mkString(" ")
      val parts = SentenceSplitExpr.split(s)
      // every emitted sentence is a substring of the input
      parts.foreach(p => assert(s.contains(p), s"case $i: '$p' not in '$s'"))
      // and non-whitespace mass is conserved
      assert(parts.map(_.count(!_.isWhitespace)).sum ===
        s.count(!_.isWhitespace), s"case $i: '$s'")
    }
  }
}
