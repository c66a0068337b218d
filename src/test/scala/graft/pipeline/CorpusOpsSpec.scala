package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Round-3 corpus operators: deterministic sampling/rebalancing, TF-IDF,
  * per-group embedding centroids.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int) =
    (1 to n).map(i => (i.toLong, s"src${i % 5}")).toDF("id", "src")

  test("hashSample: deterministic, monotone in permille, roughly calibrated") {
    val df = docs(2000)
    val a = Sampling.hashSample(df, "id", 200).as[(Long, String)].collect().toSet
    val b = Sampling.hashSample(df, "id", 200).as[(Long, String)].collect().toSet
    assert(a === b) // reproducible from data alone
    val wider = Sampling.hashSample(df, "id", 400)
      .as[(Long, String)].collect().toSet
    assert(a.subsetOf(wider)) // growing the rate only ADDS rows
    assert(math.abs(a.size - 400) < 120) // ~20 % of 2000, hash-mixed
    assert(Sampling.hashSample(df, "id", 0).count() === 0)
    assert(Sampling.hashSample(df, "id", 1000).count() === 2000)
  }

  test("capPerGroup: keeps the lowest orderCol rows, at most max per group") {
    val out = Sampling.capPerGroup(docs(100), Seq("src"), "id", 3)
      .as[(Long, String)].collect()
    val byGroup = out.groupBy(_._2)
    assert(byGroup.keySet.size === 5)
    byGroup.foreach { case (src, rows) =>
      assert(rows.length === 3)
      // the three LOWEST ids of that group survive
      val all = (1 to 100).filter(i => s"src${i % 5}" == src).take(3).map(_.toLong)
      assert(rows.map(_._1).sorted.toSeq === all)
    }
  }

  test("stratifiedHashSample: per-stratum rates, unlisted strata dropped") {
    val df = docs(2000)
    val out = Sampling.stratifiedHashSample(df, "id", "src",
      Map("src0" -> 1000, "src1" -> 0, "src2" -> 500))
      .as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc.getOrElse("src1", 0) === 0)
    assert(bySrc("src0") === 400) // full stratum kept
    assert(!bySrc.contains("src3") && !bySrc.contains("src4"))
    assert(math.abs(bySrc("src2") - 200) < 80) // ~half of 400
  }

  test("tfidf: hand-computed smoothed scores on a tiny corpus") {
    val df = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextOps.tfidf(df, "text", "doc_id")
      .as[(Long, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // N=2; df: a->2, b->1, c->1; idf = ln((N+1)/(df+1)) + 1
    val idfA = math.log(3.0 / 3.0) + 1.0
    val idfB = math.log(3.0 / 2.0) + 1.0
    assert(out((1L, "a"))._1 === 2L)
    assert(math.abs(out((1L, "a"))._2 - 2.0 * idfA) < 1e-12)
    assert(math.abs(out((1L, "b"))._2 - idfB) < 1e-12)
    assert(math.abs(out((2L, "c"))._2 - idfB) < 1e-12)
    assert(out.size === 4) // (1,a) (1,b) (2,a) (2,c)
  }

  test("bm25: hand-computed scores on a tiny corpus") {
    // docs: 1 = "a b a" (len 3), 2 = "a c" (len 2); query = (a, c)
    // N = 2, avg len = 2.5; df: a -> 2, c -> 1
    val df = Seq((1L, "a b a"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextOps.bm25(df, "text", "doc_id", Seq("a", "c"))
      .as[(Long, Double)].collect().toMap
    val k1 = 1.2; val b = 0.75
    def idf(dfr: Int) = math.log(1.0 + (2 - dfr + 0.5) / (dfr + 0.5))
    def term(tf: Int, len: Int, dfr: Int) =
      idf(dfr) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len / 2.5))
    assert(math.abs(out(1L) - term(2, 3, 2)) < 1e-12)
    assert(math.abs(out(2L) - (term(1, 2, 2) + term(1, 2, 1))) < 1e-12)
    // a doc with no query term is absent, not zero
    val none = TextOps.bm25(df, "text", "doc_id", Seq("z"))
    assert(none.count() === 0L)
  }

  test("repetitionColumns: duplicate word / 2-gram fractions") {
    val df = Seq((1L, "a a b"), (2L, "x y"), (3L, "c c c")).toDF("doc_id", "text")
    val out = TextOps.repetitionColumns(df, "text")
      .select("doc_id", "dup_word_ratio", "dup_2gram_ratio")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) === ((0.333333, 0.0))) // "a a" "a b" distinct
    assert(out(2L) === ((0.0, 0.0)))
    assert(out(3L) === ((0.666667, 0.5))) // "c c" "c c"
  }

  test("topTokens: most frequent tokens with deterministic rank") {
    val df = Seq((1L, "b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextOps.topTokens(df, "text", 2)
      .as[(String, Long, Int)].collect().toSeq
    assert(out === Seq(("b", 3L, 1), ("a", 2L, 2)))
  }

  test("PositionalEqCount matches the composed zip_with form incl. nulls") {
    import org.apache.spark.sql.GraftBridge
    val df = Seq(
      (Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 9L, 3L)),
      (Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (Seq[java.lang.Long](), Seq[java.lang.Long](5L)),
    ).toDF("a", "b")
    val native = GraftBridge.column(PositionalEqCount(
      GraftBridge.expression(col("a")), GraftBridge.expression(col("b"))))
    val composed = size(filter(zip_with(col("a"), col("b"),
      (x, y) => x === y), m => m))
    val rows = df.select(native.as("n"), composed.as("c"))
      .as[(Int, Int)].collect()
    assert(rows.toSeq === Seq((2, 2), (2, 2), (0, 0)))
  }

  test("winnowingFingerprintPortable: bit-identical to the composed form") {
    val rnd = new scala.util.Random(3)
    val alphabet = "abcde XYZ.,é世😀" // incl. 2-char surrogate
    val texts = (1 to 60).map { _ =>
      val n = rnd.nextInt(40)
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    } ++ Seq("", "abcdefg", "aaaaaaaaaaaa", null)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    for ((k, w) <- Seq((7, 4), (3, 2), (5, 9))) {
      val rows = df.select(col("id"),
        TextOps.winnowingFingerprintPortable(col("t"), k, w).as("native"),
        TextOps.rollingHashFingerprint(col("t"), k, w,
          hasher = TextOps.polyHashFixed(_, k)).as("composed"))
        .as[(Long, Seq[Long], Seq[Long])].collect()
      rows.foreach { case (id, nat, comp) =>
        assert(nat === comp, s"id=$id k=$k w=$w")
      }
    }
  }

  test("unigramLogPerplexity: mean -ln corpus frequency per doc") {
    val df = Seq((1L, "a a a"), (2L, "b")).toDF("doc_id", "text")
    val out = TextOps.unigramLogPerplexity(df, "text", "doc_id")
      .as[(Long, Double)].collect().toMap
    // 4 tokens total; a appears 3x, b once
    assert(math.abs(out(1L) - (-math.log(3.0 / 4.0))) < 1e-6)
    assert(math.abs(out(2L) - (-math.log(1.0 / 4.0))) < 1e-6)
  }

  test("contaminationFraction: distinct n-gram overlap with the benchmark") {
    val df = Seq(
      (1L, "x y z w", "bench"), (2L, "x y z q", "train"), (3L, "p q", "train"),
    ).toDF("doc_id", "text", "source")
    val out = TextOps.contaminationFraction(df, "text", "doc_id",
      col("source") === "bench", n = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) === ((2L, 2L, 1.0))) // benchmark docs self-match fully
    assert(out(2L) === ((2L, 1L, 0.5))) // "x y z" shared, "y z q" not
    assert(out(3L) === ((0L, 0L, 0.0))) // too short for 3-grams
  }

  test("groupCentroids: component means per label") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f), 0), (2L, Seq(3.0f, 6.0f), 0),
      (3L, Seq(10.0f, 20.0f), 1),
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.groupCentroids(df, "embedding", Seq("label"))
      .as[(Int, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map((0, 0) -> 2.0, (0, 1) -> 4.0,
      (1, 0) -> 10.0, (1, 1) -> 20.0))
  }

  test("piiColumns: detects and redacts each class in priority order") {
    val docs = Seq(
      (1L, "mail alice.smith+x@corp.example.org or bob@ex.io today"),
      (2L, "visit https://ex.com/a?id=1234567 from 192.168.0.1 now"),
      (3L, "ssn 123-45-6789 tel 555-123-4567 or 555-0199"),
      (4L, "account 123456789 ref 42 short 12345"),
      (5L, "no pii here at all"),
    ).toDF("id", "text")
    val out = TextOps.piiColumns(docs, "text")
      .select("id", "pii_email", "pii_url", "pii_ipv4", "pii_ssn",
        "pii_phone", "pii_idnum", "pii_redacted")
      .collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1).getInt(1) === 2) // both emails
    assert(out(1).getString(7) === "mail <EMAIL> or <EMAIL> today")
    // the URL swallows its digits: no idnum counted on doc 2
    assert(out(2).getInt(2) === 1 && out(2).getInt(3) === 1)
    assert(out(2).getInt(6) === 0)
    assert(out(2).getString(7) === "visit <URL> from <IP> now")
    // SSN is not double-counted as a phone; both phone forms match
    assert(out(3).getInt(4) === 1 && out(3).getInt(5) === 2)
    assert(out(3).getString(7) === "ssn <SSN> tel <PHONE> or <PHONE>")
    // >=6-digit runs only
    assert(out(4).getInt(6) === 1)
    assert(out(4).getString(7) === "account <ID> ref 42 short 12345")
    assert(out(5).getString(7) === "no pii here at all")
    assert((1 to 6).forall(i => out(5).getInt(i) === 0))
  }

  test("bigramLogPerplexity matches hand-computed add-one smoothing") {
    val df = Seq((1L, "a b a"), (2L, "a b"), (3L, "x")).toDF("id", "text")
    val out = TextOps.bigramLogPerplexity(df, "text", "id")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // corpus: c(a)=3 c(b)=2 c(x)=1, V=3; c("a b")=2 c("b a")=1
    // doc1: avg(-ln(3/6), -ln(2/5)); doc2: -ln(3/6); doc3: no bigrams
    val d1 = (-math.log(3.0 / 6) - math.log(2.0 / 5)) / 2
    assert(out(1L)._1 === 2L)
    assert(math.abs(out(1L)._2 - math.rint(d1 * 1e6) / 1e6) < 1e-9)
    assert(out(2L)._1 === 1L)
    assert(math.abs(out(2L)._2 - math.rint(-math.log(0.5) * 1e6) / 1e6) < 1e-9)
    assert(out(3L) === ((0L, 0.0)))
  }

  test("gopherColumns: each rule independently fails the composite flag") {
    val good = "the cat sat with mat and dog ran far away today"   // 11 tokens
    val docs = Seq(
      (1L, good),
      (2L, "the cat"),                                   // too few tokens
      (3L, good.replace("cat", "## ... ### ...")),       // symbol ratio
      (4L, "cat sat mat dog ran far away red hot sun"),  // no required word
      (5L, ("the " * 10) + "cat sat"),                   // duplicate words
      (6L, good.split(" ").map(w => w + " 123 456").mkString(" ")), // alpha
    ).toDF("id", "text")
    val out = TextOps.gopherColumns(docs, "text", "id",
      minTokens = 5, minRequiredHits = 1, minAvgLen = 2.0)
      .select("id", "gopher_keep").as[(Long, Int)].collect().toMap
    assert(out(1L) === 1)
    assert((2L to 6L).forall(i => out(i) === 0), out.toString)
  }

  test("normalizeText collapses case/punct/whitespace variants to one key") {
    val df = Seq(
      (1L, "Hello,  World!"),
      (2L, "hello world"),
      (3L, "HELLO-WORLD..."),
      (4L, "hello worlds"),
    ).toDF("id", "text")
    val keys = df.select(col("id"), TextOps.normalizeText(col("text")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(keys(1) === "hello world")
    assert(keys(1) === keys(2) && keys(2) === keys(3))
    assert(keys(4) !== keys(1))
  }

  test("chunkTokens: windows tile the token stream; stride overlap exact") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val df = Seq((7L, text)).toDF("id", "text")
    // window 4, stride 3 -> starts 0,3,6,9 (floor(9/3)=3 -> 4 chunks)
    val out = TextOps.chunkTokens(df, "text", "id", window = 4, stride = 3)
      .orderBy("chunk_idx")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._3).toSeq === Seq(4L, 4L, 4L, 1L)) // last chunk short
    assert(out(0)._4 === "t1 t2 t3 t4")
    assert(out(1)._4 === "t4 t5 t6 t7") // 1-token overlap (stride < window)
    assert(out(3)._4 === "t10")
    // non-overlapping stride == window reconstructs the document exactly
    val whole = TextOps.chunkTokens(df, "text", "id", window = 4, stride = 4)
      .orderBy("chunk_idx").as[(Long, Long, Long, String)].collect()
    assert(whole.map(_._4).mkString(" ") === text)
    assert(whole.map(_._3).sum === 10L)
  }

  test("packSequences: contiguous concat-then-chunk assignment per group") {
    val df = (1 to 60)
      .map(i => (i.toLong, Seq.fill(i % 7 + 1)("w").mkString(" ")))
      .toDF("id", "text")
    val out = TextOps.packSequences(df, "text", "id", budget = 10L, numGroups = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(out.length === 60)
    out.foreach { case (_, grp, n, pack, off) =>
      assert(grp >= 0 && grp < 4)
      assert(off >= 0 && off < 10) // offset always inside the pack
      assert(pack >= 0 && n >= 1)
    }
    // within each group, docs in id order fill packs contiguously:
    // each doc starts exactly where the previous one ended
    out.groupBy(_._2).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      sorted.foreach { case (_, _, n, pack, off) =>
        assert(pack === cum / 10, s"pack mismatch at cum=$cum")
        assert(off === cum % 10, s"offset mismatch at cum=$cum")
        cum += n
      }
    }
  }

  test("BPE: classic corpus learns suffix merges; encode reconstructs text") {
    // Sennrich et al. toy corpus: low*5 lower*2 newest*6 widest*3
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, corpus)).toDF("id", "text")
    val merges = Bpe.learnMerges(df, "text", numMerges = 10)
    assert(merges.length === 10)
    // the most frequent pair in the corpus is (e,s) from newest+widest (9)
    assert(merges.head === (("e", "s")))
    assert(merges(1) === (("es", "t"))) // then (es,t) with the same 9
    val rank = Bpe.ranks(merges)
    // reconstruction: pieces concatenate back to the word + marker
    for (w <- Seq("low", "lower", "newest", "widest", "unseen"))
      assert(Bpe.encodeWord(w, rank).mkString === w + Bpe.EndOfWord)
    // a frequent word compresses to fewer pieces than its characters
    assert(Bpe.encodeWord("newest", rank).length < "newest".length + 1)
    // learning is deterministic
    assert(Bpe.learnMerges(df, "text", 10) === merges)
  }

  test("BPE expression matches the driver-side encode and counts tokens") {
    val train = Seq((1L, "the cat sat the cat ran the dog sat"))
      .toDF("id", "text")
    val merges = Bpe.learnMerges(train, "text", numMerges = 8)
    val rank = Bpe.ranks(merges)
    val docs = Seq(
      (1L, "the cat"), (2L, "a völkerball match"), (3L, ""),
    ).toDF("id", "text")
    val out = docs
      .withColumn("pieces", Bpe.bpeTokens(docs, "text", merges))
      // count from the bound pieces column: one broadcast, one encode
      .withColumn("n", Bpe.bpeTokenCount(col("pieces")))
      .select("id", "pieces", "n")
      .as[(Long, Seq[String], Int)].collect().map(r => r._1 -> r).toMap
    for ((id, text) <- Seq(1L -> "the cat", 2L -> "a völkerball match", 3L -> ""))
      assert(out(id)._2 === Bpe.encode(text, rank).toSeq, s"doc $id")
    assert(out(1L)._3 === out(1L)._2.length)
    assert(out(3L)._2 === Seq.empty)
  }

  test("BPE: a hostile megaword encodes in O(1) as one piece instead of" +
      " pinning the executor on the O(len^2) merge loop") {
    val rank = Bpe.ranks(Seq(("a", "a"), ("aa", "aa")))
    // 2M-char unbroken word: the uncapped greedy loop would run ~1M
    // rescans of ~2M pairs (~10^12 ops); the cap answers instantly
    val mega = "a" * 2000000
    val t0 = System.nanoTime()
    val pieces = Bpe.encodeWord(mega, rank)
    assert((System.nanoTime() - t0) / 1e9 < 5.0, "megaword encode too slow")
    assert(pieces === Array(mega + Bpe.EndOfWord))
    // the cap also guards learning: a sample carrying the megaword
    // learns from the normal words only, quickly
    val df = Seq((1L, s"low low low $mega newest newest")).toDF("id", "text")
    val t1 = System.nanoTime()
    val merges = Bpe.learnMerges(df, "text", numMerges = 4)
    assert((System.nanoTime() - t1) / 1e9 < 5.0, "megaword learning too slow")
    assert(merges.nonEmpty)
    assert(merges.forall { case (a, b) => !(a + b).contains("aaaa") ||
      (a + b).length <= 8 }) // merges come from the short words
    // words at/below the cap still merge normally
    assert(Bpe.encodeWord("aaaa", rank).length < 5)
  }

  test("packSequences budgets on BPE counts when given a subword counter") {
    val df = Seq((1L, "aa aa"), (2L, "aa bb"), (3L, "cc")).toDF("id", "text")
    val merges = Bpe.learnMerges(df, "text", numMerges = 4)
    val rank = Bpe.ranks(merges)
    val out = TextOps.packSequences(df, "text", "id", budget = 100L,
      numGroups = 1, countTokens = _ => Bpe.bpeTokenCount(df, "text", merges))
      .select("id", "n_tokens").as[(Long, Long)].collect().toMap
    val expected = Seq(1L -> "aa aa", 2L -> "aa bb", 3L -> "cc")
      .map { case (id, t) => id -> Bpe.encode(t, rank).length.toLong }.toMap
    assert(out === expected)
    // subword counts differ from whitespace counts, so the budget is real
    assert(out(3L) !== 1L)
  }

  test("writeTokenShards round-trips the corpus in trainer layout") {
    val df = (1 to 80)
      .map(i => (i.toLong, Seq.fill(i % 5 + 1)(s"w$i").mkString(" ")))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("shards").toFile.getPath
    TrainingExport.writeTokenShards(df, "text", "id", dir,
      budget = 16L, numGroups = 4)
    val back = TrainingExport.readTokenShards(spark, dir)
    // every document survives with its text and its pack assignment
    assert(back.count() === 80)
    val direct = TextOps.packSequences(df, "text", "id", 16L, 4)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    val rt = back.select("id", "pack_group", "pack_id", "pack_offset", "text")
      .as[(Long, Long, Long, Long, String)].collect()
    rt.foreach { case (id, grp, pack, off, text) =>
      assert(direct(id) === ((grp, pack, off)))
      assert(text === Seq.fill((id % 5 + 1).toInt)(s"w$id").mkString(" "))
    }
    // layout: one directory per hash group
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("pack_group=")).map(_.getName).sorted
    assert(dirs.length === rt.map(_._2).distinct.length)
  }

  test("writeTokenShardsTfRecord: trainer-ordered Example shards match" +
      " the pack assignment") {
    import org.apache.spark.sql.types._
    val df = (1 to 60)
      .map(i => (i.toLong, Seq.fill(i % 4 + 1)(s"t$i").mkString(" ")))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("tfshards")
      .toFile.getPath + "/lake"
    val n = TrainingExport.writeTokenShardsTfRecord(df, "text", "id", dir,
      budget = 12L, numGroups = 3, compression = "GZIP")
    assert(n === 60L)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField("pack_group", LongType), StructField("pack_id", LongType),
      StructField("pack_offset", LongType)))
    val back = TfRecord.readExamples(spark, dir, schema)
      .as[(Long, String, Long, Long, Long)].collect()
    assert(back.length === 60)
    val direct = TextOps.packSequences(df, "text", "id", 12L, 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._4, r._5))).toMap
    back.foreach { case (id, text, grp, pack, off) =>
      assert(direct(id) === ((grp, pack, off)), s"id $id")
      assert(text === Seq.fill((id % 4 + 1).toInt)(s"t$id").mkString(" "))
    }
    // within each shard, records arrive grouped by pack_group in
    // (pack_id, pack_offset) order — the trainer streams sequentially
    // (groups HASH onto shards, so one shard may hold several groups)
    val byShard = TfRecord.readRecords(spark, dir)
      .collect().groupBy(_.getString(0))
    byShard.values.foreach { rows =>
      val order = rows.map { r =>
        val f = TfRecord.decodeExample(r.getAs[Array[Byte]](1))
        def i64(k: String) =
          f(k).asInstanceOf[TfRecord.Int64Feature].values.head
        (i64("pack_group"), i64("pack_id"), i64("pack_offset"))
      }
      assert(order.toSeq === order.sortBy(identity).toSeq)
    }
  }

  test("writeJsonl round-trips the corpus with exact shard count") {
    val df = (1 to 200)
      .map(i => (i.toLong, s"text $i with unicode α🌍 and \"quotes\"",
        if (i % 4 == 0) null else s"src${i % 3}"))
      .toDF("id", "text", "src")
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toFile.getPath
    TrainingExport.writeJsonl(df, "id", dir, numShards = 5)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(files.length === 5) // one gzipped part per shard
    val back = TrainingExport.readJsonl(spark, dir, Some(df.schema))
    assert(back.count() === 200)
    val got = back.as[(Long, String, String)].collect().sortBy(_._1)
    val exp = df.as[(Long, String, String)].collect().sortBy(_._1)
    assert(got.toSeq === exp.toSeq) // unicode, quotes, nulls survive
    // schema-less read infers the same columns (small data only)
    assert(TrainingExport.readJsonl(spark, dir).columns.sorted.toSeq ===
      Seq("id", "src", "text"))
  }

  test("mixtureReport: shares sum to 1 and counts match a direct agg") {
    val df = Seq(
      ("a", "one two three"), ("a", "four five"),
      ("b", "six"), ("c", "seven eight nine ten"),
    ).toDF("src", "text")
    val out = Sampling.mixtureReport(df, "text", Seq("src"))
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq("a", "b", "c"))
    assert(out.map(_._2).toSeq === Seq(2L, 1L, 1L))
    assert(out.map(_._3).toSeq === Seq(5L, 1L, 4L))
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-6)
    assert(out.find(_._1 == "b").get._4 === 0.1)
  }

  test("weightedHashSample: reproducible, k per group, weight-monotone") {
    val df = (1 to 2000).map { i =>
      // weights: ids ≤ 100 get weight 1000, the rest weight 1
      (i.toLong, s"g${i % 2}", if (i <= 100) 1000.0 else 1.0)
    }.toDF("id", "grp", "w")
    val s1 = Sampling.weightedHashSample(df, "id", "w", Seq("grp"), 20)
      .select("id").as[Long].collect().sorted.toSeq
    val s2 = Sampling.weightedHashSample(df, "id", "w", Seq("grp"), 20)
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1 === s2)                 // deterministic
    assert(s1.length === 40)          // 20 per group
    // heavy-weight ids (5 % of rows, 1000× weight) should dominate the
    // sample: u^(1/1000) ≈ 1 for any u, u^1 = u for the tail
    assert(s1.count(_ <= 100) >= 30, s"heavy ids in sample: ${s1.count(_ <= 100)}")
  }

  test("weightedHashSample: non-positive weights fill shortfall only, no ANSI error") {
    val df = Seq(
      (1L, "g", 2.0), (2L, "g", 0.0), (3L, "g", -1.0), (4L, "g", 5.0),
    ).toDF("id", "grp", "w")
    // k=3 but only two positively-weighted rows: they must come first,
    // one zero/negative-weight row fills the shortfall, and the zero
    // weight must NOT raise Spark 4's ANSI divide-by-zero
    val got = Sampling.weightedHashSample(df, "id", "w", Seq("grp"), 3)
      .select("id").as[Long].collect().toSet
    assert(got.size === 3)
    assert(Set(1L, 4L).subsetOf(got))
  }

  test("curate: stages chain in order and the funnel reports each cut") {
    // 53 tokens, all distinct, required words present, avg len in range
    def goodText(prefix: String) =
      (TextOps.GopherRequiredWords ++
        (1 to 45).map(i => f"$prefix$i%02d")).mkString(" ")
    val corpus = Seq(
      (1L, goodText("word"), "en"),
      (2L, goodText("item"), "en"),
      (3L, goodText("word"), "en"), // exact duplicate of doc 1
      (4L, goodText("unit"), "xx"), // language-filtered
      (5L, "the cat", "en"),        // gopher-filtered (too short)
      (6L, goodText("word").replace("word07", "swapped"), "en"), // near-dup of 1
    ).toDF("doc_id", "text", "lang")
    val cfg = Curation.CurationConfig(
      keepLanguages = Set("en"),
      nearDupThreshold = Some(0.6),
      splits = Seq("train" -> 500, "val" -> 500))
    val (out, funnel) = Curation.curate(
      corpus, "doc_id", "text", "lang", "lang", cfg, report = true)
    assert(funnel === Seq(
      "input" -> 6L, "language" -> 5L, "gopher" -> 4L,
      "exact_dedup" -> 3L, "near_dedup" -> 2L, "split" -> 2L))
    val rows = out.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(rows.keySet === Set(1L, 2L)) // lowest id survives each cluster
    assert(rows.values.forall(s => s == "train" || s == "val"))
    // determinism: the curated corpus is a pure function of (input, cfg)
    val (again, _) = Curation.curate(
      corpus, "doc_id", "text", "lang", "lang", cfg)
    assert(again.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("curate: encoding gate, sentence censor and temperature stages") {
    // two domains, 4:1; a shared banner sentence; one mojibake doc
    def body(i: Int) = s"Unique sentence number $i stays around. " +
      "Subscribe to our banner now."
    val corpus = ((1 to 8).map(i => (i.toLong, body(i), "big")) ++
      Seq((9L, body(9), "small"),
        (10L, "broken Ã© mojibake doc here", "big")))
      .toDF("doc_id", "text", "domain")
    val cfg = Curation.CurationConfig(
      requireCleanEncoding = true,
      gopher = false,
      sentenceCensor = true,
      temperatureAlpha = Some(0.0))
    val (out, funnel) = Curation.curate(
      corpus, "doc_id", "text", "domain", "domain", cfg, report = true)
    val f = funnel.toMap
    assert(f("encoding") === 9L) // mojibake doc gated
    assert(f("sentence_censor") === 9L) // rewrites, never drops docs
    // α=0 equalization: the 1-doc 'small' domain binds -> 'small' kept
    // fully, 'big' downsampled toward 1
    val kept = out.select("doc_id", "domain", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(kept.exists(_._2 == "small"))
    assert(kept.count(_._2 == "big") < 8)
    // banner sentence censored everywhere, unique sentence intact
    kept.foreach { case (id, _, t) =>
      assert(t === s"Unique sentence number $id stays around.", t)
    }
  }

  test("curate: fully-boilerplate and empty docs survive the sentence" +
      " censor with '' text") {
    // docs 1/2 are ONLY the shared banner; doc 3 is empty; doc 4 has a
    // unique sentence — none may vanish from the corpus
    val banner = "Subscribe to our banner now."
    val corpus = Seq(
      (1L, banner, "en"), (2L, banner, "en"), (3L, "", "en"),
      (4L, s"Something unique stays here. $banner", "en"),
    ).toDF("doc_id", "text", "lang")
    val cfg = Curation.CurationConfig(gopher = false, dropExact = false,
      sentenceCensor = true)
    val (out, funnel) = Curation.curate(
      corpus, "doc_id", "text", "lang", "lang", cfg, report = true)
    assert(funnel.toMap.apply("sentence_censor") === 4L)
    val byId = out.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(byId.keySet === Set(1L, 2L, 3L, 4L))
    assert(byId(1L) === "" && byId(2L) === "" && byId(3L) === "")
    assert(byId(4L) === "Something unique stays here.")
  }

  test("curate: line cleaning rewrites texts before doc heuristics and" +
      " drops all-boilerplate docs") {
    val corpus = Seq(
      (1L, "A good first sentence here.\njs junk\nAnother keeper line stays.", "en"),
      (2L, "only\nshort\nfragments", "en"), // every line fails -> doc drops
    ).toDF("doc_id", "text", "lang")
    val cfg = Curation.CurationConfig(
      lineClean = Some(Curation.LineCleanConfig(minWords = 3,
        requirePunct = true)),
      gopher = false, dropExact = false)
    val (out, funnel) = Curation.curate(
      corpus, "doc_id", "text", "lang", "lang", cfg, report = true)
    assert(funnel === Seq("input" -> 2L, "line_clean" -> 1L))
    val kept = out.as[(Long, String, String)].collect()
    assert(kept.map(_._1).toSeq === Seq(1L))
    assert(kept.head._2 ===
      "A good first sentence here.\nAnother keeper line stays.")
  }

  test("curate: optional DSIR stage selects target-like docs on the" +
      " cleaned corpus") {
    val corpus = ((1 to 60).map(i =>
      (i.toLong, "careful encyclopedia prose about science", "en")) ++
      (61 to 120).map(i =>
        (i.toLong, "free casino bonus click winner prize", "en")))
      .toDF("doc_id", "text", "lang")
    val cfg = Curation.CurationConfig(
      gopher = false, dropExact = false, // keep both modes intact
      dsirTargetExpr = Some("doc_id <= 60"), dsirKeepN = Some(40),
      dsirBuckets = 64)
    val (out, funnel) = Curation.curate(
      corpus, "doc_id", "text", "lang", "lang", cfg, report = true)
    assert(funnel === Seq("input" -> 120L, "dsir" -> 40L))
    val kept = out.select("doc_id").as[Long].collect()
    assert(kept.length === 40)
    assert(kept.count(_ <= 60) > 36) // near-all target-like
    assert(out.columns.contains("dsir_logw"))
    // config validation: target and size must travel together
    intercept[IllegalArgumentException] {
      Curation.CurationConfig(dsirTargetExpr = Some("lang = 'en'"))
    }
  }

  test("assignSplit: calibrated ranges, growth-stable, holdout null") {
    val df = docs(4000)
    val splits = Seq("train" -> 800, "val" -> 100, "test" -> 50)
    val out = Sampling.assignSplit(df, "id", splits)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    // 5 % of buckets (950..999) fall past the last range -> NULL
    assert(out.keySet === Set("train", "val", "test", null))
    assert(math.abs(out("train") - 3200L) < 200, out.toString)
    assert(math.abs(out("val") - 400L) < 100, out.toString)
    // a row's split never changes when the corpus grows
    val small = Sampling.assignSplit(docs(1000), "id", splits)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    val big = Sampling.assignSplit(df, "id", splits)
      .as[(Long, String, String)].collect().map(r => r._1 -> r._3).toMap
    assert(small.forall { case (id, s) => big(id) == s })
    // widths over 1000 per-mille are rejected
    intercept[IllegalArgumentException] {
      Sampling.assignSplit(df, "id", Seq("a" -> 800, "b" -> 300))
    }
  }

  test("resampleToMixture: exact target mix, deterministic, unlisted domain drops") {
    val df = ((1 to 1500).map(i => (i.toLong, "a")) ++
      (1 to 1000).map(i => (5000L + i, "b")) ++
      (1 to 500).map(i => (9000L + i, "c")) ++
      (1 to 300).map(i => (12000L + i, "d"))).toDF("id", "dom")
    val target = Map("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val out = Sampling.resampleToMixture(df, "id", "dom", target)
    val counts = out.groupBy("dom").count()
      .as[(String, Long)].collect().toMap
    // N = floor(min(1500/.5, 1000/.3, 500/.2)) = 2500; "c" is the binding
    // domain (rate exactly 1.0) so it survives in full; a/b are binomial
    // around share·N
    assert(!counts.contains("d"))
    assert(counts("c") === 500L)
    assert(math.abs(counts("a") - 1250L) < 80, s"a=${counts("a")}")
    assert(math.abs(counts("b") - 750L) < 80, s"b=${counts("b")}")
    val again = Sampling.resampleToMixture(df, "id", "dom", target)
      .select("id").as[Long].collect().toSet
    assert(again === out.select("id").as[Long].collect().toSet)
  }

  test("duplicatePassages: cross-doc passage found; exposure ranks boilerplate") {
    val boiler =
      "This license text is identical across documents and long enough."
    val corpus = Seq(
      (1L, s"alpha bravo unique content one. $boiler"),
      (2L, s"$boiler Totally different tail content two."),
      (3L, "qqqq zzzz jjjj xxxx vvvv wwww kkkk yyyy qqqq zzzz jjjj xxxx"),
    ).toDF("doc_id", "text")
    val dup = Dedup.duplicatePassages(corpus, "doc_id", "text")
      .as[(Long, Long)].collect()
    assert(dup.nonEmpty)
    assert(dup.forall(_._2 >= 2L))
    val exp = Dedup.duplicatePassageExposure(corpus, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the shared license passage dominates docs 1/2; doc 3's alphabet is
    // disjoint from both, so none of its fingerprints repeat
    assert(exp(1L) > 0.0 && exp(2L) > 0.0)
    assert(exp(3L) === 0.0)
  }

  test("mixtureRollup: subtotal rows at every level, grouping_id-tagged") {
    val df = Seq(
      ("a", "en", 10L), ("a", "en", 20L), ("a", "de", 5L),
      ("b", "en", 7L),
    ).toDF("src", "lang", "w")
    val out = Sampling.mixtureRollup(df, Seq("src", "lang"), col("w"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1))) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // leaf rows: gid 0
    assert(out((Some("a"), Some("en"))) === ((0L, 2L, 30L)))
    assert(out((Some("a"), Some("de"))) === ((0L, 1L, 5L)))
    assert(out((Some("b"), Some("en"))) === ((0L, 1L, 7L)))
    // per-src subtotals: lang rolled up → gid 1
    assert(out((Some("a"), None)) === ((1L, 3L, 35L)))
    assert(out((Some("b"), None)) === ((1L, 1L, 7L)))
    // grand total: gid 3
    assert(out((None, None)) === ((3L, 4L, 42L)))
    assert(out.size === 6)
  }

  test("stratifiedHashSample: listed strata sampled at their rate, rest drop") {
    val df = (1 to 4000).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    val out = Sampling.stratifiedHashSample(df, "id", "src",
      Map("s0" -> 1000, "s1" -> 500, "s3" -> 0))
      .as[(Long, String)].collect()
    val bySrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc.getOrElse("s2", 0) === 0) // unlisted stratum drops
    assert(bySrc.getOrElse("s3", 0) === 0) // zero-rate stratum drops
    assert(bySrc("s0") === 1000)           // full rate keeps everything
    assert(math.abs(bySrc("s1") - 500) < 150) // ~50 % of 1000
  }

  test("upsampleEpochs: integer exact, fractional in expectation, 0 drops," +
      " unlisted passes through") {
    val df = (1 to 1000).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "src")
    val out = Sampling.upsampleEpochs(df, "id", "src",
      Map("s0" -> 2.0, "s1" -> 0.5, "s2" -> 0.0))
    val bySrc = out.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc("s0") === 500L) // 250 × 2 exactly, no coin involved
    assert(math.abs(bySrc("s1") - 125L) < 60) // 250 × 0.5 in expectation
    assert(!bySrc.contains("s2")) // zero epochs drops the group
    assert(bySrc("s3") === 250L) // unlisted: one copy
    // integer-part copies are indexed 0..k-1 per source row
    val s0 = out.filter(col("src") === "s0")
      .groupBy("id").agg(sort_array(collect_list("epoch_copy")).as("c"))
      .as[(Long, Seq[Int])].collect()
    assert(s0.length === 250)
    s0.foreach { case (_, c) => assert(c === Seq(0, 1)) }
    // reproducible from data alone
    val again = Sampling.upsampleEpochs(df, "id", "src",
      Map("s0" -> 2.0, "s1" -> 0.5, "s2" -> 0.0))
      .select("id", "src", "epoch_copy").collect().toSet
    assert(again === out.select("id", "src", "epoch_copy").collect().toSet)
  }

  test("upsampleEpochs: fractional coin is per-row deterministic and" +
      " growth-stable") {
    val df = (1 to 500).map(i => (i.toLong, "w")).toDF("id", "src")
    val kept = Sampling.upsampleEpochs(df, "id", "src", Map("w" -> 1.5))
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    // every row kept at least once; extra copy on ~half
    assert(kept.size === 500)
    assert(kept.values.forall(c => c == 1L || c == 2L))
    val doubled = kept.count(_._2 == 2L)
    assert(math.abs(doubled - 250) < 80)
    // growing the corpus never changes an existing row's copy count
    val grown = (1 to 800).map(i => (i.toLong, "w")).toDF("id", "src")
    val kept2 = Sampling.upsampleEpochs(grown, "id", "src", Map("w" -> 1.5))
      .filter(col("id") <= 500)
      .groupBy("id").count().as[(Long, Long)].collect().toMap
    assert(kept2 === kept)
  }

  test("withSequentialIds: contiguous 0-based ids in key order, distributed") {
    val n = 5000
    // scrambled input order + a carried payload column
    val df = spark.range(n.toLong)
      .select((col("id") * 2654435761L % n).as("k"), col("id").as("payload"))
      .repartition(8)
    val out = Sampling.withSequentialIds(df, Seq("k"), numPartitions = 8)
    assert(out.rdd.getNumPartitions === 8) // not a single-partition window
    val rows = out.select("k", "seq_id", "payload").collect()
    assert(rows.length === df.distinct().count().toInt)
    // ids are exactly 0..m-1 and increase with k
    val byId = rows.sortBy(_.getLong(1))
    assert(byId.map(_.getLong(1)).toSeq === (0L until byId.length).toSeq)
    assert(byId.map(_.getLong(0)).toSeq === byId.map(_.getLong(0)).sortBy(identity).toSeq)
    // payload survives untouched
    assert(rows.map(r => r.getLong(0) -> r.getLong(2)).toMap.size === byId.length)
  }

  test("mergeSnapshot: upserts replace/insert, deletes drop, bulk untouched") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val ups = Seq((2L, "B2"), (4L, "d")).toDF("id", "text")
    val dels = Seq(Tuple1(3L)).toDF("id")
    val out = Curation.mergeSnapshot(base, ups, dels, "id")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "a", 2L -> "B2", 4L -> "d"))
    // empty change sets are the identity
    val idem = Curation.mergeSnapshot(base, ups.limit(0), dels.limit(0), "id")
      .as[(Long, String)].collect().toMap
    assert(idem === Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("topPercentByGroup: per-group ceil(frac*n) best rows, deterministic") {
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 3}", (i * 7 % 50).toLong))
      .toDF("id", "g", "score")
    val kept = Sampling.topPercentByGroup(df, "score", "id", Seq("g"), 0.3)
    val byGroup = kept.groupBy("g").count().as[(String, Long)].collect().toMap
    val sizes = df.groupBy("g").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (g, n) =>
      assert(byGroup(g) === math.ceil(n * 0.3).toLong, s"group $g")
    }
    // every kept row's score >= every dropped row's score within its group
    // (up to the deterministic id tie-break)
    val dropped = df.join(kept, Seq("id"), "left_anti")
    val minKept = kept.groupBy("g").agg(min("score")).as[(String, Long)]
      .collect().toMap
    dropped.select("g", "score").as[(String, Long)].collect().foreach {
      case (g, s) => assert(s <= minKept(g), s"dropped score $s above cut in $g")
    }
    // frac = 1 keeps everything
    assert(Sampling.topPercentByGroup(df, "score", "id", Seq("g"), 1.0)
      .count() === 100)
  }

  test("profileColumns: one row per column with exact stats") {
    val df = Seq(
      (1L, Some("a")), (2L, Some("b")), (3L, None), (4L, Some("a")),
    ).toDF("id", "s")
    val prof = graft.dfops.DfOps.profileColumns(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(prof("id") === ((4L, 0L, 4L, "1", "4")))
    assert(prof("s") === ((4L, 1L, 2L, "a", "b")))
  }

  test("hashedEmbedding: unit norm; semDedup clusters near-dup TEXT end-to-end") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
      (3L, "completely different subject matter entirely unrelated words"),
      (4L, "completely different subject matter entirely unrelated words here"), // near-dup of 3
    ).toDF("id", "text")
    val emb = docs.select(col("id"),
      TextOps.hashedEmbedding(col("text"), 64).as("v"))
    // unit L2 norm
    val norms = emb.select(aggregate(col("v"), lit(0.0),
      (a, x) => a + x * x).as("n2")).as[Double].collect()
    norms.foreach(n2 => assert(math.abs(n2 - 1.0) < 1e-9, s"norm² $n2"))
    // cosine of the planted near-dup pairs is high, cross pairs low
    val vecs = emb.as[(Long, Seq[Double])].collect().toMap
    def cos(a: Seq[Double], b: Seq[Double]) = a.zip(b).map { case (x, y) => x * y }.sum
    assert(cos(vecs(1L), vecs(2L)) > 0.8)
    assert(cos(vecs(3L), vecs(4L)) > 0.8)
    assert(cos(vecs(1L), vecs(3L)) < 0.5)
    // end to end: semantic dedup on raw text keeps one doc per near-dup
    // cluster (floats for the embedding column contract)
    val embF = docs.select(col("id"),
      transform(TextOps.hashedEmbedding(col("text"), 64),
        x => x.cast("float")).as("v"))
    val seeds = Array(vecs(1L).toArray, vecs(3L).toArray)
    val kept = Dedup.semDedup(embF, "v", "id", seeds, 0.8)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L), s"kept $kept")
  }

  test("quantizeInt8: codes in range, round-trip error within half a step") {
    val vecs = Seq(
      (1L, Array(0.1f, -2.5f, 3.75f, 0.0f)),
      (2L, Array(7.0f, 7.0f, 7.0f, 7.0f)), // flat vector: scale guard
      (3L, Array(-1e-3f, 1e-3f, 5e-4f, -5e-4f)),
    ).toDF("id", "v")
    val q = vecs.select(col("id"), col("v"),
      Similarity.quantizeInt8(col("v")).as("q"))
    val codes = q.select(col("id"), col("q.codes"), col("q.scale")).collect()
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.forall(c => c >= 0 && c <= 255), s"codes out of range: $cs")
    }
    val err = q.select(col("id"), col("q.scale").as("s"),
        zip_with(col("v"), Similarity.dequantizeInt8(col("q")),
          (a, b) => abs(a.cast("double") - b)).as("e"))
      .select(col("s"), aggregate(col("e"), lit(0.0),
        (acc, x) => greatest(acc, x)).as("maxErr"))
      .collect()
    err.foreach { r =>
      val halfStep = r.getDouble(0) / 2 + 1e-12
      assert(r.getDouble(1) <= halfStep,
        s"round-trip error ${r.getDouble(1)} exceeds half step $halfStep")
    }
    // the flat vector reconstructs exactly
    val flat = q.filter(col("id") === 2)
      .select(Similarity.dequantizeInt8(col("q"))).head().getSeq[Double](0)
    assert(flat.forall(_ === 7.0))
  }

  test("shuffleDeterministic: contiguous, reproducible, epoch-varying") {
    import spark.implicits._
    val df = (0L until 500L).toDF("id")
    def order(salt: String): Seq[Long] =
      Sampling.shuffleDeterministic(df, "id", salt, numPartitions = 8)
        .orderBy("shuffle_pos").select("id").as[Long].collect().toSeq
    val e1 = order("ep1")
    // contiguous 0-based positions over all rows
    val pos = Sampling.shuffleDeterministic(df, "id", "ep1", numPartitions = 8)
      .select("shuffle_pos").as[Long].collect().sorted
    assert(pos.toSeq === (0L until 500L))
    // same salt -> identical order (re-run, different partitioning)
    assert(order("ep1") === e1)
    assert(Sampling.shuffleDeterministic(df.repartition(3), "id", "ep1",
      numPartitions = 8).orderBy("shuffle_pos").select("id").as[Long]
      .collect().toSeq === e1)
    // different salt -> a genuinely different permutation of the same set
    val e2 = order("ep2")
    assert(e2 !== e1)
    assert(e2.sorted === e1.sorted)
    // and it's actually shuffled, not id order
    assert(e1 !== (0L until 500L))
  }

  test("resampleByTemperature: α=1 keeps all, α=0 equalizes, deterministic") {
    val df = (1 to 1000).map { i =>
      val d = if (i % 10 < 6) "big" else if (i % 10 < 9) "mid" else "small"
      (i.toLong, d)
    }.toDF("id", "domain")
    // α = 1: shares equal the natural distribution -> every rate is
    // exactly 1 -> nothing drops
    assert(Sampling.resampleByTemperature(df, "id", "domain", 1.0)
      .count() === 1000L)
    // α = 0: equal shares -> every domain targets the smallest's count;
    // the smallest domain keeps ALL rows exactly (its rate is 1)
    val eq = Sampling.resampleByTemperature(df, "id", "domain", 0.0)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(eq("small") === 100L)
    assert(math.abs(eq("big") - 100L) < 40, eq.toString) // hash-Bernoulli
    assert(math.abs(eq("mid") - 100L) < 40, eq.toString)
    // deterministic: same corpus, same selection, regardless of layout
    val a = Sampling.resampleByTemperature(df, "id", "domain", 0.5)
      .select("id").as[Long].collect().toSet
    val b = Sampling.resampleByTemperature(df.repartition(7), "id", "domain", 0.5)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    // α between: big damped hardest, small kept fully
    val mid = Sampling.resampleByTemperature(df, "id", "domain", 0.5)
      .groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(mid("small") === 100L)
    assert(mid("big") < 600L && mid("big") > mid("mid"))
  }

  test("readability: syllable heuristic + Flesch on known prose") {
    val syl = Seq("the", "value", "is", "fine", "table", "e", "rhythm",
      "excellent", "documentation", "xyz")
      .toDF("w").select(TextOps.syllables(col("w")).as("s"))
      .collect().map(_.getInt(0)).toSeq
    // value: a|ue - silent e = 1; table: a|e but ends 'le' -> 2;
    // e: 1-1 floored to 1; rhythm: y group = 1; xyz: y = 1
    assert(syl === Seq(1, 1, 1, 1, 2, 1, 1, 3, 5, 1))
    val df = Seq((1L, "The value is fine. The value is fine.")).toDF("id", "text")
    val r = TextOps.readabilityColumns(df, "text")
      .select("n_sentences", "n_words", "n_syllables", "flesch").head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 8L)
    // 2x (the=1, value=1, is=1, 'fine.'=2) = 10
    assert(r.getLong(2) === 10L)
    val expected = 206.835 - 1.015 * (8.0 / 2.0) - 84.6 * (10.0 / 8.0)
    assert(math.abs(r.getDouble(3) - expected) < 1e-6)
    // degenerate: empty text -> flesch NULL, no ANSI divide error
    val empty = TextOps.readabilityColumns(
      Seq((1L, "")).toDF("id", "text"), "text").select("flesch").head()
    assert(empty.isNullAt(0))
  }

  test("dropRepeatedSentences: banner drops, unique text survives in order") {
    val df = Seq(
      (1L, "Subscribe to our newsletter now. Alpha fact one. Alpha fact two."),
      (2L, "Subscribe to our newsletter now. Beta fact."),
      (3L, "Gamma only content here."),
    ).toDF("doc_id", "text")
    val out = Dedup.dropRepeatedSentences(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "Alpha fact one. Alpha fact two.")
    assert(out(2L) === "Beta fact.")
    assert(out(3L) === "Gamma only content here.")
  }

  test("TrigramLm save/load: persisted LM scores bit-identically") {
    val corpus = Seq(
      (1L, "a b c d", "src0"), (2L, "a b c e", "src0"),
      (3L, "a b c q", "other"), (4L, "z z z", "other"),
    ).toDF("doc_id", "text", "source")
    val lm = TextOps.trigramLm(corpus.filter(col("source") === "src0"), "text")
    val dir = java.nio.file.Files.createTempDirectory("lm-artifact").toString
    lm.save(dir)
    val reloaded = TextOps.loadTrigramLm(spark, dir)
    val live = TextOps.scoreTrigram(corpus, "text", "doc_id", lm)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    val fromDisk = TextOps.scoreTrigram(corpus, "text", "doc_id", reloaded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(live === fromDisk)
    assert(live.map(_._2) === Seq(2L, 2L, 2L, 1L)) // trigram counts per doc
  }

  test("sentences: boundaries, abbreviation guard, hard terminators") {
    def sp(s: String) = SentenceSplitExpr.split(s).toSeq
    assert(sp("One. Two. Three.") === Seq("One.", "Two.", "Three."))
    assert(sp("Dr. Smith arrived. He sat.") ===
      Seq("Dr. Smith arrived.", "He sat."))
    assert(sp("See J. Doe. Next point.") ===
      Seq("See J. Doe.", "Next point."))
    assert(sp("Really?! Yes. ok") === Seq("Really?!", "Yes. ok"))
    // '?' breaks even after an abbreviation-looking token
    assert(sp("Dr? Yes.") === Seq("Dr?", "Yes."))
    // lowercase continuation after 'approx.' never breaks; 'items.' does
    assert(sp("approx. twenty items. Next.") ===
      Seq("approx. twenty items.", "Next."))
    assert(sp("a vs. b. C wins.") === Seq("a vs. b.", "C wins."))
    assert(sp("No terminator at all") === Seq("No terminator at all"))
    assert(sp("") === Seq())
    assert(sp("   ") === Seq())
    assert(sp("Ends mid. 3 items follow.") ===
      Seq("Ends mid.", "3 items follow."))
    assert(sp("Quote. \"Begin again.\"") === Seq("Quote.", "\"Begin again.\""))
    // numbers with decimals never break (no whitespace after the dot)
    assert(sp("Pi is 3.14 exactly. True.") ===
      Seq("Pi is 3.14 exactly.", "True."))
    // time-of-day abbreviations hold even before an uppercase word
    assert(sp("Meet at 5 p.m. Tomorrow works too.") ===
      Seq("Meet at 5 p.m. Tomorrow works too."))
    // column path parity
    val viaPlan = Seq(Tuple1("One. Two. Three.")).toDF("t")
      .select(TextOps.sentences(col("t"))).head().getSeq[String](0).toSeq
    assert(viaPlan === Seq("One.", "Two.", "Three."))
  }

  test("kneserNeyLogPerplexity: discount, continuation and edge tiers") {
    // LM (src0): bigrams {a b:2, a c:1}; uni a:3 b:2 c:1; B=2 types; V=3
    // pcont(w2) = (N1+(.w2)+1)/(B+V): b,c -> 0.4; unseen -> 0.2
    val df = Seq(
      (1L, "a b", "src0"), (2L, "a b", "src0"), (3L, "a c", "src0"),
      (4L, "a b", "other"),  // seen: (2-.75)/3 + .75/3*2*.4
      (5L, "a d", "other"),  // unseen bigram, seen context
      (6L, "x y", "other"),  // unseen context -> pcont(y)
      (7L, "b a", "other"),  // context with no continuation -> pcont(a)
      (8L, "solo", "other"), // too short
    ).toDF("doc_id", "text", "source")
    val out = TextOps.kneserNeyLogPerplexity(df, "text", "doc_id",
      col("source") === "src0")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val pSeen = (2.0 - 0.75) / 3.0 + 0.75 / 3.0 * 2.0 * 0.4
    assert(out(4L) === ((1L, r6(-math.log(pSeen)))))
    assert(out(5L) === ((1L, r6(-math.log(0.75 / 3.0 * 2.0 * 0.2)))))
    assert(out(6L) === ((1L, r6(-math.log(0.2)))))
    assert(out(7L) === ((1L, r6(-math.log(0.2))))) // pcont(a) = (0+1)/5
    assert(out(8L) === ((0L, 0.0)))
  }

  test("truncateNormalize: unit norm, direction preserved, zero-norm null") {
    val df = Seq(
      (1L, Array(3.0f, 4.0f, 100.0f, -5.0f)),
      (2L, Array(0.0f, 0.0f, 7.0f, 7.0f)), // zero prefix at k=2
      (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f)),
    ).toDF("vec_id", "embedding")
    val out = df.select(col("vec_id"),
      Similarity.truncateNormalize(col("embedding"), 2).as("t"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Double](1).toSeq)).toMap
    assert(out(1L) === Seq(0.6, 0.8)) // 3-4-5 triangle
    assert(out(2L) === null)
    assert(out(3L) === Seq(-1.0, 0.0))
    // prefix of the truncation == truncation of the prefix, renormalized
    val full = out(1L)
    assert(math.abs(full.map(x => x * x).sum - 1.0) < 1e-12)
  }

  test("zipfProfile: exact slope on a constructed vocabulary") {
    // frequencies 8,4,2,1 over ranks 1..4 — perfect power law f = 8/r^~?
    // slope = OLS of ln f on ln r; compute expected directly
    val words = Seq.fill(8)("w1") ++ Seq.fill(4)("w2") ++
      Seq.fill(2)("w3") ++ Seq.fill(1)("w4")
    val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = TextOps.zipfProfile(df, "text").head()
    val xs = Seq(1, 2, 3, 4).map(r => math.log(r.toDouble))
    val ys = Seq(8, 4, 2, 1).map(f => math.log(f.toDouble))
    val n = 4.0
    val slope = (n * xs.zip(ys).map { case (a, b) => a * b }.sum -
      xs.sum * ys.sum) / (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(math.abs(row.getDouble(0) - slope) < 1e-6)
    assert(row.getLong(1) === 4L && row.getLong(2) === 15L)
  }

  test("porterStem: official-algorithm outputs across all five steps") {
    // full-pipeline expectations (per-step examples from the paper do
    // NOT equal end-to-end output — e.g. relational → relate in step 2
    // but → relat after step 5a)
    val cases = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "cats" -> "cat", "feed" -> "feed", "agreed" -> "agre",
      "plastered" -> "plaster", "bled" -> "bled", "motoring" -> "motor",
      "sing" -> "sing", "conflated" -> "conflat", "troubled" -> "troubl",
      "sized" -> "size", "hopping" -> "hop", "tanned" -> "tan",
      "falling" -> "fall", "hissing" -> "hiss", "fizzed" -> "fizz",
      "failing" -> "fail", "filing" -> "file", "happy" -> "happi",
      "sky" -> "sky", "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
      "digitizer" -> "digit", "operator" -> "oper", "feudalism" -> "feudal",
      "decisiveness" -> "decis", "hopefulness" -> "hope",
      "formaliti" -> "formal", "triplicate" -> "triplic",
      "formative" -> "form", "formalize" -> "formal",
      "electriciti" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good", "revival" -> "reviv",
      "allowance" -> "allow", "inference" -> "infer",
      "adjustable" -> "adjust", "defensible" -> "defens",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "communism" -> "commun", "activate" -> "activ",
      "effective" -> "effect", "probate" -> "probat", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
    )
    cases.foreach { case (w, exp) =>
      assert(PorterStemExpr.stem(w) === exp, s"stem($w)")
    }
    // non-alphabetic and short tokens pass through
    assert(PorterStemExpr.stem("x1") === "x1")
    assert(PorterStemExpr.stem("https://e.com") === "https://e.com")
    assert(PorterStemExpr.stem("") === "")
    assert(PorterStemExpr.stem("at") === "at")
    // case folds; codegen column path agrees with the driver function
    val viaPlan = cases.map(_._1).toDF("w")
      .select(TextOps.porterStem(upper(col("w"))).as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(viaPlan === cases.map(_._2))
  }

  test("normalizeUnicode: NFC composes, NFKC folds compatibility forms") {
    val rows = Seq(
      (1L, "café"),       // decomposed é
      (2L, "café"),             // already NFC — fast path
      (3L, "ﬁle"),         // ﬁ ligature
      (4L, "ＡＢ ２"),  // fullwidth A B, fullwidth 2
      (5L, "x²"),          // superscript two
      (6L, null.asInstanceOf[String]),
    ).toDF("id", "t")
    val out = rows.select(col("id"),
      TextOps.normalizeUnicode(col("t"), "NFC").as("nfc"),
      TextOps.normalizeUnicode(col("t"), "NFKC").as("nfkc"))
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) null else r.getString(1)),
          (if (r.isNullAt(2)) null else r.getString(2)))).toMap
    assert(out(1L) === (("café", "café")))
    assert(out(2L) === (("café", "café")))
    assert(out(3L)._1 === "ﬁle") // NFC keeps the ligature
    assert(out(3L)._2 === "file")     // NFKC folds it
    assert(out(4L)._2 === "AB 2")
    assert(out(5L)._2 === "x2")
    assert(out(6L) === ((null, null)))
    // idempotence
    val twice = rows.filter(col("t").isNotNull).select(
      TextOps.normalizeUnicode(
        TextOps.normalizeUnicode(col("t"), "NFKC"), "NFKC").as("a"),
      TextOps.normalizeUnicode(col("t"), "NFKC").as("b"))
      .collect()
    twice.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("trigramLogPerplexity: every backoff tier, hand-computed") {
    // LM subset (src0): trigrams {a b c, a b d}, bigrams {a b:2, b c, b d},
    // unigrams {a:2, b:2, c:1, d:1}, T = 6, V = 4
    val df = Seq(
      (1L, "a b c", "src0"),
      (2L, "a b d", "src0"),
      (3L, "a b c", "other"),   // tier 1: c3/c2ctx = 1/2
      (4L, "b c d", "other"),   // tier 3: "c d" unseen → α²(c(d)+1)/(T+V)
      (5L, "x y z", "other"),   // tier 3 with OOV w3: α²·1/(T+V)
      (6L, "c a b d", "other"), // tier 2 then tier 1
      (7L, "a b", "other"),     // too short: 0 trigrams
      (8L, null.asInstanceOf[String], "other"),
    ).toDF("doc_id", "text", "source")
    val out = TextOps.trigramLogPerplexity(df, "text", "doc_id",
      col("source") === "src0")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(3L) === ((1L, r6(-math.log(0.5)))))
    assert(out(4L) === ((1L, r6(-math.log(0.4 * 0.4 * 2.0 / 10.0)))))
    assert(out(5L) === ((1L, r6(-math.log(0.4 * 0.4 * 1.0 / 10.0)))))
    // "c a b": trigram unseen, bigram "a b" seen → α·c(a b)/c(a) = 0.4·2/2
    // "a b d": seen → 1/2
    assert(out(6L) === ((2L,
      r6((-math.log(0.4 * 2.0 / 2.0) - math.log(0.5)) / 2))))
    assert(out(7L) === ((0L, 0.0)))
    assert(out(8L) === ((0L, 0.0)))
    // LM docs score themselves: trigram always seen → tier 1 only
    assert(out(1L) === ((1L, r6(-math.log(0.5)))))
  }
}
