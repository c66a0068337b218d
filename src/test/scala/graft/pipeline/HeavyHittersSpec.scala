package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Misra–Gries sketch guarantees + the two-pass exact heavy-hitters
  * recipe built on it.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Skewed deterministic stream: item "h<i>" appears ~2^(8-i) times for
  // i in 0..7, plus a long tail of singletons — forces constant sketch
  // eviction when k is small.
  private def skewedItems(tail: Int): Seq[String] = {
    val heavy = (0 until 8).flatMap(i => Seq.fill(1 << (8 - i))(s"h$i"))
    val singles = (0 until tail).map(i => s"t$i")
    // interleave deterministically so heavy items aren't contiguous
    val mixed = (heavy ++ singles).zipWithIndex
      .sortBy { case (s, i) => (i * 2654435761L) % 1000003 }
      .map(_._1)
    mixed
  }

  test("sketch: total n counts non-null items only") {
    val df = (skewedItems(100).map(Option(_)) ++ Seq.fill(7)(None))
      .toDF("item")
    val (n, _) = HeavyHitters.sketch(df, "item", 16)
    assert(n === skewedItems(100).size)
  }

  test("sketch: superset guarantee — every item above n/(k+1) survives") {
    val items = skewedItems(2000)
    val truth = items.groupBy(identity).view.mapValues(_.size).toMap
    val n = items.size
    // repartition(7) forces the mergeable-summaries merge path
    val df = items.toDF("item").repartition(7)
    for (k <- Seq(8, 16, 64)) {
      val (sn, cand) = HeavyHitters.sketch(df, "item", k)
      assert(sn === n)
      assert(cand.size <= k)
      val mustSurvive = truth.filter(_._2 > n.toDouble / (k + 1)).keySet
      assert(mustSurvive.subsetOf(cand.keySet),
        s"k=$k lost ${mustSurvive -- cand.keySet}")
      // stored counts are lower bounds within n/(k+1)
      cand.foreach { case (item, c) =>
        assert(c <= truth(item), s"$item overcounted: $c > ${truth(item)}")
        assert(c >= truth(item) - n.toDouble / (k + 1) - 1e-9)
      }
    }
  }

  test("heavyHitters: exact parity with a naive full groupBy") {
    val items = skewedItems(500)
    val df = items.toDF("item").repartition(5)
    val frac = 0.02
    val got = HeavyHitters.heavyHitters(df, "item", frac, sketchK = 64)
      .as[(String, Long)].collect().toMap
    val thr = math.ceil(frac * items.size).toLong
    val want = items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thr).toMap
    assert(got === want)
  }

  test("heavyHitters: rejects a sketch too small for the threshold") {
    val df = Seq("a", "b").toDF("item")
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, "item", minFrac = 0.01, sketchK = 50)
    }
  }

  test("heavyHitterTokens matches explode-groupBy on text") {
    val docs = Seq(
      "the cat sat on the mat",
      "the dog sat",
      "a cat and the bird",
    ).toDF("text")
    val got = HeavyHitters
      .heavyHitterTokens(docs, "text", minFrac = 0.2, sketchK = 16)
      .as[(String, Long)].collect().toMap
    // 14 tokens total, threshold ceil(2.8) = 3: "the" ×4; "sat"/"cat" ×2 miss
    assert(got === Map("the" -> 4L))
  }

  test("buffer serialization round-trips items beyond the 64 KB writeUTF cap") {
    val agg = MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val st = agg.createAggregationBuffer()
    val big = "é" * 70000 // 140 KB UTF-8
    st.n = 5L
    st.counts.update(big, 3L)
    st.counts.update("small", 2L)
    val back = agg.deserialize(agg.serialize(st))
    assert(back.n === 5L)
    assert(back.counts === st.counts)
  }

  test("count-min sketches: overcount-only, sharded union == monolithic") {
    // zipf-ish: item i appears 401-i times, i in 1..400, over 8 shards
    val rows = for { i <- 1 to 400; _ <- 1 to (401 - i) } yield
      (s"item$i", s"shard${i % 8}")
    val df = rows.toDF("item", "shard")
    val truth = rows.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val probes = (1 to 400 by 7).map(i => s"item$i") :+ "never-seen"

    // wide sketch (small eps): every estimate exact — also proves the
    // driver-side estimateCount hashes strings the same way the
    // executor-side aggregate did
    val wide = HeavyHitters.freqUnion(
      HeavyHitters.freqSketches(df, "item", Seq("shard"), eps = 1e-4))
    for ((item, est) <- HeavyHitters.freqEstimates(wide, probes))
      assert(est === truth.getOrElse(item, 0L), item)

    // narrow sketch: one-sided error within eps·n
    val n = rows.size.toLong
    val narrow = HeavyHitters.freqUnion(
      HeavyHitters.freqSketches(df, "item", Seq("shard"), eps = 0.01))
    for ((item, est) <- HeavyHitters.freqEstimates(narrow, probes)) {
      val t = truth.getOrElse(item, 0L)
      assert(est >= t, s"$item undercounted: $est < $t")
      assert(est - t <= (0.01 * n).toLong + 1, s"$item: $est vs $t")
    }

    // union of per-shard sketches answers exactly like one global sketch
    val mono = HeavyHitters.freqUnion(
      HeavyHitters.freqSketches(df, "item", Seq.empty, eps = 0.01))
    assert(HeavyHitters.freqEstimates(narrow, probes) ===
      HeavyHitters.freqEstimates(mono, probes))
  }

  test("non-string items are cast before sketching") {
    val df = spark.range(100).select((col("id") % 3).as("item"))
    val got = HeavyHitters.heavyHitters(df, "item", minFrac = 0.3)
      .as[(String, Long)].collect().toMap
    assert(got === Map("0" -> 34L, "1" -> 33L, "2" -> 33L))
  }
}
