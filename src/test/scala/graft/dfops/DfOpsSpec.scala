package graft.dfops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Mirrors `tests/test_dfops.py` semantics on synthetic frames. */
class DfOpsSpec extends SparkSpec {
  import spark.implicits._

  test("applyJitter: bounded uniform noise, one shared vector per call") {
    val df = spark.range(1000).select(
      col("id").cast("double").as("a"),
      (col("id") * 2).cast("double").as("b"))
    val j = DfOps.applyJitter(df, Seq("a", "b"), amps = Seq(0.5))
    val rows = j.select(
      (col("a_jittered") - col("a")).as("da"),
      (col("b_jittered") - col("b")).as("db")).collect()
    // uniform noise covers [-amp, amp] (dfops.py:59-60)
    assert(rows.forall(r => math.abs(r.getDouble(0)) <= 0.5))
    // the SAME noise vector is shared by all columns (dfops.py:57-68)
    assert(rows.forall(r => math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    // de-quantization actually jitters: not all offsets identical
    assert(rows.map(_.getDouble(0)).distinct.length > 100)
  }

  test("applyJitter: normal type and in-place column names") {
    val df = spark.range(2000).select(col("id").cast("double").as("a"))
    val j = DfOps.applyJitter(df, Seq("a"), colsJittered = Some(Seq("a")),
      amps = Seq(0.1), jitterType = "normal")
    assert(j.columns.toSeq === Seq("a"))
    val std = j.agg(stddev("a")).first().getDouble(0)
    // stdev of id+N(0,0.1) dominated by id spread; just check it ran & changed
    val diff = j.as[Double].collect().zip(0 until 2000)
      .count { case (v, i) => v != i.toDouble }
    assert(diff > 1900)
    assert(std > 0)
  }

  test("applyFilter: open interval excludes the bounds") {
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val out = DfOps.applyFilter(df, "x", 1.0, 4.0).as[Double].collect().sorted
    assert(out.toSeq === Seq(2.0, 3.0))
  }

  test("offsetByOtherColumns: row offsets, mean reduction, preserve_mean") {
    val df = Seq((10.0, 1.0), (20.0, 2.0), (30.0, 3.0)).toDF("e", "c")
    // plain row offset with weight -1 (binding-scale sign flip)
    val r1 = DfOps.offsetByOtherColumns(df, "e", Seq("c"), Seq(-1.0))
      .select("e").as[Double].collect().sorted
    assert(r1.toSeq === Seq(9.0, 18.0, 27.0))
    // reduction=mean: shift all rows by w * mean(c) = 2
    val r2 = DfOps.offsetByOtherColumns(df, "e", Seq("c"), Seq(1.0),
      reductions = Seq(Some("mean"))).select("e").as[Double].collect().sorted
    assert(r2.toSeq === Seq(12.0, 22.0, 32.0))
    // preserve_mean: e + c - mean(c) keeps mean(e) unchanged
    val r3 = DfOps.offsetByOtherColumns(df, "e", Seq("c"), Seq(1.0),
      preserveMean = Seq(true))
    assert(math.abs(r3.agg(avg("e")).first().getDouble(0) - 20.0) < 1e-12)
    // rename leaves the original column intact
    val r4 = DfOps.offsetByOtherColumns(df, "e", Seq("c"), Seq(1.0),
      rename = Some("e2"))
    assert(r4.columns.toSet === Set("e", "c", "e2"))
  }

  test("forwardFill crosses long null runs (the map_overlap pain point)") {
    // nulls spanning more than one partition: dask needs iterated
    // map_overlap (dfops.py:239-254); one window pass handles any run length
    val df = spark.range(100).repartition(8).select(
      col("id"),
      when(col("id") === 0 || col("id") === 90, col("id").cast("double")).as("v"))
    val out = DfOps.forwardFill(df, Seq("v"), "id")
      .orderBy("id").select("v").as[Double].collect()
    assert(out.slice(0, 90).forall(_ == 0.0))
    assert(out.slice(90, 100).forall(_ == 90.0))
  }

  test("two-phase global fill: boundary carries across many range " +
      "partitions equal the single-window form") {
    // values sparse enough that most range partitions are FULLY NULL —
    // every partition head must be patched by a carry that skipped the
    // null partitions in between; checked at two shuffle-partition
    // settings against the hand-computed expectation
    val df = spark.range(5000).repartition(16).select(
      col("id"),
      when(col("id") % 1700 === 0, col("id").cast("double")).as("v"))
    val out = DfOps.forwardFill(df, Seq("v"), "id")
      .orderBy("id").select("v").as[Double].collect()
    (0 until 5000).foreach { i =>
      assert(out(i) === (i / 1700) * 1700.0, s"row $i")
    }
    val back = DfOps.backwardFill(df, Seq("v"), "id")
      .orderBy("id").collect().map(r => Option(r.get(1)))
    (0 until 5000).foreach { i =>
      val next = ((i + 1699) / 1700) * 1700
      if (next <= 3400) assert(back(i).contains(next.toDouble), s"row $i")
      else assert(back(i).isEmpty, s"row $i")
    }
  }

  test("global fill edge contracts: empty cols no-op, null orderCol rows " +
      "participate (nulls-first), reserved names fail fast") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // empty cols: the old form was a no-op — stay one
    val df0 = spark.range(5).toDF("id")
    assert(DfOps.forwardFill(df0, Seq.empty, "id").collect().length === 5)
    // a NULL orderCol row sorts FIRST; its value must seed the fill of
    // every later row (the carry aggregate must not skip the null key)
    val schema = StructType(Seq(StructField("ord", LongType, true),
      StructField("v", DoubleType, true)))
    val rows = Row(null, 5.0) +: (1L to 400L).map(i => Row(i, null)).toSeq
    val dfn = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 8), schema)
    val filled = DfOps.forwardFill(dfn, Seq("v"), "ord")
      .filter(col("ord").isNotNull).select("v").as[Double].collect()
    assert(filled.length === 400 && filled.forall(_ === 5.0))
    // reserved helper names collide loudly instead of vanishing
    val clash = spark.range(3).select(col("id"), lit(1).as("_gf_pid"),
      when(col("id") === 0, 1.0).as("v"))
    val e = intercept[IllegalArgumentException](
      DfOps.forwardFill(clash, Seq("v"), "id"))
    assert(e.getMessage.contains("_gf_pid"))
  }

  test("smallFrame fill: identical values, single-window plan") {
    val df = spark.range(3000).repartition(8).select(
      col("id"),
      when(col("id") % 700 === 0, col("id").cast("double")).as("v"))
    val twoPhase = DfOps.forwardFill(df, Seq("v"), "id")
      .orderBy("id").select("v").as[Double].collect()
    val one = DfOps.forwardFill(df, Seq("v"), "id", smallFrame = true)
    val oneV = one.orderBy("id").select("v").as[Double].collect()
    assert(oneV.toSeq === twoPhase.toSeq)
    // plan: ONE keyless window, none of the two-phase machinery (range
    // exchange + carry aggregate + broadcast patch join)
    one.collect()
    val p = one.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case other => other.toString
    }
    assert("Window".r.findAllIn(p).nonEmpty, p)
    assert(!p.contains("BroadcastHashJoin") && !p.contains("rangepartitioning"),
      p)
    val back = DfOps.backwardFill(df, Seq("v"), "id", smallFrame = true)
      .orderBy("id").collect().map(r => Option(r.get(1)))
    val back2 = DfOps.backwardFill(df, Seq("v"), "id")
      .orderBy("id").collect().map(r => Option(r.get(1)))
    assert(back.toSeq === back2.toSeq)
  }

  test("backwardFill mirrors forwardFill") {
    val df = spark.range(10).select(
      col("id"),
      when(col("id") === 7, lit(7.0)).as("v"))
    val out = DfOps.backwardFill(df, Seq("v"), "id")
      .orderBy("id").collect().map(r => Option(r.get(1)))
    assert(out.take(8).forall(_.contains(7.0)))
    assert(out.drop(8).forall(_.isEmpty))
  }

  test("splitChannelBitwise: 3-bit sector extraction") {
    val df = Seq(0L, 7L, 8L, 0x1234L).toDF("v")
    val out = DfOps.splitChannelBitwise(df, "v", "low", "high", 3)
      .orderBy("v").select("low", "high").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((0L, 0L), (7L, 0L), (0L, 1L), (0x1234L & 7, 0x1234L >> 3)))
  }

  test("saltedAggregate equals plain groupBy on skewed keys") {
    // 90% of rows share one key — the salting path must still be exact
    val df = spark.range(2000).select(
      when(col("id") % 10 =!= 0, lit("hot"))
        .otherwise(concat(lit("k"), (col("id") % 7).cast("string")))
        .as("key"),
      col("id").cast("double").as("x"))
    val salted = DfOps.saltedAggregate(df, Seq("key"), Seq(
      ("cnt", count(lit(1)), sum),
      ("total", sum(col("x")), sum),
    )).collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val plain = df.groupBy("key")
      .agg(count(lit(1)).as("cnt"), sum("x").as("total"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(salted.keySet === plain.keySet)
    plain.foreach { case (k, (n, t)) =>
      assert(salted(k)._1 === n)
      assert(math.abs(salted(k)._2 - t) < 1e-6)
    }
  }

  test("Interp.piecewiseLinear: np.interp parity incl. clamps") {
    val xs = Array(0.0, 1.0, 3.0)
    val ys = Array(10.0, 20.0, -20.0)
    val df = Seq(-5.0, 0.0, 0.5, 1.0, 2.0, 3.0, 99.0).toDF("x")
    val out = df.select(Interp.piecewiseLinear(col("x"), xs, ys))
      .as[Double].collect()
    assert(out.toSeq === Seq(10.0, 10.0, 15.0, 20.0, 0.0, -20.0, -20.0))
  }

  test("asofJoin: latest right row at-or-before each left row, per key") {
    val left = Seq((1L, "u", 10L), (2L, "u", 20L), (3L, "u", 25L),
      (4L, "v", 5L), (5L, "v", 50L)).toDF("id", "k", "t")
    val right = Seq(("u", 10L, 1.0), ("u", 21L, 2.0), ("v", 40L, 3.0))
      .toDF("k", "t", "mv")
    val out = DfOps.asofJoin(left, right, "t", "t", Seq("k"), Seq("mv"))
      .select("id", "mv").collect().map(r =>
        r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // id=1: right at EXACTLY t=10 matches (<=); id=3: 21 <= 25 wins over 10;
    // id=4: no right row at or before t=5 -> null
    assert(out === Map(1L -> Some(1.0), 2L -> Some(1.0), 3L -> Some(2.0),
      4L -> None, 5L -> Some(3.0)))
  }

  test("asofJoin matches a brute-force inequality join on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(1000).toLong))
      .toDF("id", "k", "t")
    val right = (1 to 80).map(i =>
      (s"k${rnd.nextInt(4)}", rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .toDF("k", "t", "mv")
      // unique per (k, t): asofJoin's documented precondition
      .groupBy("k", "t").agg(max("mv").as("mv"))
    val got = DfOps.asofJoin(left, right, "t", "t", Seq("k"), Seq("mv"))
      .select("id", "mv").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    val exp = left.as[(Long, String, Long)].collect().map { case (id, k, t) =>
      val cands = right.as[(String, Long, Double)].collect()
        .filter(c => c._1 == k && c._2 <= t)
      id -> (if (cands.isEmpty) Double.NaN else cands.maxBy(_._2)._3)
    }.toMap
    assert(got.keySet === exp.keySet)
    got.foreach { case (id, v) =>
      assert(v.isNaN == exp(id).isNaN && (v.isNaN || v == exp(id)),
        s"id=$id got=$v exp=${exp(id)}")
    }
  }

  test("asofJoin: nullable right values come from the matched row, never older") {
    val left = Seq((1L, "u", 30L), (2L, "u", 15L)).toDF("id", "k", "t")
    val right = Seq(
      ("u", 10L, Option(1.0), Option("a")),
      ("u", 20L, Option.empty[Double], Option("b")), // mv NULL on the match
    ).toDF("k", "t", "mv", "tag")
    val out = DfOps.asofJoin(left, right, "t", "t", Seq("k"), Seq("mv", "tag"))
      .select("id", "mv", "tag").collect()
      .map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) None else Some(r.getDouble(1))), r.getString(2)))
      .toMap
    // id=1 matches t=20: mv stays NULL (not torn back to 1.0), tag from the
    // SAME row; id=2 matches t=10 normally
    assert(out(1L) === ((None, "b")))
    assert(out(2L) === ((Some(1.0), "a")))
  }

  test("approx quantiles and cardinality stay within their error bounds") {
    val rnd = new scala.util.Random(13)
    val rows = (1 to 20000).map(i => (s"k${i % 3}", rnd.nextGaussian() * 100))
    val df = rows.toDF("k", "v")
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95)
    val accuracy = 1000
    val approx = DfOps.groupQuantiles(df, "v", Seq("k"), qs,
      approx = true, accuracy = accuracy).collect()
      .map(r => r.getString(0) -> Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // percentile_approx guarantees rank error <= 1/accuracy: the returned
    // value's empirical rank must sit within q ± 1/accuracy (+ discreteness)
    for ((k, vals) <- byKey; ((_, q), got) <- qs.zip(approx(k))) {
      val rank = vals.count(_ <= got).toDouble / vals.length
      val tol = 1.0 / accuracy + 1.0 / vals.length
      assert(math.abs(rank - q) <= tol, s"key=$k q=$q rank=$rank got=$got")
    }
    // exact path remains quantile_cont (interpolated) — spot-check p50
    val exact = DfOps.groupQuantiles(df, "v", Seq("k"), qs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    for ((k, vals) <- byKey) {
      assert(math.abs(exact(k) - vals(vals.length / 2)) < 1.0)
    }
    // cardinality: HLL++ within a few relative standard deviations
    val cdf = (1 to 30000).map(i => (s"g${i % 2}", (i % 7919).toLong)).toDF("k", "u")
    val exactCard = DfOps.groupCardinality(cdf, "u", Seq("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approxCard = DfOps.groupCardinality(cdf, "u", Seq("k"), approx = true, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exactCard.foreach { case (k, n) =>
      assert(math.abs(approxCard(k) - n).toDouble / n <= 0.15,
        s"key=$k exact=$n approx=${approxCard(k)}")
    }
  }

  test("rangeJoin: half-open semantics and brute-force parity") {
    val rnd = new scala.util.Random(11)
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextDouble() * 100))
      .toDF("pid", "x")
    val ivs = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 100 - 5
      (i.toLong, lo, lo + rnd.nextDouble() * 12)
    }.toDF("iid", "lo", "hi")
    val got = DfOps.rangeJoin(pts, "x", ivs, "lo", "hi", bucketWidth = 8.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val p = pts.as[(Long, Double)].collect()
    val v = ivs.as[(Long, Double, Double)].collect()
    val exp = (for {
      (pid, x) <- p; (iid, lo, hi) <- v if x >= lo && x < hi
    } yield (pid, iid)).toSet
    assert(got === exp)
    // boundary: start inclusive, end exclusive, even exactly on a bucket edge
    val bpts = Seq((1L, 8.0), (2L, 16.0)).toDF("pid", "x")
    val bivs = Seq((9L, 8.0, 16.0)).toDF("iid", "lo", "hi")
    val b = DfOps.rangeJoin(bpts, "x", bivs, "lo", "hi", 8.0)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(b === Set((1L, 9L)))
  }

  test("sessionize: new session when the gap exceeds maxGap") {
    val df = Seq(("u", 0L), ("u", 10L), ("u", 100L), ("u", 105L),
      ("u", 300L), ("v", 0L)).toDF("k", "t")
    val out = DfOps.sessionize(df, "t", lit(50L), Seq("k"))
      .select("k", "t", "session_id").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out === Map(("u", 0L) -> 0L, ("u", 10L) -> 0L, ("u", 100L) -> 1L,
      ("u", 105L) -> 1L, ("u", 300L) -> 2L, ("v", 0L) -> 0L))
  }

  test("groupQuantiles: exact linear-interpolation quantiles per group") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 10.0)).toDF("g", "x")
    val out = DfOps.groupQuantiles(df, "x", Seq("g"),
      Seq("p50" -> 0.5, "p25" -> 0.25))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // numpy/quantile_cont convention: index (n-1)*q, linear interpolation
    assert(out("a") === ((2.5, 1.75)))
    assert(out("b") === ((10.0, 10.0)))
  }

  test("EPICS degenerate series: 1 sample, duplicate ts, empty payload") {
    // a single archived sample = the PV was constant in the window
    // (np.interp semantics); previously crashed piecewiseLinear's
    // >=2-knot require
    val events = Seq(10.0, 20.0).toDF("ts")
    val one = Epics.addArchiverData(events, "pv", "ts",
      (_, _, _) => (Array(12.0), Array(7.5)), "CH")
      .select("pv").collect().map(_.getDouble(0)).toSeq
    assert(one === Seq(7.5, 7.5))
    // duplicate timestamps (coalesced archiver writes): LAST sample wins,
    // the strict ascending-knot kernel must not throw
    val dup = Epics.addArchiverData(events, "pv", "ts",
      (_, _, _) => (Array(10.0, 10.0, 20.0), Array(1.0, 2.0, 4.0)), "CH")
      .select("ts", "pv").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(dup(10.0) === 2.0 && dup(20.0) === 4.0)
    // an unarchived channel answers [] — a named error, not an NPE
    assert(Epics.parsePayload("[]")._1.isEmpty)
    val e = intercept[IllegalArgumentException] {
      Epics.addArchiverData(events, "pv", "ts",
        (_, _, _) => Epics.parsePayload("[]"), "NO:SUCH:PV")
    }
    assert(e.getMessage.contains("NO:SUCH:PV"))
  }

  test("EPICS archiver series attaches through the interp core (offline client)") {
    // archiver-appliance payload shape: [{"data":[{secs,nanos,val},...]}]
    val payload =
      """[{"meta": {"name": "KTOF:Lens:Extr:I"}, "data": [
        | {"secs": 1000, "nanos": 0,         "val": 10.0},
        | {"secs": 1010, "nanos": 500000000, "val": 20.0},
        | {"secs": 1900, "nanos": 0,         "val": 30.0},
        | {"secs": 2100, "nanos": 0,         "val": 99.0}
        |]}]""".stripMargin
    val f = java.nio.file.Files.createTempFile("archiver", ".json")
    java.nio.file.Files.writeString(f, payload)

    val (ts, vals) = Epics.parsePayload(payload)
    assert(ts.toSeq === Seq(1000.0, 1010.5, 1900.0, 2100.0))
    assert(vals.toSeq === Seq(10.0, 20.0, 30.0, 99.0))

    // events spanning [1000, 2000]: the file client's window (±5 s) keeps
    // the first three samples and drops the 2100 one
    val events = Seq(990.0, 1000.0, 1005.25, 1500.0, 2000.0).toDF("ts")
    val out = Epics.addArchiverData(
      events, "extractor_current", "ts",
      Epics.fromFile(f.toString), "KTOF:Lens:Extr:I")
      .select("ts", "extractor_current")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(990.0) === 10.0) // clamped before first knot
    assert(out(1000.0) === 10.0)
    assert(math.abs(out(1005.25) - 15.0) < 1e-9) // midway 1000 -> 1010.5
    assert(math.abs(out(1500.0) - (20.0 + 10.0 * (1500.0 - 1010.5) / (1900.0 - 1010.5)))
      < 1e-9)
    assert(out(2000.0) === 30.0) // clamped: the 2100 sample fell outside the window

    // request-URL format matches the reference's string construction
    assert(Epics.requestUrl("http://aa.example/retrieval/data/getData.json?pv=",
      "KTOF:Lens:Extr:I", 1661980582.0, 1661980600.5) ===
      "http://aa.example/retrieval/data/getData.json?pv=KTOF:Lens:Extr:I" +
        "&from=2022-08-31T21:16:22Z&to=2022-08-31T21:16:40.5Z")
    // a fraction within half a nanosecond of the next second must clamp,
    // not round to nanos=1e9 and throw DateTimeException (reachable only
    // at small magnitudes, where doubles still resolve sub-nanoseconds)
    val url = Epics.requestUrl("http://aa.example/?pv=", "CH",
      0.99999999999, 1.0)
    assert(url.contains("from=1970-01-01T00:00:00.999999999Z"), url)
  }

  test("EPICS live HTTP client: fetches, decodes and attaches a recorded" +
      " payload; request line matches the reference format") {
    // a real HTTP round-trip against a local server replaying the
    // recorded archiver-appliance payload — the fromUrl path end-to-end
    val payload =
      """[{"meta": {"name": "KTOF:Lens:Extr:I"}, "data": [
        | {"secs": 1000, "nanos": 0,         "val": 10.0},
        | {"secs": 1010, "nanos": 500000000, "val": 20.0},
        | {"secs": 1900, "nanos": 0,         "val": 30.0}
        |]}]""".stripMargin
    val seen = new java.util.concurrent.atomic.AtomicReference[String]("")
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/retrieval/data/getData.json",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        seen.set(ex.getRequestURI.toString)
        val bytes = payload.getBytes("UTF-8")
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}" +
        "/retrieval/data/getData.json?pv="
      val events = Seq(1000.0, 1005.25, 1500.0).toDF("ts")
      val out = Epics.addArchiverData(events, "extractor_current", "ts",
        Epics.fromUrl(base), "KTOF:Lens:Extr:I")
        .select("ts", "extractor_current")
        .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      assert(out(1000.0) === 10.0)
      assert(math.abs(out(1005.25) - 15.0) < 1e-9)
      // the server saw the reference's exact request shape (±5 s margin)
      assert(seen.get() === "/retrieval/data/getData.json?pv=" +
        "KTOF:Lens:Extr:I&from=1970-01-01T00:16:35Z&to=1970-01-01T00:25:05Z",
        seen.get())
      // HTTP errors surface loudly, not as empty series
      intercept[Exception] {
        Epics.fromUrl(s"http://127.0.0.1:${server.getAddress.getPort}" +
          "/nope?pv=").fetch("CH", 0.0, 1.0)
      }
    } finally server.stop(0)
  }

  test("funnelDepth: ordered steps, strict time progression, span cap") {
    val steps = Seq("A", "B", "C")
    val df = Seq(
      // u1 completes A(1) B(5) C(9)
      (1L, 1L, "A"), (1L, 5L, "B"), (1L, 9L, "C"),
      // u2: B before A never counts; B at A's exact ts doesn't either
      (2L, 3L, "B"), (2L, 4L, "A"), (2L, 4L, "B"),
      // u3: out-of-order completion (C first) stalls at A
      (3L, 1L, "C"), (3L, 2L, "A"),
      // u4: never starts
      (4L, 7L, "X"),
    ).toDF("user_id", "ts", "event_type")
    val d = DfOps.funnelDepth(df, "ts", "event_type", Seq("user_id"), steps)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d === Map(1L -> 3, 2L -> 1, 3L -> 1)) // u4 filtered out entirely
    // span cap: u1's funnel takes 8 ticks; capping at 5 stops before C
    val capped = DfOps.funnelDepth(df, "ts", "event_type", Seq("user_id"),
      steps, maxSpan = Some(5L))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(capped(1L) === 2)
    // report counts keys reaching AT LEAST each step (absent keys = 0)
    val rep = DfOps.funnelReport(df, "ts", "event_type", Seq("user_id"), steps)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(rep.toSeq === Seq((1, "A", 3L), (2, "B", 1L), (3, "C", 1L)))
  }

  test("retention: cohort by first period, distinct-active offsets") {
    // period length 10: u1 active periods {0, 1, 3}, u2 {1, 1, 2}, u3 {3}
    val df = Seq(
      (1L, 2L), (1L, 5L), (1L, 12L), (1L, 31L),
      (2L, 10L), (2L, 19L), (2L, 25L),
      (3L, 30L),
    ).toDF("user_id", "ts")
    val out = DfOps.retention(df, "ts", Seq("user_id"), 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      (0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L, // u1 cohort 0
      (1L, 0L) -> 1L, (1L, 1L) -> 1L,                 // u2 cohort 1
      (3L, 0L) -> 1L))                                // u3 cohort 3
  }

  test("transitionMatrix: consecutive pairs per key, per-from probabilities") {
    // u1: a→b→b→c ; u2: a→c — pairs: (a,b),(b,b),(b,c),(a,c)
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "b"), (1L, 40L, "c"),
      (2L, 10L, "a"), (2L, 15L, "c"),
    ).toDF("u", "ts", "et")
    val out = DfOps.transitionMatrix(df, "ts", "et", Seq("u"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      ("a", "b") -> ((1L, 0.5)), ("a", "c") -> ((1L, 0.5)),
      ("b", "b") -> ((1L, 0.5)), ("b", "c") -> ((1L, 0.5))))
  }

  test("transitionMatrix: simultaneous events pair via the tiebreak") {
    val df = Seq((1L, 10L, 1L, "x"), (1L, 10L, 2L, "y"), (1L, 20L, 3L, "z"))
      .toDF("u", "ts", "id", "et")
    val out = DfOps.transitionMatrix(df, "ts", "et", Seq("u"),
      Seq(col("id")))
      .select("from_type", "to_type").as[(String, String)].collect().toSet
    assert(out === Set(("x", "y"), ("y", "z")))
  }

  test("robustOutliers: hand-computed median/MAD scores and flag") {
    // group g: values 1..5 plus a wild 100 → med 4.5? no: {1,2,3,4,5,100}
    // even count: med = (3+4)/2 = 3.5; devs {2.5,1.5,0.5,0.5,1.5,96.5}
    // → MAD = (1.5+1.5)/2 = 1.5; score(100) = 96.5/1.5 = 64.33… > 3.5
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 100.0).map(("g", _))
      .toDF("k", "v")
    val out = DfOps.robustOutliers(df, "v", Seq("k"))
      .collect().map(r => r.getDouble(1) -> (r.get(2), r.get(3))).toMap
    assert(out(100.0) === (math.rint(96.5 / 1.5 * 1e6) / 1e6, true))
    assert(out(3.0) === (math.rint(0.5 / 1.5 * 1e6) / 1e6, false))
    assert(out(1.0) === (math.rint(2.5 / 1.5 * 1e6) / 1e6, false))
  }

  test("robustOutliers: zero-MAD group yields null score and flag") {
    // >50 % identical values → MAD = 0; must NOT throw under ANSI mode
    val df = Seq(5.0, 5.0, 5.0, 9.0).map(("g", _)).toDF("k", "v")
    val rows = DfOps.robustOutliers(df, "v", Seq("k")).collect()
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("robustOutliers: one exchange feeds both percentile windows") {
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v")
    val plan = DfOps.robustOutliers(df, "v", Seq("k"))
      .queryExecution.executedPlan.toString
    assert("(?s)Exchange".r.findAllIn(plan).size === 1, plan)
  }

  test("topKPerGroup: deterministic under ties via the tiebreak column") {
    val df = Seq(("g", 10.0, 1L), ("g", 10.0, 2L), ("g", 10.0, 3L),
      ("h", 1.0, 9L)).toDF("k", "v", "id")
    val got = DfOps.topKPerGroup(df, Seq("k"),
      Seq(col("v").desc, col("id").asc), 2)
      .select("k", "id").as[(String, Long)].collect().toSet
    assert(got === Set(("g", 1L), ("g", 2L), ("h", 9L)))
  }

  test("equiDepthBins: equal-count bins in value order") {
    val df = (1 to 20).map(i => ("g", i.toDouble, i.toLong))
      .toDF("k", "v", "id")
    val out = DfOps.equiDepthBins(df, "v", Seq("k"), 4, Seq(col("id")))
      .groupBy("bin").agg(count(lit(1)).as("n"),
        min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(out === Map(1L -> ((5L, 1.0, 5.0)), 2L -> ((5L, 6.0, 10.0)),
      3L -> ((5L, 11.0, 15.0)), 4L -> ((5L, 16.0, 20.0))))
  }

  test("rangeJoin: inverted/empty intervals are dropped, never exploded") {
    val pts = Seq(5.0, 50.0).toDF("x")
    // end << start would make sequence() build a DESCENDING bucket array
    // of |span/width| entries — one corrupt row must not allocate it
    val ivs = Seq((0.0, -1.0e12, "bad"), (4.0, 6.0, "ok"), (7.0, 7.0, "empty"))
      .toDF("lo", "hi", "tag")
    val got = DfOps.rangeJoin(pts, "x", ivs, "lo", "hi", bucketWidth = 8.0)
      .select("x", "tag").collect().map(r => (r.getDouble(0), r.getString(1)))
    assert(got.toSeq === Seq((5.0, "ok")))
  }

  test("reserved temp columns are rejected loudly, not silently replaced") {
    val base = Seq((1L, 2.0)).toDF("id", "v")
    def err(body: => Any): String =
      intercept[IllegalArgumentException](body).getMessage
    assert(err(DfOps.applyJitter(base.withColumn("_jitter_noise", lit(1.0)),
      Seq("v"))).contains("_jitter_noise"))
    assert(err(DfOps.asofJoin(base.withColumn("_ord", lit(1)), base,
      "v", "v", Nil, Seq("w"))).contains("_ord"))
    assert(err(DfOps.rangeJoin(base.withColumn("_bk", lit(1)), "v",
      Seq((0.0, 1.0)).toDF("lo", "hi"), "lo", "hi", 1.0)).contains("_bk"))
    assert(err(DfOps.topKPerGroup(base.withColumn("_rn", lit(1)),
      Seq("id"), Seq(col("v")), 1)).contains("_rn"))
  }

  test("offsetByOtherColumns: empty/all-null mean propagates NaN, not NPE") {
    val df = Seq((1.0, Option.empty[Double])).toDF("t", "o")
    val out = DfOps.offsetByOtherColumns(df, "t", Seq("o"), Seq(1.0),
      reductions = Seq(Some("mean")))
      .select("t").as[Double].head()
    assert(out.isNaN)
  }

  test("mapColumns2D: rotation round trip") {
    val df = Seq((1.0, 0.0), (0.0, 1.0)).toDF("x", "y")
    val c = math.cos(0.5); val s = math.sin(0.5)
    val rot = DfOps.mapColumns2D(df, "x", "y",
      (x, y) => (lit(c) * x - lit(s) * y, lit(s) * x + lit(c) * y), "xr", "yr")
    val back = DfOps.mapColumns2D(rot, "xr", "yr",
      (x, y) => (lit(c) * x + lit(s) * y, -lit(s) * x + lit(c) * y), "xb", "yb")
    back.select("x", "y", "xb", "yb").collect().foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) < 1e-12)
      assert(math.abs(r.getDouble(1) - r.getDouble(3)) < 1e-12)
    }
  }
}
