package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning._

/** Scratch experiment harness for huge-cube histogram strategies (the
  * rows ≈ cells regime where map-side partial aggregation barely
  * combines). Times each variant at the reference's 4-D shape:
  * `SPARK_GRAFT_REFBENCH_ROWS` rows (default 1e8) into 100⁴ cells.
  *
  * Not part of the driver contract; run manually:
  * {{{ sbt "runMain graft.BinProbe A B C" }}}
  */
object BinProbe {

  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(20, Runtime.getRuntime.availableProcessors()).toString)
    val n = sys.env.getOrElse("SPARK_GRAFT_REFBENCH_ROWS", "100000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_REFBENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", cpus))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nSplits = cpus.toInt * 4
    def events: DataFrame = spark.range(0L, n, 1L, nSplits).select(
      (rand(42) * 2048.0).as("X"),
      (rand(43) * 2048.0).as("Y"),
      (rand(44) * 60000.0 + 60000.0).as("t"),
      (rand(45) * 18000.0 + 2000.0).as("ADC"))

    // "crossover" mode: sweep the cube size through [2^16, 2^22] cells and
    // time the three materialization paths histogramCube chooses between —
    // DenseHistogramAgg (per-partition dense buffers, no per-cell
    // shuffle), kernel+densify, classic+densify. The denseMaxCells
    // default came from a PRE-kernel measurement; the kernel changed the
    // sparse side's economics at >= 2^17 cells, so the routing boundary
    // needs re-measuring (this table feeds NOTES + the default).
    if (args.contains("crossover")) {
      for (bpa <- Seq(18, 22, 26, 32, 40, 48)) {
        val axes4 = Seq(
          UniformAxis("X", bpa, 0.0, 2048.0),
          UniformAxis("Y", bpa, 0.0, 2048.0),
          UniformAxis("t", bpa, 60000.0, 120000.0),
          UniformAxis("ADC", bpa, 2000.0, 20000.0))
        val cCells = axes4.map(_.nBins.toLong).product
        val paths = Seq[(String, () => Unit)](
          "dense" -> (() => { DenseHistogramAgg.denseHistogram(events, axes4); () }),
          "kernel" -> (() => { Binning.densify(
            Binning.histogram(events, axes4, plan = HistogramPlan.Kernel), axes4); () }),
          "classic" -> (() => { Binning.densify(
            Binning.histogram(events, axes4, plan = HistogramPlan.Classic), axes4); () }))
        for ((nm, run) <- paths) {
          run() // warm-up
          val times = (1 to reps).map { _ =>
            val t0 = System.nanoTime()
            run()
            (System.nanoTime() - t0) / 1e9
          }
          println(f"[crossover] bpa=$bpa%-3d cells=$cCells%-9d $nm%-8s " +
            f"min=${times.min}%.3f  " + times.map(t => f"$t%.2f").mkString(" "))
        }
      }
      spark.stop()
      return
    }

    val bpa = sys.env.getOrElse("SPARK_GRAFT_BINS_PER_AXIS", "100").toInt
    val axes = Seq(
      UniformAxis("X", bpa, 0.0, 2048.0),
      UniformAxis("Y", bpa, 0.0, 2048.0),
      UniformAxis("t", bpa, 60000.0, 120000.0),
      UniformAxis("ADC", bpa, 2000.0, 20000.0))
    val b = bpa.toLong
    val strides = Seq(b * b * b, b * b, b, 1L)
    val cells = b * b * b * b
    println(s"[binprobe] bins/axis=$bpa cells=$cells rows=$n")
    val decode = axes.zip(strides).map { case (ax, s) =>
      (expr(s"_flat div ${s}L") % ax.nBins).as(Binning.idxName(ax))
    }

    def flatDf: DataFrame =
      events.select(Binning.flatBinIndex(axes, strides).as("_flat"))
        .filter(col("_flat") >= 0)

    // A: current shipped plan (partial + final hash agg)
    def variantA(): Unit = exec(
      flatDf.groupBy(col("_flat")).agg(count(lit(1)).as("cnt"))
        .select(decode :+ col("cnt"): _*))

    // B: raw-key shuffle first; agg runs once, post-shuffle
    def variantB(): Unit = exec(
      flatDf.repartition(col("_flat"))
        .groupBy(col("_flat")).agg(count(lit(1)).as("cnt"))
        .select(decode :+ col("cnt"): _*))

    // C: span-partitioned dense accumulation (raw-key shuffle on the
    // span id, mapPartitions increments into dense long arrays)
    def variantC(): Unit = {
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val span = (cells + p - 1) / p
      val shuffled = flatDf
        .repartition(p, expr(s"_flat div ${span}L"))
        .as[Long]
      val sparse = shuffled.mapPartitions { it =>
        val acc = new java.util.HashMap[Long, Array[Long]]()
        while (it.hasNext) {
          val f = it.next()
          val sid = f / span
          var a = acc.get(sid)
          if (a == null) { a = new Array[Long](span.toInt); acc.put(sid, a) }
          a((f - sid * span).toInt) += 1L
        }
        val out = Iterator.newBuilder[(Long, Long)]
        acc.forEach { (sid, a) =>
          var i = 0
          while (i < a.length) {
            if (a(i) != 0L) out += ((sid * span + i, a(i)))
            i += 1
          }
        }
        out.result()
      }.toDF("_flat", "cnt")
      exec(sparse.select(decode :+ col("cnt"): _*))
    }

    // C2: span-dense with 16x spans per partition (balanced hash load)
    // and a direct-indexed array-of-arrays accumulator (no boxing)
    def variantC2(): Unit = {
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val nSpans = 16 * p
      val span = (cells + nSpans - 1) / nSpans
      val shuffled = flatDf
        .repartition(p, expr(s"_flat div ${span}L"))
        .as[Long]
      val sparse = shuffled.mapPartitions { it =>
        val arrs = new Array[Array[Long]](nSpans)
        while (it.hasNext) {
          val f = it.next()
          val sid = (f / span).toInt
          var a = arrs(sid)
          if (a == null) { a = new Array[Long](span.toInt); arrs(sid) = a }
          a((f - sid.toLong * span).toInt) += 1L
        }
        Iterator.range(0, nSpans).filter(arrs(_) != null).flatMap { sid =>
          val a = arrs(sid)
          Iterator.range(0, a.length).filter(a(_) != 0L)
            .map(i => (sid.toLong * span + i, a(i)))
        }
      }.toDF("_flat", "cnt")
      exec(sparse.select(decode :+ col("cnt"): _*))
    }

    // B2: raw-key shuffle + the SHIPPED primitive count kernel (what
    // HistogramPlan.RawShuffle runs — kept so the probe times product
    // code, not a drifted copy)
    def variantB2(): Unit = {
      val sparse = flatDf.repartition(col("_flat")).as[Long]
        .mapPartitions(HistogramKernel.countKeys)
        .toDF("_flat", "cnt")
      exec(sparse.select(decode :+ col("cnt"): _*))
    }

    // E: skew-safe — local open-hash combine (no shuffle), then classic
    // groupBy-sum over the pre-combined rows
    def variantE(): Unit = {
      val local = flatDf.as[Long]
        .mapPartitions(HistogramKernel.countKeys)
        .toDF("_flat", "cnt")
      exec(local.groupBy(col("_flat")).agg(sum("cnt").as("cnt"))
        .select(decode :+ col("cnt"): _*))
    }

    // E2: skew-safe, fully primitive — exactly HistogramPlan.Kernel's
    // shape, built from the shipped kernel functions
    def variantE2(): Unit = {
      val merged = flatDf.as[Long]
        .mapPartitions(HistogramKernel.countKeys)
        .repartition(col("_1"))
        .mapPartitions(HistogramKernel.mergeCounts)
        .toDF("_flat", "cnt")
      exec(merged.select(decode :+ col("cnt"): _*))
    }

    // S: scan floor — rand generation + bin index + filter, no agg at
    // all (the cost every variant pays before counting starts)
    def variantS(): Unit = exec(flatDf)

    // P: partial side only — local open-hash combine to a noop sink, no
    // exchange, no merge (K minus P ≈ exchange + final merge cost)
    def variantP(): Unit = exec(
      flatDf.as[Long].mapPartitions(HistogramKernel.countKeys).toDF("_flat", "cnt"))

    // M: two-phase with a MODULO-INTERLEAVED dense final merge — partial
    // open-hash combine as in E2, but the merge exchange keys on
    // `_flat % (16·p)` residue classes (adjacent cube cells scatter
    // across classes, so a compact physical peak spreads like hash —
    // unlike the contiguous-span C/C2 layout) and each reduce task
    // accumulates its classes into DIRECT-INDEXED dense long arrays
    // (slot = key / nClasses): no key storage, no probe chains, half
    // the memory traffic of the open-hash merge. Only valid while
    // cells/p fits a sane dense budget — a routing decision, like
    // densify's.
    def variantM(): Unit = {
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val nCls = 16 * p
      val width = ((cells + nCls - 1) / nCls).toInt
      val pre = flatDf.as[Long]
        .mapPartitions(HistogramKernel.countKeys).toDF("_flat", "cnt")
      val merged = pre.repartition(p, expr(s"_flat % ${nCls}L"))
        .as[(Long, Long)]
        .mapPartitions { it =>
          val arrs = new Array[Array[Long]](nCls)
          while (it.hasNext) {
            val kv = it.next()
            val cls = (kv._1 % nCls).toInt
            var a = arrs(cls)
            if (a == null) { a = new Array[Long](width); arrs(cls) = a }
            a((kv._1 / nCls).toInt) += kv._2
          }
          Iterator.range(0, nCls).filter(arrs(_) != null).flatMap { cls =>
            val a = arrs(cls)
            Iterator.range(0, a.length).filter(a(_) != 0L)
              .map(i => (i.toLong * nCls + cls, a(i)))
          }
        }.toDF("_flat", "cnt")
      exec(merged.select(decode :+ col("cnt"): _*))
    }

    // D: like A but with 4x shuffle partitions (smaller final maps)
    def variantD(): Unit = {
      val p = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", (p.toInt * 4).toString)
      try variantA() finally spark.conf.set("spark.sql.shuffle.partitions", p)
    }

    // product paths (must track A / E2 / B2 above)
    def product(plan: HistogramPlan): Unit =
      exec(Binning.histogram(events, axes, plan = plan))

    // cache-resident-partial A/B: override the partial flush bound the
    // product K plan reads (spark.graft.countByKey.flushEntries) — a
    // bound ≤ ~49k keeps the partial map inside its initial 2^16 slots
    // (~1.1 MB, L2-resident) at the cost of shorter combine epochs
    sys.env.get("SPARK_GRAFT_FLUSH").foreach { f =>
      println(s"[binprobe] flushEntries override: $f")
      spark.conf.set("spark.graft.countByKey.flushEntries", f)
    }

    // "flushab": INTERLEAVED flush-bound A/B on the product kernel plan —
    // the conf is read at execution, so flipping it between reps in one
    // JVM gives both arms the same warm state and the same weather
    // (single-JVM sequential A-then-B runs here have swung ±20 % on
    // co-tenant noise, swamping the effect being measured)
    if (args.contains("flushab")) {
      val small = sys.env.getOrElse("SPARK_GRAFT_FLUSH_B", "32768")
      val arms = Seq(
        "default" -> HistogramKernel.partialFlushEntries.toString,
        s"flush=$small" -> small)
      // warm both arms (distinct codegen? same plan — one warms both)
      product(HistogramPlan.Kernel)
      val times = collection.mutable.Map.empty[String, Vector[Double]]
        .withDefaultValue(Vector.empty)
      (1 to reps).foreach { _ =>
        arms.foreach { case (nm, f) =>
          spark.conf.set("spark.graft.countByKey.flushEntries", f)
          val t0 = System.nanoTime()
          product(HistogramPlan.Kernel)
          times(nm) = times(nm) :+ (System.nanoTime() - t0) / 1e9
        }
      }
      spark.conf.unset("spark.graft.countByKey.flushEntries")
      arms.foreach { case (nm, _) =>
        val ts = times(nm)
        println(f"[flushab] $nm%-14s min=${ts.min}%.3f  " +
          ts.map(t => f"$t%.2f").mkString(" "))
      }
      spark.stop()
      return
    }

    val variants = Map[String, () => Unit](
      "A" -> (() => variantA()), "B" -> (() => variantB()),
      "C" -> (() => variantC()), "D" -> (() => variantD()),
      "C2" -> (() => variantC2()), "B2" -> (() => variantB2()),
      "E" -> (() => variantE()), "E2" -> (() => variantE2()),
      "S" -> (() => variantS()), "P" -> (() => variantP()),
      "M" -> (() => variantM()),
      "CL" -> (() => product(HistogramPlan.Classic)),
      "K" -> (() => product(HistogramPlan.Kernel)),
      "R" -> (() => product(HistogramPlan.RawShuffle)))
    val names = if (args.nonEmpty) args.toSeq else Seq("A", "B", "C")
    for (name <- names) {
      val run = variants(name)
      run() // warm-up
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[binprobe] $name min=${times.min}%.3f  " +
        times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
