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

    // D: like A but with 4x shuffle partitions (smaller final maps)
    def variantD(): Unit = {
      val p = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", (p.toInt * 4).toString)
      try variantA() finally spark.conf.set("spark.sql.shuffle.partitions", p)
    }

    // product paths (must track A / E2 / B2 above)
    def product(plan: HistogramPlan): Unit =
      exec(Binning.histogram(events, axes, plan = plan))

    val variants = Map[String, () => Unit](
      "A" -> (() => variantA()), "B" -> (() => variantB()),
      "C" -> (() => variantC()), "D" -> (() => variantD()),
      "C2" -> (() => variantC2()), "B2" -> (() => variantB2()),
      "E" -> (() => variantE()), "E2" -> (() => variantE2()),
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
