package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftSparkBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.binning._
import graft.calibrate.{Delay, Energy}
import graft.dfops.DfOps

/** Round benchmark: headline workloads mirroring the reference's benchmark
  * suite (`benchmarks/benchmark_sed.py`, see BASELINE.md) plus the pipeline
  * extensions, on `SPARK_GRAFT_SF_DIR`. Prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Timing discipline: the session is warmed up (JVM + codegen) with one
  * untimed run, then each workload executes to a noop sink — `count()`
  * would let Catalyst prune the projections being measured — and the best
  * of five runs is reported, matching the reference's min-of-5
  * (`benchmark_sed.py:57`). A single-thread CPU canary (~0.03 s quiet)
  * brackets EVERY query's timed reps and the worse of each pair is
  * reported per query (`canaries`), plus a whole-suite minimum
  * (`canary_sec`): a mid-suite load spike that inflates one query then
  * visibly inflates that query's canary. The suite SELF-HEALS: queries
  * whose canary exceeds 1.3× the suite-quiet minimum re-run (≤2 rounds,
  * quietest attempt kept), a 1×-slower-than-10× reading re-runs once
  * (impossible at steady state), and anything still hot is named in the
  * artifact's `contaminated` list — so cross-round comparison needs no
  * forensics.
  */
object Bench {

  /** Force full computation of every column without collecting. */
  private def exec(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Fixed single-thread CPU-bound probe (~0.1 s quiet): measures machine
    * load, independent of Spark.
    */
  private def canary(): Double = {
    val t0 = System.nanoTime()
    var s = 0.0
    var i = 0
    while (i < 20000000) { s += java.lang.Math.sqrt(i.toDouble); i += 1 }
    if (s < 0) println(s) // defeat dead-code elimination
    (System.nanoTime() - t0) / 1e9
  }

  /** Cumulative shuffle-write bytes across all completed stages — the
    * scale-sensitivity signal: a workload whose shuffle bytes grow faster
    * than its input is the one that dies first on a cluster.
    */
  private final class ShuffleMeter extends SparkListener {
    val bytes = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // batch-search TopKAgg: keep ObjectHashAggregate in the hash path
      // for query-batch group counts (see TopKAgg scaladoc)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // single-JVM bench posture (a real cluster keeps defaults for both):
      // shuffle bytes never cross a network, so compression is pure CPU
      // cost here. AQE stays ON, same as Verify, the tests, and a real
      // cluster: a recorded min-of-5 A/B at sf0.1/32 cpus measured
      // off=2.54/2.06 s vs on=2.14/2.08 s total — a wash within noise —
      // so the round-3 off-by-default (claimed ~20 % barrier cost from a
      // min-of-2 run) did not reproduce and is reverted.
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // The driver's parquet files are written as ONE row group each, so a
    // cold scan is a single task regardless of cores. The reference
    // baseline times pure compute over in-memory synthetic arrays
    // (benchmark_sed.py:25-33) — for a like-for-like comparison the inputs
    // are repartitioned across cores and cached once, untimed. (At real
    // scale the lake has many files/row groups and scans parallelize
    // naturally; this is a bench-harness artifact only.)
    val nPart = cpus.toInt
    def load(name: String) = {
      val df = spark.read.parquet(s"$sfDir/$name.parquet").repartition(nPart).cache()
      df.count() // materialize
      df
    }
    val lineitem = load("lineitem")
    val documents = load("documents")
    val embeddings = load("embeddings")
    // A cached input breaks AQE exchange reuse in Spark 4.1 (cache query
    // stages don't canonicalize equal), which would recompute minhash's
    // shared signature exchange 4×. Feed minhash an uncached scan with an
    // explicit hash repartition — a different plan than the cached one, so
    // cache substitution doesn't re-inject it — which is also the honest
    // at-scale shape: a lake scan, not an in-memory array.
    val documentsScan = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(nPart, col("doc_id"))

    /** The reference's canonical transform chain (benchmark_sed.py:124-129):
      * jitter → momentum correction (2048² inverse-dfield bilinear lookup)
      * → momentum calibration → energy correction → energy calibration →
      * delay calibration, on the lineitem event columns. Built once: the
      * deformation grids broadcast at plan-build time, as in production.
      */
    val nGrid = 2048
    // ≈ identity + smooth warp, in detector units (x∈[0,50], y∈[0,8])
    val invD: Array[Array[Array[Double]]] = Array(
      Array.tabulate(nGrid, nGrid)((i, j) =>
        i * (50.0 / (nGrid - 1)) + 0.5 * math.sin(j / 300.0)),
      Array.tabulate(nGrid, nGrid)((i, j) =>
        j * (8.0 / (nGrid - 1)) + 0.2 * math.cos(i / 400.0)),
    )
    val workflowChain: DataFrame = {
      val j = DfOps.applyJitter(lineitem, Seq("l_quantity"), amps = Seq(0.5))
      val m = graft.calibrate.Momentum.applyDfield(spark, j, invD,
        "l_quantity", "l_linenumber", "xm", "ym", ((0.0, 50.0), (0.0, 8.0)))
      val k = graft.calibrate.Momentum.appendKAxis(m, "xm", "ym",
        "kx", "ky", rStart = 0.0, cStart = 0.0, rCenter = 25.0, cCenter = 4.0,
        rConversion = 0.01, cConversion = 0.01, rStep = 1.0, cStep = 1.0)
      val corr = Energy.applyEnergyCorrection(k, "l_extendedprice", "tm",
        Energy.Correction.spherical(_, _, 25.0, 4.0, 0.05, 100.0),
        "xm", "ym")
      val en = corr.withColumn("energy",
        Energy.tof2ev(col("tm"), 1.0e6, 100.0, 2.0, 0, "kinetic", 0.5))
      Delay.appendDelayAxis(en, "l_discount", "delay",
        adcRange = (0.0, 0.11), delayRange = Some((-2.0, 2.0)))
    }

    val axEnergy = UniformAxis("energy", 1000, 0.5, 1.5)
    val ax4dWf = Seq(
      UniformAxis("kx", 100, -0.3, 0.3),
      UniformAxis("ky", 100, -0.06, 0.06),
      UniformAxis("energy", 100, 0.5, 1.5),
      UniformAxis("delay", 100, -2.0, 2.1),
    )

    // D10 inverse-field generation (reference inv_dfield baseline: 2048²
    // target grid) — driver-side numerics; forward field built once, untimed
    val fwdR = Array.tabulate(nGrid, nGrid)((r, c) => r + 5.0 * math.sin(c / 200.0))
    val fwdC = Array.tabulate(nGrid, nGrid)((r, c) => c + 3.0 * math.cos(r / 150.0))

    val workloads: Seq[(String, () => Unit)] = Seq(
      // reference binning_1d: 1-D histogram, 1000 bins — dense-aggregate
      // fast path, materialized like the reference's cube
      "binning_1d" -> (() => Binning.histogramCube(lineitem,
        Seq(UniformAxis("l_extendedprice", 1000, 900.0, 105000.0)))),
      // reference binning_4d: 4-D histogram, 100 bins per axis
      "binning_4d" -> (() => exec(Binning.histogram(lineitem, Seq(
        UniformAxis("l_quantity", 100, 1.0, 50.0),
        UniformAxis("l_extendedprice", 100, 900.0, 105000.0),
        UniformAxis("l_discount", 100, 0.0, 0.11),
        UniformAxis("l_tax", 100, 0.0, 0.09))))),
      // reference workflow_1d: full transform chain + 1-D energy histogram
      "workflow_1d" -> (() => Binning.histogramCube(workflowChain, Seq(axEnergy))),
      // reference workflow_4d: chain + 4-D (kx, ky, energy, delay) histogram
      "workflow_4d" -> (() => exec(Binning.histogram(workflowChain, ax4dWf))),
      // reference inv_dfield: D10 scattered-interpolation field inversion
      "inv_dfield" -> (() => {
        graft.fit.Fields.invertField(fwdR, fwdC, nGrid, nGrid,
          ((0.0, nGrid - 1.0), (0.0, nGrid - 1.0)))
        ()
      }),
      // pipeline extensions at the same scale factor
      "dedup_exact" -> (() => exec(pipeline.Dedup.exactDuplicates(
        documents, "text", "doc_id"))),
      "dedup_minhash" -> (() => exec(pipeline.Dedup.minhashNearDuplicates(
        documentsScan, "text", "doc_id", threshold = 0.5))),
      // the SHIPPED default: Curation routes near-dup through the census
      // auto-plan — benched beside the pinned default plan above so the
      // artifact measures what users actually run (census cost included)
      "dedup_minhash_auto" -> (() => exec(pipeline.Dedup.minhashNearDuplicatesAuto(
        documentsScan, "text", "doc_id", threshold = 0.5))),
      "ann_brute_topk" -> (() => {
        val q = embeddings.filter(col("vec_id") === 0).select("embedding")
          .first().getSeq[Float](0).map(_.toDouble).toArray
        exec(pipeline.Similarity.bruteForceTopK(embeddings, "embedding", "vec_id", q, 10))
      }),
      "text_quality" -> (() => exec(pipeline.TextOps.qualityColumns(
        documents, "text"))),
    )

    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    /** Shuffle-write bytes generated by one execution of `run`, read after
      * draining the async listener bus.
      */
    def shuffleDelta(run: () => Unit): Long = {
      GraftSparkBridge.drainListeners(spark.sparkContext)
      val before = meter.bytes.get()
      run()
      GraftSparkBridge.drainListeners(spark.sparkContext)
      meter.bytes.get() - before
    }

    /** Warm-up + min-of-`reps` timing + per-query canary bracket + one
      * metered rep for shuffle bytes. Returns (minSec, canarySec, shuffleMB).
      */
    def timeOne(name: String, run: () => Unit, reps: Int): (Double, Double, Double) = {
      // per-workload untimed warm-up: whole-stage-codegen class generation
      // and its C2 compilation happen per distinct plan
      try run()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val cBefore = canary()
      val shuffled = shuffleDelta(() =>
        try run()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") })
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try run()
        catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
        (System.nanoTime() - t0) / 1e9
      }
      val cAfter = canary()
      (times.min, math.max(cBefore, cAfter), shuffled / 1e6)
    }

    /** Self-healing suite run: canary pairs bracket every query's timed
      * reps; any query whose canary exceeds 1.3× the suite-quiet minimum
      * (a mid-suite load spike landed on it) is RE-RUN, up to `retries`
      * rounds, keeping the quietest attempt. Queries still hot after the
      * retries are reported in `contaminated` — so a committed artifact
      * either carries clean numbers or names exactly which ones aren't,
      * and cross-round comparison needs no forensics.
      */
    def runSuite(
        ws: Seq[(String, () => Unit)], reps: Int, retries: Int = 2,
    ): (Seq[(String, Double, Double, Double)], Seq[String], Map[String, Int]) = {
      var rs = ws.map { case (name, run) =>
        val (sec, can, mb) = timeOne(name, run, reps)
        (name, sec, can, mb)
      }
      val byName = ws.toMap
      // per-query re-measurement counts: a best-of retry can silently mask
      // a load-correlated regression across rounds, so the artifact names
      // every re-measured query (ADVICE r9) — a reader comparing rounds
      // knows which numbers are first-attempt and which aren't
      val retried = collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      for (_ <- 1 to retries) {
        val quiet = rs.map(_._3).min
        rs = rs.map { case q @ (name, _, can, _) =>
          if (can > 1.3 * quiet) {
            retried(name) += 1
            val (sec2, can2, mb2) = timeOne(name, byName(name), reps)
            if (can2 < can) (name, sec2, can2, mb2) else q
          } else q
        }
      }
      val quiet = rs.map(_._3).min
      (rs, rs.filter(_._3 > 1.3 * quiet).map(_._1), retried.toMap)
    }

    val canaryBefore = canary()
    var (results, _, retried1xCanary) = runSuite(workloads, reps = 5)
    val retried1x = collection.mutable.Map.empty[String, Int]
      .withDefaultValue(0)
    retried1xCanary.foreach { case (k, v) => retried1x(k) += v }
    val canarySec = math.min(canaryBefore, canary())

    // ---- 10× weak-scaling leg ----------------------------------------
    // The sf0.1 numbers are sub-second — small enough that fixed costs
    // dominate and a scaling cliff can hide. Inflate the inputs 10× into
    // a temp lake (≈ sf1 row counts), re-run the data-bound headline
    // workloads, and record per-query seconds + shuffle bytes next to the
    // 1× numbers: a workload is cluster-safe when sec and shuffle MB grow
    // ≲ linearly with rows. Document copies are Caesar-shifted per copy so
    // cross-copy shingles differ — near-dup output mass stays linear in
    // rows (identical copies would grow it quadratically and the bench
    // would measure output explosion, not throughput).
    val x10 = sys.env.getOrElse("SPARK_GRAFT_X10", "true").toBoolean
    val (x10Results, x10Contaminated, x10Retried): (Seq[(String, Double, Double, Double)], Seq[String], Map[String, Int]) = if (!x10) (Seq.empty, Seq.empty, Map.empty[String, Int]) else {
      val dir = java.nio.file.Files.createTempDirectory("graft_bench_x10").toString
      val copies = explode(sequence(lit(0), lit(9))).as("copy")
      lineitem
        .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), col("l_linenumber"))
        .select(col("*"), copies).drop("copy")
        .repartition(nPart)
        .write.mode("overwrite").parquet(s"$dir/lineitem")
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      documentsScan
        .select(col("doc_id"), col("text"), copies)
        .select(
          (col("doc_id") + col("copy") * lit(10000000L)).as("doc_id"),
          element_at(
            array((0 until 10).map(k =>
              translate(col("text"), alpha, alpha.drop(k) + alpha.take(k))): _*),
            col("copy") + 1).as("text"))
        .repartition(nPart, col("doc_id"))
        .write.mode("overwrite").parquet(s"$dir/documents")
      embeddings
        .select(col("vec_id"), col("embedding"), copies)
        .select((col("vec_id") + col("copy") * lit(10000000L)).as("vec_id"),
          col("embedding"))
        .repartition(nPart)
        .write.mode("overwrite").parquet(s"$dir/embeddings")

      val liX = spark.read.parquet(s"$dir/lineitem").cache()
      liX.count()
      val docXScan = spark.read.parquet(s"$dir/documents")
        .repartition(nPart, col("doc_id"))
      val embX = spark.read.parquet(s"$dir/embeddings").cache()
      embX.count()

      val chainX: DataFrame = {
        val j = DfOps.applyJitter(liX, Seq("l_quantity"), amps = Seq(0.5))
        val m = graft.calibrate.Momentum.applyDfield(spark, j, invD,
          "l_quantity", "l_linenumber", "xm", "ym", ((0.0, 50.0), (0.0, 8.0)))
        val k = graft.calibrate.Momentum.appendKAxis(m, "xm", "ym",
          "kx", "ky", rStart = 0.0, cStart = 0.0, rCenter = 25.0, cCenter = 4.0,
          rConversion = 0.01, cConversion = 0.01, rStep = 1.0, cStep = 1.0)
        val corr = Energy.applyEnergyCorrection(k, "l_extendedprice", "tm",
          Energy.Correction.spherical(_, _, 25.0, 4.0, 0.05, 100.0),
          "xm", "ym")
        val en = corr.withColumn("energy",
          Energy.tof2ev(col("tm"), 1.0e6, 100.0, 2.0, 0, "kinetic", 0.5))
        Delay.appendDelayAxis(en, "l_discount", "delay",
          adcRange = (0.0, 0.11), delayRange = Some((-2.0, 2.0)))
      }
      val x10Workloads: Seq[(String, () => Unit)] = Seq(
        "binning_1d" -> (() => Binning.histogramCube(liX,
          Seq(UniformAxis("l_extendedprice", 1000, 900.0, 105000.0)))),
        "binning_4d" -> (() => exec(Binning.histogram(liX, Seq(
          UniformAxis("l_quantity", 100, 1.0, 50.0),
          UniformAxis("l_extendedprice", 100, 900.0, 105000.0),
          UniformAxis("l_discount", 100, 0.0, 0.11),
          UniformAxis("l_tax", 100, 0.0, 0.09))))),
        "workflow_1d" -> (() => Binning.histogramCube(chainX, Seq(axEnergy))),
        "workflow_4d" -> (() => exec(Binning.histogram(chainX, ax4dWf))),
        "dedup_exact" -> (() => exec(pipeline.Dedup.exactDuplicates(
          docXScan, "text", "doc_id"))),
        "dedup_minhash" -> (() => exec(pipeline.Dedup.minhashNearDuplicates(
          docXScan, "text", "doc_id", threshold = 0.5))),
        "dedup_minhash_auto" -> (() => exec(pipeline.Dedup.minhashNearDuplicatesAuto(
          docXScan, "text", "doc_id", threshold = 0.5))),
        "ann_brute_topk" -> (() => {
          val q = embX.filter(col("vec_id") === 0).select("embedding")
            .first().getSeq[Float](0).map(_.toDouble).toArray
          exec(pipeline.Similarity.bruteForceTopK(embX, "embedding", "vec_id", q, 10))
        }),
        "text_quality" -> (() => exec(pipeline.TextOps.qualityColumns(
          docXScan, "text"))),
      )
      val out = runSuite(x10Workloads, reps = 3)
      liX.unpersist(); embX.unpersist()
      try {
        import scala.reflect.io.Directory
        new Directory(new java.io.File(dir)).deleteRecursively()
      } catch { case _: Throwable => () }
      out
    }

    // cross-leg sanity: a query CANNOT be meaningfully slower at 1× than
    // at 10× rows in steady state — if the 1× leg reads >15% slower, its
    // run was contaminated in a way the canaries missed (e.g. a spike
    // inside the timed reps with quiet brackets); re-run the 1×
    // measurement once and keep the faster of the two. The 15% band
    // exists because fixed-cost-dominated queries (top-k over cached
    // input, small cubes) time ~equal in both legs and run-to-run noise
    // flips the sign — only real inversions (r8's 0.53 s vs 0.149 s was
    // 3.5×) warrant a retry.
    if (x10Results.nonEmpty) {
      val x10ByName = x10Results.map(r => r._1 -> r._2).toMap
      val byName = workloads.toMap
      results = results.map { case q @ (name, sec, _, _) =>
        x10ByName.get(name) match {
          case Some(sec10) if sec > 1.15 * sec10 =>
            retried1x(name) += 1
            val (sec2, can2, mb2) = timeOne(name, byName(name), reps = 5)
            if (sec2 < sec) (name, sec2, can2, mb2) else q
          case _ => q
        }
      }
    }
    // the published contamination names must describe the FINAL numbers —
    // recompute after the cross-leg pass may have replaced entries
    val contaminated1x = {
      val quiet = results.map(_._3).min
      results.filter(_._3 > 1.3 * quiet).map(_._1)
    }

    def jmap(rs: Seq[(String, Double, Double, Double)], f: ((String, Double, Double, Double)) => Double): String =
      rs.map { r => "\"" + r._1 + "\":" + f(r) }.mkString("{", ",", "}")
    val qs = jmap(results, _._2)
    val cs = jmap(results, _._3)
    val mbs = jmap(results, _._4)
    val total = results.map(_._2).sum
    def jlist(names: Seq[String]): String =
      names.map("\"" + _ + "\"").mkString("[", ",", "]")
    def jretries(m: Map[String, Int]): String =
      m.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    val x10Part = if (x10Results.isEmpty) "" else {
      val t10 = x10Results.map(_._2).sum
      s""","x10":{"rows_factor":10,"total_sec":$t10,"queries":${jmap(x10Results, _._2)},"canaries":${jmap(x10Results, _._3)},"shuffle_mb":${jmap(x10Results, _._4)},"contaminated":${jlist(x10Contaminated)},"retried":${jretries(x10Retried)}}"""
    }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"canary_sec":$canarySec,"canaries":$cs,"shuffle_mb":$mbs,"contaminated":${jlist(contaminated1x)},"retried":${jretries(retried1x.toMap)}$x10Part,"sf":"$sfDir"}""")
    spark.stop()
  }
}
