package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility (like BenchProf/TimeProbe): scaling-shape probe for the
  * heavy pipeline operators. Inflates the sf0.1 documents table by
  * 1×/4×/16× with NEAR-DUPLICATE copies (distinct ids, one extra token
  * per copy — a worst-realistic case for dedup: every document sits in
  * an f-clique), then times the operators whose cost could in principle
  * grow super-linearly. Read the per-factor timings for the cliff: a
  * healthy operator scales ~linearly in rows (pair outputs scale with
  * true duplicate mass, which here grows ~f² by construction — the
  * output row count is printed so the two effects can be separated).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    // "pairs64" mode: the pair-mass family only (minhash / fuzzy /
    // warc_html / zipf) pushed to ×64 — the rehearsal that catches a
    // super-linear exchange or a native-resource leak before the gate does
    val pairs64 = args.contains("pairs64")
    val base = spark.read.parquet(s"$dir/documents.parquet")

    def inflate(f: Int): DataFrame =
      base
        .withColumn("copy", explode(sequence(lit(0), lit(f - 1))))
        .withColumn("doc_id", col("doc_id") * 64 + col("copy"))
        .withColumn("text",
          concat_ws(" ", col("text"), concat(lit("tail"), col("copy"))))
        .drop("copy")

    // shuffle-write bytes per step (same metering as Bench): a probe that
    // only reports seconds can hide an exchange that grows super-linearly
    // but stays CPU-cheap at this scale
    val meter = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          meter.addAndGet(
            sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      })

    def timed(name: String, f: Int)(run: => Long): Unit = {
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      val before = meter.get()
      val t0 = System.nanoTime()
      val rows = run
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftSparkBridge.drainListeners(spark.sparkContext)
      val mb = (meter.get() - before) / 1e6
      println(f"SCALE $name%-16s x$f%-3d $sec%8.2f s  rows=$rows%-12d shuffle=$mb%10.2f MB")
    }

    if (pairs64) {
      val factors = sys.env.get("SPARK_GRAFT_FACTORS")
        .map(_.split(",").map(_.trim.toInt).toSeq).getOrElse(Seq(1, 4, 16, 64))
      factors.foreach { f =>
        val df = inflate(f).cache()
        val n = df.count()
        println(s"-- factor $f: $n docs --")
        timed("minhash_pairs", f)(
          pipeline.Dedup.minhashNearDuplicates(df, "text", "doc_id",
            threshold = 0.7).count())
        timed("minhash_inline", f)(
          pipeline.Dedup.minhashNearDuplicates(df, "text", "doc_id",
            threshold = 0.7, inlineVerify = true).count())
        // census-routed plan (the user-facing default in Curation): must
        // track the inline numbers on this clique corpus — census cost
        // included in the timing
        timed("minhash_auto", f)(
          pipeline.Dedup.minhashNearDuplicatesAuto(df, "text", "doc_id",
            threshold = 0.7).count())
        timed("fuzzy_pairs", f)(
          pipeline.Fuzzy.editSimilarityPairs(
            df.withColumn("t40", substring(col("text"), 1, 40)),
            "doc_id", "t40", "source", maxEdit = 8).count())
        timed("warc_html", f) {
          import spark.implicits._
          val blobs = df.select(col("doc_id"), col("text"))
            .repartition(cpus)
            .as[(Long, String)].map { case (id, text) =>
              val html = s"<html><head><title>D$id</title></head><body><h1>" +
                s"D$id</h1><p>${Option(text).getOrElse("")}</p></body></html>"
              (id, pipeline.Warc.encodeBlob(Seq(pipeline.Warc.responseRecord(
                s"https://ex.com/$id", "d", html)), gzipPerRecord = true))
            }.toDF("doc_id", "warc")
          pipeline.Warc.responses(blobs, "warc")
            .select(pipeline.Html.extractText(col("body"))).count()
        }
        // zipf: vocab grows ~linearly in rows (one unique token per
        // doc-copy) — the keyless-window regression this guards against
        // would funnel the whole vocab through one task
        timed("zipf", f)(
          pipeline.TextOps.zipfProfile(
            df.withColumn("text",
              concat_ws(" ", col("text"), concat(lit("uniq"), col("doc_id")))),
            "text").count())
        df.unpersist()
      }
      spark.stop()
      return
    }

    Seq(1, 4, 16).foreach { f =>
      val df = inflate(f).cache()
      val n = df.count()
      println(s"-- factor $f: $n docs --")
      timed("exact_dup", f)(
        pipeline.Dedup.exactDuplicates(df, "text", "doc_id").count())
      timed("minhash_pairs", f)(
        pipeline.Dedup.minhashNearDuplicates(df, "text", "doc_id",
          threshold = 0.7).count())
      timed("dedup_drop", f)(
        pipeline.Dedup.dropNearDuplicates(df, "text", "doc_id",
          threshold = 0.7).count())
      timed("dsir_weights", f)(
        pipeline.Dsir.importanceWeights(df, "doc_id", "text",
          col("source") === "src0").count())
      timed("domain_kl", f)(
        pipeline.Drift.domainDivergence(df, "text", "source").count())
      timed("dup_passages", f)(
        pipeline.Dedup.duplicatePassages(df, "doc_id", "text").count())
      // fuzzy pairs: near-dup copies differ by one appended token
      // (edit distance ≈ 6) — maxEdit 8 keeps copies inside the
      // threshold, so true-pair mass again grows ~f² while candidate
      // generation must stay band-bounded
      timed("fuzzy_pairs", f)(
        pipeline.Fuzzy.editSimilarityPairs(
          df.withColumn("t40", substring(col("text"), 1, 40)),
          "doc_id", "t40", "source", maxEdit = 8).count())
      timed("para_dedup", f)(
        pipeline.Dedup.dropRepeatedParagraphs(
          df.withColumn("text", translate(col("text"), " ", "\n")),
          "text", "doc_id").count())
      timed("url_parse", f)(
        pipeline.UrlOps.urlColumns(
          df.withColumn("url", concat(lit("https://h"),
            col("doc_id") % 1000, lit(".example.com/a/b?id="),
            col("doc_id"), lit("&utm_source=x"))), "url").count())
      // crawl chain: synthesize a WARC blob per doc (gzip members), then
      // records→HTTP→HTML→text — all map-side; must scale linearly
      timed("warc_html", f) {
        import spark.implicits._
        // the inflated frame inherits the base parquet's few partitions;
        // spread the CPU-bound gzip/parse work across the cores (a real
        // crawl lake arrives as one partition per WARC file)
        val blobs = df.select(col("doc_id"), col("text"))
          .repartition(cpus)
          .as[(Long, String)].map { case (id, text) =>
            val html = s"<html><head><title>D$id</title></head><body><h1>" +
              s"D$id</h1><p>${Option(text).getOrElse("")}</p></body></html>"
            (id, pipeline.Warc.encodeBlob(Seq(pipeline.Warc.responseRecord(
              s"https://ex.com/$id", "d", html)), gzipPerRecord = true))
          }.toDF("doc_id", "warc")
        pipeline.Warc.responses(blobs, "warc")
          .select(pipeline.Html.extractText(col("body"))).count()
      }
      // robots filter: rules per domain (|domains| tiny), corpus-keyed agg
      timed("robots", f) {
        val urls = df.select(col("doc_id"),
          concat(col("source"), lit(".com")).as("domain"),
          expr("repeat('/seg', int(doc_id % 4))").as("path"))
        val robots = urls.select("domain").distinct().withColumn("robots",
          lit("User-agent: *\nDisallow: /seg/seg\nAllow: /seg/seg/seg\n"))
        pipeline.Robots.filterAllowed(urls, "domain", "path",
          pipeline.Robots.rules(robots, "robots")).count()
      }
      df.unpersist()
    }
    // graph scaling: synthetic power-law-ish edges from the events table,
    // scaled by edge-set replication (node space grows with the factor)
    val ev = spark.read.parquet(s"$dir/events.parquet")
    Seq(1, 4, 16).foreach { f =>
      val edges = ev.withColumn("copy", explode(sequence(lit(0), lit(f - 1))))
        .select(((col("user_id") + col("copy") * 1000) % lit(200 * f)).as("src"),
          ((col("event_id") + col("copy") * 77) % lit(200 * f)).as("dst"))
      val t0 = System.nanoTime()
      val n = pipeline.Graph.pageRank(edges, "src", "dst", iterations = 5).count()
      println(f"SCALE pagerank5        x$f%-3d ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    spark.stop()
  }
}
