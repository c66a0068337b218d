package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Persistable IVF (inverted-file) ANN index over an embedding column.
  *
  * [[Similarity.ivfTopK]] answers ONE driver-side query against an
  * in-flight DataFrame; this is the lake form of the same idea, shaped
  * for the two things a 100-TB corpus actually needs:
  *
  *   - '''Build once, probe many''': [[build]] writes the centroid table
  *     plus a postings lake ''partitioned by'' `list_id`. A search then
  *     prunes at the FILE level — Spark's partition pruning turns
  *     `list_id IN (probes)` into "read only those directories", so a
  *     search touches `nProbe / nLists` of the corpus bytes, not a
  *     full scan with a residual filter.
  *   - '''Batch search''': [[searchAll]] answers a whole DataFrame of
  *     queries in one plan — each query routes to its `nProbe` probe
  *     lists via the broadcast [[NearestCentroidsExpr]] (map-side), the
  *     probe→postings equi-join is the only corpus shuffle (and under
  *     AQE the small query side broadcasts, so the corpus often never
  *     shuffles at all), and the per-query top-k is one keyed window
  *     over candidates only (`nProbe` lists × queries, never the
  *     corpus). This is the retrieval / decontamination-at-scale shape:
  *     millions of queries, one pass.
  *
  * Reference scope note: the reference engine has no ANN surface; this
  * family is part of the training-data-pipeline brief. Centroids come
  * from [[KMeans.fit]] (or any seed strategy); ties and probe order
  * follow [[Similarity.ivfTopK]] exactly (parity-tested).
  */
object Ivf {

  /** Write the index: `dir/centroids` (list_id, centroid) and
    * `dir/postings` parquet partitioned by `list_id` carrying
    * `(idCol, vecCol, carryCols…)`. Returns the postings row count.
    */
  def build(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      dir: String,
      carryCols: Seq[String] = Seq.empty,
      pqModel: Option[Pq.Model] = None,
  ): Long = {
    val spark = df.sparkSession
    import spark.implicits._
    centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("list_id", "centroid")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/centroids")
    // with a PQ model the lake stores m-int codes, not float vectors —
    // the 100-TB storage shape; searchAllPq(preEncoded) reads it back
    val filtered = df.filter(col(vecCol).isNotNull)
    val payload: Seq[Column] = pqModel match {
      case Some(m) => Seq(Pq.encodeColumn(filtered, vecCol, m).as("pq_code"))
      case None => Seq(col(vecCol))
    }
    val cols = (col(idCol) +: payload) ++ carryCols.map(col) :+
      KMeans.assign(filtered, vecCol, centroids).as("list_id")
    val postings = filtered.select(cols: _*)
    postings.write.mode("overwrite").partitionBy("list_id")
      .parquet(s"$dir/postings")
    // count the INPUT, not the lake we just wrote — same number, and at
    // scale a full postings re-read is exactly what an index build must
    // not add
    filtered.count()
  }

  /** Incrementally add vectors to an on-disk index: new postings are
    * assigned against the STORED centroids and appended into their
    * `list_id` partition directories — the indexed corpus is never
    * re-read. Centroids are immutable (re-training is a rebuild, by
    * design: IVF recall depends on assignments matching the quantizer
    * they were made with). Disjoint-id contract as
    * [[TextIndex.merge]]. Returns the number of postings APPENDED (a
    * total would cost a full index re-read — the thing a merge exists
    * to avoid).
    */
  def merge(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dir: String,
      carryCols: Seq[String] = Seq.empty,
      pqModel: Option[Pq.Model] = None,
  ): Long = {
    val spark = df.sparkSession
    val centroids = loadCentroids(spark, dir)
    val filtered = df.filter(col(vecCol).isNotNull)
    val payload: Seq[Column] = pqModel match {
      case Some(m) => Seq(Pq.encodeColumn(filtered, vecCol, m).as("pq_code"))
      case None => Seq(col(vecCol))
    }
    val cols = (col(idCol) +: payload) ++ carryCols.map(col) :+
      KMeans.assign(filtered, vecCol, centroids).as("list_id")
    val delta = filtered.select(cols: _*)
    // schema guard (footer-only read): appending a vector payload into a
    // codes-only lake (or vice versa) would silently produce rows that
    // never rank in search — fail loudly instead
    val stored = spark.read.parquet(s"$dir/postings").schema.fieldNames.toSet
    require(delta.schema.fieldNames.toSet == stored,
      s"merge payload ${delta.schema.fieldNames.sorted.mkString(",")} does " +
        s"not match the stored postings ${stored.toSeq.sorted.mkString(",")} — " +
        "build and merge must use the same pqModel/carryCols")
    delta.write.mode("append").partitionBy("list_id")
      .parquet(s"$dir/postings")
    // delta count only — an incremental merge must not re-read the index
    filtered.count()
  }

  /** The centroid-count scale rule, encoded (not folklore): `k ≈ √N`,
    * clamped to `[min, max]`. The ×64 `index64` rehearsal measured why a
    * FIXED list count cliffs: postings-list length grows with the corpus,
    * so batch-search candidate mass grows `corpus × queries = f²`
    * (422 s at ×64) — while `√N` lists hold per-query fan-out at
    * `N/k ≈ √N` and total batch work at `f^1.5` (43 s). The `max` clamp
    * bounds the routing cost ([[NearestCentroidsExpr]] is `O(k·dim)` per
    * vector) and the centroid broadcast (`k·dim` doubles).
    */
  def suggestedCentroids(
      corpusSize: Long, min: Int = 16, max: Int = 1 << 16): Int =
    math.min(max.toLong, math.max(min.toLong,
      math.round(math.sqrt(math.max(corpusSize, 0L).toDouble)))).toInt

  /** The probe-count scale rule, encoded (not folklore): `nProbe ≈
    * √nLists`, floored at 1 — FAISS-practice for IVF probe budgets.
    * With `k ≈ √N` lists (see [[suggestedCentroids]]) a probe costs
    * ~√N candidate rows, so √nLists probes cost ~N^0.75 per query —
    * sublinear in the corpus — while probing a vanishing FRACTION
    * (√nLists / nLists → 0) of the lists. The round-11 `recall64`
    * rehearsal (NOTES.md) records the measured recall@10 ladder across
    * nProbe ∈ {1,2,4,8,√nLists} at ×1..×16: on clustered corpora the
    * curve knees early; on the synthetic near-uniform embeddings (the
    * adversarial case for any inverted file) recall climbs smoothly
    * with probed mass, and √nLists is the cost-bounded compromise the
    * table lets users tune from — more probes for recall, fewer for
    * latency, `nLists` for the exhaustive recall≡1.0 bound
    * (spec-pinned).
    */
  def suggestedProbes(nLists: Int, min: Int = 1): Int =
    math.max(min, math.round(math.sqrt(math.max(nLists, 0).toDouble)).toInt)

  /** [[build]] with the list count chosen from data — the auto form
    * mirroring [[Dedup.minhashNearDuplicatesAuto]]: counts the corpus,
    * picks `k = `[[suggestedCentroids]]`(n)`, fits centroids on a bounded
    * driver-side sample (`max(2000, 4k)` vectors — k-proportional so
    * every list seeds), and writes the index. Costs one extra corpus
    * count over [[build]]. Returns `(centroids, postingsCount)` so
    * callers feed [[searchAll]] without re-reading `dir/centroids`.
    */
  def buildAuto(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      dir: String,
      carryCols: Seq[String] = Seq.empty,
      pqModel: Option[Pq.Model] = None,
      iters: Int = 5,
      minLists: Int = 16,
      maxLists: Int = 1 << 16,
  ): (Array[Array[Double]], Long) = {
    val n = df.filter(col(vecCol).isNotNull).count()
    val k = suggestedCentroids(n, minLists, maxLists)
    val cents = Similarity.kmeansCentroids(df, vecCol, idCol, k,
      iters = iters, sampleN = math.max(2000, 4 * k))
    (cents, build(df, vecCol, idCol, cents, dir, carryCols, pqModel))
  }

  /** Load the centroid matrix back (k rows — bounded driver state). */
  def loadCentroids(spark: SparkSession, dir: String): Array[Array[Double]] =
    spark.read.parquet(s"$dir/centroids")
      .orderBy("list_id")
      .collect()
      .map(_.getSeq[Double](1).toArray)

  /** The `nProbe` list ids nearest to `query` (ascending distance, ties
    * to the lower id — same rule as [[Similarity.ivfTopK]]).
    */
  def probeLists(query: Array[Double], centroids: Array[Array[Double]],
      nProbe: Int): Seq[Int] =
    centroids.indices
      .sortBy { c =>
        val ctr = centroids(c)
        var s = 0.0
        var i = 0
        while (i < ctr.length) { val d = query(i) - ctr(i); s += d * d; i += 1 }
        (s, c)
      }
      .take(nProbe)

  /** Single-query search against the on-lake index. The `list_id IN`
    * predicate is a partition filter: only the probed directories are
    * read (spec-pinned via the scan's partition count). `nProbe` keeps
    * a small fixed default here (one driver-side query is latency-bound,
    * not exchange-bound); see [[suggestedProbes]] for the recall-backed
    * budget rule the batch forms default to.
    */
  def search(
      spark: SparkSession,
      dir: String,
      query: Array[Double],
      k: Int,
      nProbe: Int = 2,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
  ): DataFrame = {
    val centroids = loadCentroids(spark, dir)
    val probes = probeLists(query, centroids, nProbe)
    val postings = spark.read.parquet(s"$dir/postings")
    require(postings.schema.fieldNames.contains(vecCol),
      s"postings lake at $dir holds no '$vecCol' column — a codes-only " +
        "(pqModel) index answers queries via searchAllPq(preEncoded = true)")
    postings
      .filter(col("list_id").isin(probes: _*))
      .select(col(idCol),
        round(Dedup.cosine(col(vecCol), lit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Batch search: per-query cosine top-k over the probed lists only.
    * `corpus` may be raw (assigned on the fly) or a postings frame that
    * already carries `list_id` (pass `preAssigned = true` to skip the
    * assignment pass — the loaded-index path).
    *
    * Output: `(qIdCol, idCol, cos)`, `cos` rounded to 6, ranked by the
    * rounded value then `idCol` (mirrors [[Similarity.ivfTopK]]).
    *
    * Plan shape at scale: the routed query batch BROADCASTS onto the
    * posted corpus (the corpus — the f-growing side — never shuffles;
    * candidates form map-side), and the per-query ranking is a
    * [[TopKAgg]] heap whose partial phase caps the only exchange at
    * `partitions × queries × k` rows — the window form it replaced
    * shuffled the full candidate fan-out (queries × nProbe × list size,
    * the f² quantity the `index64` rehearsal measures). Query batches
    * are assumed broadcast-sized (`broadcastQueries = true` ships
    * `queries × nProbe` rows WITH their vectors to every executor — past
    * autoBroadcastJoinThreshold-scale row counts that is broadcast/driver
    * memory pressure); pass `broadcastQueries = false` for a mega-batch
    * (the routed side then shuffles on `list_id` instead — same output,
    * [[TextIndex.searchAll]]'s escape hatch). On a real batch, raise the
    * ObjectHashAggregate fallback threshold first —
    * [[TopKAgg.tuneForBatchSearch]] — or the rank heap silently degrades
    * to sort-based aggregation past 128 query groups per task.
    *
    * `nProbe` defaults to the encoded [[suggestedProbes]] rule
    * (√nLists — the measured recall knee).
    */
  def searchAll(
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      k: Int,
      nProbe: Int = -1,
      preAssigned: Boolean = false,
      broadcastQueries: Boolean = true,
  ): DataFrame = {
    // -1 is the ONLY auto sentinel: a dynamically computed nProbe that
    // underflows to 0 must fail loudly, not silently probe √nLists
    require(nProbe == -1 || nProbe >= 1,
      s"nProbe must be >= 1 (or -1 for the suggestedProbes default), got $nProbe")
    val probes = if (nProbe > 0) nProbe else suggestedProbes(centroids.length)
    val posted =
      if (preAssigned) corpus.select(col(idCol), col(vecCol), col("list_id"))
      else corpus.filter(col(vecCol).isNotNull).select(col(idCol), col(vecCol),
        KMeans.assign(corpus, vecCol, centroids).as("list_id"))
    val routed = queries.select(col(qIdCol), col(qVecCol),
      explode(KMeans.assignK(queries, qVecCol, centroids, probes)).as("_probe"))
    val cand = (if (broadcastQueries) broadcast(routed) else routed)
      .join(posted, routed("_probe") === posted("list_id"))
    val scored = cand.select(col(qIdCol), col(idCol),
      round(Dedup.cosine(col(qVecCol), col(vecCol)), 6).as("cos"))
    TopKAgg.rankTopK(scored, qIdCol, idCol, "cos", k)
  }

  /** Batch IVF-PQ search — [[searchAll]]'s routing with [[Pq]] ADC
    * distances instead of exact cosines: the probed candidates carry
    * only their m-byte codes, so the corpus side of the join ships
    * `m` ints per row instead of `dim` floats (the 100-TB shape — at
    * dim 1024 / m 32 that is a 128× shuffle-byte cut on the only
    * corpus-touching exchange). `corpus` may be raw (assigned + encoded
    * on the fly) or an encoded postings frame with `list_id` and
    * `pq_code` already present (`preEncoded = true` — the loaded-index
    * path, where float vectors never existed on disk at all).
    *
    * Output: `(qIdCol, idCol, adc_dist)` — ascending approximate
    * squared L2, rounded to 6, ties to the lower id (mirrors
    * [[Pq.adcTopK]]).
    *
    * '''Re-rank''' (`reRank = k' > k`): the standard recall-recovery
    * stage every production IVF-PQ ships — the ADC scan shortlists the
    * top `k'` codes per query, then the shortlist ONLY is re-scored by
    * exact cosine on raw vectors and cut to `k`. The shortlist is
    * `queries × k'` rows, so the extra cost is one broadcast semi-join
    * against the vector source (the corpus never shuffles) — quantization
    * error moves WITHIN the shortlist for the price of reading `k'`
    * raw vectors per query. Output becomes `(qIdCol, idCol, cos)` —
    * descending exact cosine, the same contract as [[searchAll]]. With
    * `preEncoded = true` the codes-only lake holds no raw vectors, so
    * `rawVectors` (a `(idCol, vecCol)` frame, e.g. the original
    * embedding lake) is required. `nProbe` defaults to the encoded
    * [[suggestedProbes]] rule. The round-11 `recall64` rehearsal
    * (NOTES.md) measures the ADC→re-rank recall gap closing.
    */
  def searchAllPq(
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      centroids: Array[Array[Double]],
      model: Pq.Model,
      k: Int,
      nProbe: Int = -1,
      preEncoded: Boolean = false,
      broadcastQueries: Boolean = true,
      reRank: Int = 0,
      rawVectors: Option[DataFrame] = None,
  ): DataFrame = {
    require(nProbe == -1 || nProbe >= 1,
      s"nProbe must be >= 1 (or -1 for the suggestedProbes default), got $nProbe")
    val probes = if (nProbe > 0) nProbe else suggestedProbes(centroids.length)
    require(reRank == 0 || reRank >= k,
      s"reRank must be 0 (off) or >= k, got reRank=$reRank k=$k")
    val sc = queries.sparkSession.sparkContext
    val posted =
      if (preEncoded) corpus.select(col(idCol), col("list_id"), col("pq_code"))
      else {
        val f = corpus.filter(col(vecCol).isNotNull)
        f.select(col(idCol),
          KMeans.assign(f, vecCol, centroids).as("list_id"),
          Pq.encodeColumn(f, vecCol, model).as("pq_code"))
      }
    val routed = queries.select(col(qIdCol), col(qVecCol),
      explode(KMeans.assignK(queries, qVecCol, centroids, probes)).as("_probe"))
    val cand = (if (broadcastQueries) broadcast(routed) else routed)
      .join(posted, routed("_probe") === posted("list_id"))
    val bc = sc.broadcast(model.codebooks)
    val dist = GraftBridge.column(PqAdcDistExpr(
      GraftBridge.expression(col(qVecCol)),
      GraftBridge.expression(col("pq_code")), bc))
    // ascending distance through the descending-score rank: negate in,
    // negate out (0.0 - x restores exact magnitudes and kills -0.0);
    // NaN distances are dropped by the rank step on either path
    val scored = cand.select(col(qIdCol), col(idCol),
      (lit(0.0) - round(dist, 6)).as("_negd"))
    val adcRanked = TopKAgg.rankTopK(scored, qIdCol, idCol, "_negd",
      if (reRank > 0) reRank else k)
    if (reRank == 0)
      adcRanked.select(col(qIdCol), col(idCol),
        (lit(0.0) - col("_negd")).as("adc_dist"))
    else {
      val vecs = rawVectors.getOrElse {
        require(!preEncoded,
          "a preEncoded (codes-only) lake holds no raw vectors — pass " +
            "rawVectors = Some(frame with (idCol, vecCol)) for re-rank")
        corpus
      }.select(col(idCol), col(vecCol))
      // queries × reRank rows — broadcast both small sides so the raw
      // vector source is read map-only (one semi-join prune, no
      // shuffle). The mega-batch escape hatch applies here too: with
      // broadcastQueries = false the shortlist is reRank× LARGER than
      // the query batch the caller already declared un-broadcastable,
      // so both re-rank joins fall back to shuffle joins with the rest
      // of the plan.
      def side(d: DataFrame): DataFrame =
        if (broadcastQueries) broadcast(d) else d
      val shortlist = adcRanked.select(col(qIdCol), col(idCol))
      val rescored = vecs
        .join(side(shortlist), Seq(idCol))
        .join(side(queries.select(col(qIdCol), col(qVecCol))), Seq(qIdCol))
        .select(col(qIdCol), col(idCol),
          round(Dedup.cosine(col(qVecCol), col(vecCol)), 6).as("cos"))
      TopKAgg.rankTopK(rescored, qIdCol, idCol, "cos", k)
    }
  }
}
