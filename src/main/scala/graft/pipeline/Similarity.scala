package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`). Two tiers:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — one codegen'd projection +
  *    a global top-k (Spark's `TakeOrderedAndProject`, which keeps only k
  *    rows per partition before the single-point merge: no full sort, no
  *    full shuffle). The correctness baseline.
  *  - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH — the scale
  *    path: probe only the query's bucket(s) instead of the full corpus,
  *    turning a 100 TB scan into a bucket-pruned scan (bucket id is a
  *    groupable/partitionable column; at rest, partition the lake by it).
  */
object Similarity {

  /** Deterministic unit-free random hyperplanes: `numBits × dim`, seeded. */
  def hyperplanes(dim: Int, numBits: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(numBits, dim)(rnd.nextGaussian())
  }

  /** Sign-random-projection bucket id: bit b set iff `v · plane_b > 0`.
    * Native one-pass kernel ([[LshBucketExpr]], planes broadcast) —
    * value-identical to [[lshBucketDeclarative]] (same per-plane
    * index-order accumulation).
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column = {
    val bc = org.apache.spark.sql.SparkSession.active
      .sparkContext.broadcast(planes)
    org.apache.spark.sql.GraftBridge.column(LshBucketExpr(
      org.apache.spark.sql.GraftBridge.expression(vec), bc))
  }

  /** The per-plane higher-order composition [[lshBucket]] replaced;
    * kept as the parity reference.
    */
  def lshBucketDeclarative(vec: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, b) =>
      val dot = aggregate(
        zip_with(vec, lit(p), (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, c) => a.bitwiseOR(c))

  /** Exact brute-force cosine top-k against a literal query vector.
    * Deterministic tie-break on the id column.
    */
  def bruteForceTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Double],
      k: Int,
      roundTo: Int = 6,
  ): DataFrame =
    df.select(
        col(idCol),
        round(Dedup.cosine(col(vecCol), lit(query)), roundTo).as("cos"))
      // unscoreable rows (zero-norm → null, NaN/Inf components → NaN)
      // are excluded, matching the batch form — without the filter a
      // NaN would sort ABOVE every real cosine and claim rank 1
      .filter(col("cos").isNotNull && !isnan(col("cos")))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

  /** Batch brute-force cosine top-k — the EXACT baseline of the ANN
    * family ([[Ivf.searchAll]] approximates it; [[recallAgainst]]
    * measures by how much). Every query scores every corpus vector:
    * Θ(|queries| × |corpus|) compute by definition, so this is the
    * recall-measurement / small-corpus tool, not the lake path.
    *
    * Plan shape: the query batch BROADCASTS onto the corpus scan
    * (a broadcast nested-loop join — the corpus never shuffles,
    * candidates form map-side) and the rank step is
    * [[TopKAgg.rankTopK]], so the only exchange is the bounded heap
    * merge. Output `(qIdCol, idCol, cos)` — descending rounded cosine,
    * ties to the lower id, exactly [[bruteForceTopK]] per query
    * (unscoreable rows — zero-norm nulls, NaN cosines — excluded on
    * both forms).
    */
  def bruteTopKBatch(
      queries: DataFrame,
      qVecCol: String,
      qIdCol: String,
      corpus: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      roundTo: Int = 6,
  ): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries.select(col(qIdCol), col(qVecCol))))
      .select(col(qIdCol), col(idCol),
        round(Dedup.cosine(col(qVecCol), col(vecCol)), roundTo).as("cos"))
    TopKAgg.rankTopK(scored, qIdCol, idCol, "cos", k)
  }

  /** Per-query recall of an approximate result set against an exact one
    * (both `(qIdCol, idCol, …)` — e.g. [[Ivf.searchAll]] vs
    * [[bruteTopKBatch]] on the same `k`): `|approx ∩ exact| / |exact|`.
    * Queries present in `exact` but absent from `approx` score 0.0;
    * output `(qIdCol, recall)`. ONE `(q, id)` equi-join plus one
    * aggregate — no corpus-sized state (inputs are queries × k rows).
    * Both projections are `.distinct()`-ed first: a duplicated (q, id)
    * row in either input would otherwise fan out the join and skew the
    * ratio (e.g. one duplicated hit among 5 exact rows reads 2/6, not
    * 1/5) — the dedup is cheap because the inputs are queries × k rows.
    */
  def recallAgainst(
      approx: DataFrame,
      exact: DataFrame,
      qIdCol: String,
      idCol: String,
  ): DataFrame =
    exact.select(col(qIdCol), col(idCol)).distinct()
      .join(approx.select(col(qIdCol), col(idCol)).distinct()
          .withColumn("_m", lit(1)),
        Seq(qIdCol, idCol), "left")
      .groupBy(col(qIdCol))
      .agg(round(count(col("_m")).cast("double") / count(lit(1)), 6)
        .as("recall"))

  /** Per-vector int8 quantization: min-max affine codes
    * `round((x - lo) / scale)` in 0..255 plus the `(lo, scale)` pair
    * needed to invert — a 4× memory cut for ANN shortlists and re-rank
    * buffers. Flat vectors (`hi == lo`) quantize to all-zero codes with
    * `scale = 1` so the ANSI divide never sees 0. All arithmetic is
    * DOUBLE (the float inputs widen exactly), one codegen'd projection.
    */
  def quantizeInt8(vec: Column): Column = {
    val lo = array_min(vec).cast("double")
    val hi = array_max(vec).cast("double")
    val scale = when(hi === lo, lit(1.0)).otherwise((hi - lo) / 255.0)
    // bind (vec, lo, scale) ONCE via the lambda-binding rule (see
    // truncateNormalize): referencing `lo`/`scale` directly inside the
    // per-component transform would re-run their O(dim) array_min/max
    // scans per component — O(dim²) per row
    transform(array(struct(vec.as("v"), lo.as("l"), scale.as("s"))), b =>
      struct(
        transform(b.getField("v"), x =>
          round((x.cast("double") - b.getField("l")) / b.getField("s"))
            .cast("int")).as("codes"),
        b.getField("l").as("lo"),
        b.getField("s").as("scale"))).getItem(0)
  }

  /** Matryoshka truncation (Kusupati et al. 2022, "Matryoshka
    * Representation Learning"): keep the first `k` components and L2
    * re-normalize — the standard cheap-tier embedding for coarse
    * filtering, with the full vector kept for re-rank. Zero-norm
    * truncations yield NULL (nothing meaningful to rank; same
    * convention as the cosine kernel). Pure codegen projection, the
    * prefix sum-of-squares bound once per row.
    */
  def truncateNormalize(vec: Column, k: Int): Column = {
    val prefix = slice(vec, 1, k)
    // bind the sliced array once (lambda-binding rule) so the fold and
    // the per-component divide see the same subtree
    transform(array(prefix), p => {
      val norm = sqrt(aggregate(p, lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double")))
      when(norm > 0.0,
        transform(p, x => x.cast("double") / norm))
        .otherwise(lit(null).cast("array<double>"))
    }).getItem(0)
  }

  /** Inverse of [[quantizeInt8]]: `code * scale + lo` per component. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"),
      c => c.cast("double") * q.getField("scale") + q.getField("lo"))

  /** Per-group embedding centroids: one row per `(keyCols, dim)` with the
    * component mean — the cluster-summary / class-prototype primitive
    * (IVF list retraining, semantic-dedup cluster centers, drift checks).
    *
    * `posexplode` then ONE aggregation keyed on `(keyCols, dim)`: partial
    * (map-side) combine reduces each partition to ≤ |keys| × dim rows
    * before the single shuffle, so shuffle volume is bounded by group
    * cardinality × dimension, not corpus size.
    */
  def groupCentroids(
      df: DataFrame,
      vecCol: String,
      keyCols: Seq[String],
      roundTo: Int = 6,
  ): DataFrame =
    df.select(keyCols.map(col) :+
        posexplode(col(vecCol)).as(Seq("dim", "_v")): _*)
      .groupBy((keyCols :+ "dim").map(col): _*)
      .agg(round(avg(col("_v").cast("double")), roundTo).as("centroid"))

  /** Assign every row its LSH bucket (the indexing pass: at scale, write
    * the lake partitioned/bucketed by this column).
    */
  def lshBuckets(
      df: DataFrame,
      vecCol: String,
      planes: Array[Array[Double]],
      bucketName: String = "bucket",
  ): DataFrame =
    df.withColumn(bucketName, lshBucket(col(vecCol), planes))

  // ---- IVF (inverted-file) variant: k-means coarse quantizer ----

  /** Driver-side Lloyd iterations on a bounded, deterministic sample (the
    * first `sampleN` rows by id): the coarse quantizer is tiny (k × dim
    * doubles) and training it on a sample is the standard IVF recipe —
    * the full corpus never leaves the executors.
    */
  def kmeansCentroids(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      k: Int,
      iters: Int = 10,
      sampleN: Int = 10000,
  ): Array[Array[Double]] = {
    val sample = df.orderBy(col(idCol)).limit(sampleN)
      .select(vecCol).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(sample.length >= k, s"need >= $k sample vectors")
    var centroids = Array.tabulate(k)(i => sample(i * (sample.length / k)).clone())
    (0 until iters).foreach { _ =>
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var d = 0
        while (d < v.length) { sums(c)(d) += v(d); d += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  private def nearestCentroid(v: Array[Double], centroids: Array[Array[Double]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d2 = 0.0
      var i = 0
      while (i < v.length) { val d = v(i) - centroids(c)(i); d2 += d * d; i += 1 }
      if (d2 < bestD) { bestD = d2; best = c }
      c += 1
    }
    best
  }

  /** Squared euclidean distance of the vector column to a literal
    * centroid — strict left fold, deterministic summation order.
    */
  def sqDist(vec: Column, centroid: Array[Double]): Column =
    aggregate(
      zip_with(vec, lit(centroid), (x, m) => {
        val d = x.cast("double") - m
        d * d
      }),
      lit(0.0), (acc, v) => acc + v)

  /** IVF list assignment: nearest-centroid index per row (ties to the
    * lowest index). Pure expressions — at rest, partition the lake by
    * this column so a probe reads only its lists.
    */
  def ivfAssign(vec: Column, centroids: Array[Array[Double]]): Column = {
    val dists = centroids.map(sqDist(vec, _))
    val best = dists.reduce((a, b) => least(a, b))
    centroids.indices.reverse.foldLeft(lit(-1)) { (acc, c) =>
      when(dists(c) === best, lit(c)).otherwise(acc)
    }
  }

  /** IVF ANN top-k: probe the `nProbe` lists nearest to the query, score
    * only their members.
    */
  def ivfTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Double],
      centroids: Array[Array[Double]],
      k: Int,
      nProbe: Int = 2,
  ): DataFrame = {
    val probes = centroids.indices
      .sortBy { c =>
        centroids(c).indices.map { i =>
          val d = query(i) - centroids(c)(i); d * d
        }.sum
      }
      .take(nProbe)
    // broadcast assignment (tie-identical to the literal ivfAssign tree,
    // which stops compiling around k ~ 100)
    df.withColumn("_list", KMeans.assign(df, vecCol, centroids))
      .filter(col("_list").isin(probes: _*))
      .select(col(idCol),
        round(Dedup.cosine(col(vecCol), lit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** ANN top-k: score only rows in the query's bucket (single-probe).
    * `multiProbe` additionally probes all buckets at Hamming distance 1
    * (flipping each bit once) — the standard recall/latency dial.
    */
  def lshTopK(
      df: DataFrame,
      vecCol: String,
      idCol: String,
      query: Array[Double],
      planes: Array[Array[Double]],
      k: Int,
      multiProbe: Boolean = true,
  ): DataFrame = {
    val qBucket = planes.zipWithIndex.map { case (p, b) =>
      val dot = p.indices.map(i => query(i) * p(i)).sum
      if (dot > 0) 1L << b else 0L
    }.reduce(_ | _)
    val probes: Seq[Long] =
      if (multiProbe) qBucket +: planes.indices.map(b => qBucket ^ (1L << b))
      else Seq(qBucket)
    lshBuckets(df, vecCol, planes)
      .filter(col("bucket").isin(probes: _*))
      .select(col(idCol),
        round(Dedup.cosine(col(vecCol), lit(query)), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
