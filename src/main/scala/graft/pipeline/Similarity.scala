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
    * Pure expressions over the array column (dot product unrolled per
    * plane via a strict fold) — no UDF.
    */
  def lshBucket(vec: Column, planes: Array[Array[Double]]): Column =
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
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)

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
