package graft

import graft.binning.{BinAxis, EdgesAxis, UniformAxis}
import graft.pipeline.TextOps

/** Renders the engine's bin-index semantics as ANSI/DuckDB SQL so each
  * `SparkEntry.queries` entry and its `oracleSql` twin derive from the same
  * axis object — the off-by-half / edge-inclusivity conventions
  * (SURVEY.md §7.4 risk 1) are encoded once.
  */
object OracleSql {

  /** Round-trippable SQL literal for a Double. */
  def d(v: Double): String = {
    val s = java.lang.Double.toString(v)
    if (v < 0) s"($s)" else s
  }

  /** SQL for the *rounded* scaled position `j` on a uniform axis
    * (pre-clamp); mirrors [[graft.binning.Binning.uniformBinIndex]].
    */
  def uniformJ(colSql: String, ax: UniformAxis): String =
    s"ROUND(($colSql - ${d(ax.edgeLo)}) * ${d(ax.delta)}, 11)"

  /** WHERE predicate keeping in-range events for a uniform axis. */
  def uniformKeep(jSql: String, ax: UniformAxis): String =
    s"$jSql >= 0 AND $jSql <= ${ax.nBins}"

  /** Final clamped BIGINT bin index from a `j` expression. */
  def uniformIdx(jSql: String, ax: UniformAxis): String =
    s"CAST(LEAST(FLOOR($jSql), ${ax.nBins - 1}) AS BIGINT)"

  /** CASE-chain bin index for explicit edges; mirrors
    * [[graft.binning.Binning.edgesBinIndex]] (last edge inclusive, out of
    * range → NULL).
    */
  def edgesIdx(colSql: String, ax: EdgesAxis): String = {
    val e = ax.edges
    val n = e.length - 1
    val branches = (0 until n).map { k =>
      s"WHEN $colSql < ${d(e(k + 1))} THEN CAST($k AS BIGINT)"
    }
    s"""CASE WHEN $colSql = ${d(e(n))} THEN CAST(${n - 1} AS BIGINT)
       |WHEN $colSql < ${d(e(0))} OR $colSql > ${d(e(n))} THEN NULL
       |${branches.mkString(" ")}
       |END""".stripMargin.replace("\n", " ")
  }

  // ---- portable polynomial hashes (mirror graft.pipeline.TextOps) ----

  private val P = TextOps.PolyPrime

  /** Poly hash of the k chars of `textSql` starting at 1-based position
    * expression `iSql` — direct char indexing (all positions assumed in
    * range); mirrors [[TextOps.polyHashFixed]] applied to a full shingle:
    * Horner form with a `% p` reduction per step, so BIGINT intermediates
    * never overflow for any `k` (identical to the Spark side step-for-step).
    */
  def polyShingleSql(textSql: String, iSql: String, k: Int, base: Long = 31L): String =
    (0 until k).foldLeft(s"0::BIGINT") { (acc, j) =>
      val at = if (j == 0) iSql else s"$iSql + $j"
      s"((($acc * $base::BIGINT) + ord(substr($textSql, $at, 1))) % $P)"
    }

  /** Guarded poly hash of the first `k` chars of a (possibly shorter)
    * string expression; out-of-range codepoints read as 0 to match Spark's
    * `ascii` on an empty substring. Same overflow-safe Horner form as
    * [[polyShingleSql]].
    */
  def polyPrefixSql(tSql: String, k: Int, base: Long): String =
    (1 to k).foldLeft(s"0::BIGINT") { (acc, j) =>
      val cp = s"(CASE WHEN length($tSql) >= $j THEN ord(substr($tSql, $j, 1)) ELSE 0 END)"
      s"((($acc * $base::BIGINT) + $cp) % $P)"
    }

  /** Mirrors [[TextOps.portableTokenHash]]: 62-bit two-polynomial hash. */
  def portableTokenHashSql(tSql: String): String = {
    val h1 = s"((${polyPrefixSql(tSql, 8, 31L)} + length($tSql)) % $P)"
    val h2 = s"((${polyPrefixSql(tSql, 8, 37L)} + (length($tSql) * 7)) % $P)"
    s"($h1 + ($h2 * ${1L << 31}))"
  }

  /** Winnowing fingerprint rows (doc_id, fp) — mirrors
    * [[TextOps.rollingHashFingerprint]] with the portable shingle hash,
    * exploded: k-gram hashes, window minima, distinct.
    */
  def rollingFpSql(table: String, k: Int, window: Int): String = {
    val h = polyShingleSql("text", "i", k)
    s"""WITH h AS (
       |  SELECT doc_id, [ $h for i in range(1, length(text) - ${k - 2}) ] AS hs
       |  FROM $table WHERE length(text) >= $k)
       |SELECT doc_id, unnest(list_sort(list_distinct(
       |  [ list_min(hs[i : i + ${window - 1}])
       |    for i in range(1, greatest(len(hs) - ${window - 1}, 1) + 1) ]
       |))) AS fp FROM h""".stripMargin.replace("\n", " ")
  }

  /** MinHash+LSH near-dup pairs — mirrors
    * [[graft.pipeline.Dedup.minhashNearDuplicates]] with `portable = true`:
    * same seeded affine coefficients, same banding, same estimate.
    */
  def minhashPairsSql(
      table: String,
      k: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      seed: Long,
  ): String = {
    val rows = numHashes / bands
    val coeffs = pipeline.Dedup.hashCoeffs(numHashes, seed)
    val sigEntries = coeffs.map { case (a, b) =>
      s"list_min([ ((h * $a::BIGINT) + $b) % $P for h in hs ])"
    }
    val est =
      s"CAST(len([i for i in range(1, ${numHashes + 1}) if a.sig[i] = b.sig[i]]) AS DOUBLE) / ${d(numHashes.toDouble)}"
    val bandIdx = (0 until bands).mkString("[", ", ", "]")
    s"""WITH base AS (
       |  SELECT doc_id AS id,
       |    list_distinct([ ${polyShingleSql("text", "i", k)}
       |      for i in range(1, length(text) - ${k - 2}) ]) AS hs
       |  FROM $table WHERE length(text) >= $k),
       |sigs AS (SELECT id, [ ${sigEntries.mkString(", ")} ] AS sig FROM base),
       |banded AS (
       |  SELECT id, sig, bi, sig[$rows * bi + 1 : $rows * bi + $rows] AS band
       |  FROM sigs CROSS JOIN (SELECT unnest($bandIdx) AS bi) bs)
       |SELECT DISTINCT a.id AS id_a, b.id AS id_b, $est AS est_jaccard
       |FROM banded a JOIN banded b
       |  ON a.bi = b.bi AND a.band = b.band AND a.id < b.id
       |WHERE $est >= ${d(threshold)}""".stripMargin.replace("\n", " ")
  }

  /** Cross-corpus MinHash probe — mirrors
    * [[graft.pipeline.Dedup.minhashNearDuplicatesAgainst]] with
    * `portable = true`. Signatures are per-doc (independent of the rest of
    * the table), so the oracle computes them over the whole table and
    * restricts the band join by the batch/corpus membership predicates
    * (`a` = batch side, `b` = corpus side).
    */
  def minhashAgainstSql(
      table: String,
      k: Int,
      numHashes: Int,
      bands: Int,
      threshold: Double,
      seed: Long,
      batchPred: String,
      corpusPred: String,
  ): String = {
    val rows = numHashes / bands
    val coeffs = pipeline.Dedup.hashCoeffs(numHashes, seed)
    val sigEntries = coeffs.map { case (a, b) =>
      s"list_min([ ((h * $a::BIGINT) + $b) % $P for h in hs ])"
    }
    val est =
      s"CAST(len([i for i in range(1, ${numHashes + 1}) if a.sig[i] = b.sig[i]]) AS DOUBLE) / ${d(numHashes.toDouble)}"
    val bandIdx = (0 until bands).mkString("[", ", ", "]")
    s"""WITH base AS (
       |  SELECT doc_id AS id,
       |    list_distinct([ ${polyShingleSql("text", "i", k)}
       |      for i in range(1, length(text) - ${k - 2}) ]) AS hs
       |  FROM $table WHERE length(text) >= $k),
       |sigs AS (SELECT id, [ ${sigEntries.mkString(", ")} ] AS sig FROM base),
       |banded AS (
       |  SELECT id, sig, bi, sig[$rows * bi + 1 : $rows * bi + $rows] AS band
       |  FROM sigs CROSS JOIN (SELECT unnest($bandIdx) AS bi) bs)
       |SELECT DISTINCT a.id AS batch_id, b.id AS corpus_id, $est AS est_jaccard
       |FROM banded a JOIN banded b
       |  ON a.bi = b.bi AND a.band = b.band AND ($batchPred) AND ($corpusPred)
       |WHERE $est >= ${d(threshold)}""".stripMargin.replace("\n", " ")
  }

  /** SimHash near-dup pairs — mirrors
    * [[graft.pipeline.Dedup.simhashNearDuplicates]] with `portable = true`
    * (62-bit token hash, pigeonhole banding, Hamming filter).
    */
  def simhashPairsSql(table: String, maxDistance: Int): String = {
    val bits = 62
    val blocks = maxDistance + 1
    val width = bits / blocks
    val sigTerms = (0 until bits).map { bit =>
      s"(CASE WHEN 2 * len(list_filter(hs, h -> ((h >> $bit) & 1) = 1)) > len(hs) THEN ${1L << bit}::BIGINT ELSE 0 END)"
    }
    val blockIdx = (0 until blocks).mkString("[", ", ", "]")
    raw"""WITH th AS (
         |  SELECT doc_id AS id,
         |    [ ${portableTokenHashSql("t")}
         |      for t in regexp_split_to_array(trim(text), '\s+') ] AS hs
         |  FROM $table),
         |sigs AS (SELECT id, (${sigTerms.mkString(" + ")}) AS sig FROM th),
         |banded AS (
         |  SELECT id, sig, blk, (sig >> ($width * blk)) & ${(1L << width) - 1} AS bv
         |  FROM sigs CROSS JOIN (SELECT unnest($blockIdx) AS blk) bs)
         |SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         |  CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS distance
         |FROM banded a JOIN banded b
         |  ON a.blk = b.blk AND a.bv = b.bv AND a.id < b.id
         |WHERE bit_count(xor(a.sig, b.sig)) <= $maxDistance""".stripMargin.replace("\n", " ")
  }

  /** T8 bilinear dfield lookup oracle — mirrors
    * [[graft.calibrate.BilinearGridLookup.interp]] step by step (clamp,
    * truncating floor, same product/sum association) with grid node values
    * recomputed from their closed-form SQL (`nodeSql(fieldIdx)(rSql, cSql)`
    * must mirror the Scala grid-fill expression exactly).
    */
  def dfieldSql(
      table: String,
      keyCols: Seq[String],
      xSql: String,
      ySql: String,
      rows: Int,
      cols: Int,
      ranges: ((Double, Double), (Double, Double)),
      nodeSql: Int => (String, String) => String,
      outCols: (String, String),
  ): String = {
    val xScale = (rows - 1).toDouble / (ranges._1._2 - ranges._1._1)
    val yScale = (cols - 1).toDouble / (ranges._2._2 - ranges._2._1)
    def interp(field: Int): String = {
      val g = nodeSql(field)
      val (g00, g10, g01, g11) =
        (g("r0", "c0"), g("(r0 + 1)", "c0"), g("r0", "(c0 + 1)"), g("(r0 + 1)", "(c0 + 1)"))
      s"$g00 * (1.0 - fr) * (1.0 - fc) + $g10 * fr * (1.0 - fc) + " +
        s"$g01 * (1.0 - fr) * fc + $g11 * fr * fc"
    }
    val keys = keyCols.mkString(", ")
    s"""WITH s1 AS (SELECT $keys,
       |  LEAST(GREATEST((CAST($xSql AS DOUBLE) - ${d(ranges._1._1)}) * ${d(xScale)}, 0.0), ${d(rows - 1.0)}) AS rc,
       |  LEAST(GREATEST((CAST($ySql AS DOUBLE) - ${d(ranges._2._1)}) * ${d(yScale)}, 0.0), ${d(cols - 1.0)}) AS cc
       |  FROM $table),
       |s2 AS (SELECT *, LEAST(CAST(FLOOR(rc) AS INTEGER), ${rows - 2}) AS r0,
       |  LEAST(CAST(FLOOR(cc) AS INTEGER), ${cols - 2}) AS c0 FROM s1),
       |s3 AS (SELECT *, rc - r0 AS fr, cc - c0 AS fc FROM s2)
       |SELECT $keys, ${interp(0)} AS ${outCols._1}, ${interp(1)} AS ${outCols._2}
       |FROM s3""".stripMargin.replace("\n", " ")
  }

  /** Per-row LSH bucket expression over `embedding` (same plane constants
    * and left-to-right dot-sum order as
    * [[graft.pipeline.Similarity.lshBucket]]).
    */
  def lshBucketExprSql(planes: Array[Array[Double]]): String = {
    val dots = planes.map { p =>
      "0.0 + " + p.zipWithIndex
        .map { case (w, i) => s"CAST(embedding[${i + 1}] AS DOUBLE) * ${d(w)}" }
        .mkString(" + ")
    }
    val bucket = dots.zipWithIndex
      .map { case (dt, b) => s"(CASE WHEN ($dt) > 0 THEN ${1L << b} ELSE 0 END)" }
      .mkString(" + ")
    s"CAST($bucket AS BIGINT)"
  }

  /** Multi-probe LSH ANN top-k — mirrors
    * [[graft.pipeline.Similarity.lshTopK]]: probe the query's bucket and
    * all Hamming-1 neighbors, exact cosine within candidates.
    */
  def lshTopKSql(table: String, planes: Array[Array[Double]], k: Int): String = {
    val xorProbes = planes.indices.map(b => 1L << b).mkString(", ")
    s"""WITH bk AS (SELECT vec_id, ${lshBucketExprSql(planes)} AS bucket FROM $table),
       |qb AS (SELECT bucket AS q FROM bk WHERE vec_id = 0),
       |cand AS (SELECT bk.vec_id FROM bk, qb
       |  WHERE bk.bucket = qb.q OR xor(bk.bucket, qb.q) IN ($xorProbes)),
       |x AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  unnest(embedding) AS v FROM $table
       |  WHERE vec_id IN (SELECT vec_id FROM cand)),
       |q AS (SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding) AS v
       |  FROM $table WHERE vec_id = 0),
       |p AS (SELECT x.vec_id, sum(CAST(x.v AS DOUBLE) * CAST(q.v AS DOUBLE)) AS dot,
       |  sum(CAST(x.v AS DOUBLE) * CAST(x.v AS DOUBLE)) AS nx,
       |  sum(CAST(q.v AS DOUBLE) * CAST(q.v AS DOUBLE)) AS nq
       | FROM x JOIN q ON x.i = q.i GROUP BY 1)
       |SELECT vec_id, ROUND(dot / (sqrt(nx) * sqrt(nq)), 6) AS cos FROM p
       |ORDER BY cos DESC, vec_id LIMIT $k""".stripMargin.replace("\n", " ")
  }

  /** IVF ANN top-k with the seed-vector quantizer (embeddings `0..nLists−1`
    * as centroids) — mirrors [[graft.pipeline.Similarity.ivfTopK]]: assign
    * each row to its nearest centroid (ties → lowest index), probe the
    * `nProbe` centroids nearest the query, exact cosine within the probed
    * lists.
    */
  def ivfTopKSql(table: String, nLists: Int, nProbe: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS v FROM $table),
       |c AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $nLists),
       |cd AS (SELECT cid, sum((c.v - q.v) * (c.v - q.v)) AS dq
       |  FROM c JOIN (SELECT i, v FROM e WHERE vec_id = 0) q USING (i) GROUP BY cid),
       |probes AS (SELECT cid FROM cd ORDER BY dq, cid LIMIT $nProbe),
       |rd AS (SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
       |  FROM e JOIN c ON e.i = c.i GROUP BY e.vec_id, c.cid),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn FROM rd)
       |  WHERE rn = 1),
       |cand AS (SELECT vec_id FROM asg WHERE cid IN (SELECT cid FROM probes)),
       |q2 AS (SELECT i, v FROM e WHERE vec_id = 0),
       |p AS (SELECT e.vec_id, sum(e.v * q2.v) AS dot, sum(e.v * e.v) AS nx,
       |  sum(q2.v * q2.v) AS nq
       | FROM e JOIN q2 ON e.i = q2.i
       | WHERE e.vec_id IN (SELECT vec_id FROM cand) GROUP BY 1)
       |SELECT vec_id, ROUND(dot / (sqrt(nx) * sqrt(nq)), 6) AS cos FROM p
       |ORDER BY cos DESC, vec_id LIMIT $k""".stripMargin.replace("\n", " ")

  /** Batch IVF search — mirrors [[graft.pipeline.Ivf.searchAll]] with
    * seed centroids (`vec_id < nLists`) and queries `vec_id < nQueries`:
    * per query, the `nProbe` nearest lists (ascending distance, ties to
    * the lower id), candidates = corpus rows assigned to a probed list,
    * ranked by rounded cosine then id, top `k` per query.
    */
  def ivfBatchSql(table: String, nLists: Int, nQueries: Int, nProbe: Int,
      k: Int): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS v FROM $table),
       |c AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $nLists),
       |q AS (SELECT vec_id AS qid, i, v FROM e WHERE vec_id < $nQueries),
       |qd AS (SELECT qid, cid, sum((c.v - q.v) * (c.v - q.v)) AS dq
       |  FROM c JOIN q USING (i) GROUP BY qid, cid),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY dq, cid) AS rn FROM qd)
       |  WHERE rn <= $nProbe),
       |rd AS (SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
       |  FROM e JOIN c ON e.i = c.i GROUP BY e.vec_id, c.cid),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn FROM rd)
       |  WHERE rn = 1),
       |cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN asg a ON a.cid = p.cid),
       |s AS (SELECT cd.qid, cd.vec_id,
       |  sum(e.v * q.v) AS dot, sum(e.v * e.v) AS nx, sum(q.v * q.v) AS nq
       |  FROM cand cd JOIN e ON e.vec_id = cd.vec_id
       |  JOIN q ON q.qid = cd.qid AND q.i = e.i
       |  GROUP BY cd.qid, cd.vec_id)
       |SELECT q_id, vec_id, cos FROM (
       |  SELECT CAST(qid AS BIGINT) AS q_id, vec_id,
       |    ROUND(dot / (sqrt(nx) * sqrt(nq)), 6) AS cos,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY ROUND(dot / (sqrt(nx) * sqrt(nq)), 6) DESC, vec_id) AS rn
       |  FROM s) WHERE rn <= $k""".stripMargin.replace("\n", " ")

  /** Batch IVF-PQ search — mirrors [[graft.pipeline.Ivf.searchAllPq]]
    * with seed coarse centroids AND seed codebooks (both `vec_id <
    * nLists`): per query, the `nProbe` nearest coarse lists; candidates
    * = corpus rows assigned to a probed list; each candidate's PQ code
    * is its per-subspace nearest seed slice; the ADC distance is the
    * sum over subspaces of the query-to-coded-centroid squared
    * distance; top `k` per query ascending (rounded dist, id).
    */
  def ivfPqBatchSql(table: String, nLists: Int, subDim: Int, nQueries: Int,
      nProbe: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS v FROM $table),
       |c AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $nLists),
       |q AS (SELECT vec_id AS qid, i, v FROM e WHERE vec_id < $nQueries),
       |qd AS (SELECT qid, cid, sum((c.v - q.v) * (c.v - q.v)) AS dq
       |  FROM c JOIN q USING (i) GROUP BY qid, cid),
       |probes AS (SELECT qid, cid FROM (
       |  SELECT qid, cid,
       |    row_number() OVER (PARTITION BY qid ORDER BY dq, cid) AS rn FROM qd)
       |  WHERE rn <= $nProbe),
       |rd AS (SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
       |  FROM e JOIN c ON e.i = c.i GROUP BY e.vec_id, c.cid),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn FROM rd)
       |  WHERE rn = 1),
       |sd AS (SELECT a.vec_id, CAST((a.i - 1) // $subDim AS INTEGER) AS sub,
       |  c.cid, sum((a.v - c.v) * (a.v - c.v)) AS dd
       |  FROM e a JOIN c ON a.i = c.i
       |  GROUP BY a.vec_id, ((a.i - 1) // $subDim), c.cid),
       |code AS (SELECT vec_id, sub, cid AS cd FROM (
       |  SELECT vec_id, sub, cid,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, cid) AS rn
       |  FROM sd) WHERE rn = 1),
       |lut AS (SELECT q.qid, CAST((q.i - 1) // $subDim AS INTEGER) AS sub,
       |  c.cid AS cd, sum((q.v - c.v) * (q.v - c.v)) AS d2
       |  FROM q JOIN c ON q.i = c.i
       |  GROUP BY q.qid, ((q.i - 1) // $subDim), c.cid),
       |cand AS (SELECT p.qid, a.vec_id FROM probes p JOIN asg a ON a.cid = p.cid),
       |adc AS (SELECT cd0.qid, cd0.vec_id, sum(l.d2) AS dist
       |  FROM cand cd0 JOIN code k2 ON k2.vec_id = cd0.vec_id
       |  JOIN lut l ON l.qid = cd0.qid AND l.sub = k2.sub AND l.cd = k2.cd
       |  GROUP BY cd0.qid, cd0.vec_id)
       |SELECT q_id, vec_id, adc_dist FROM (
       |  SELECT CAST(qid AS BIGINT) AS q_id, vec_id,
       |    ROUND(dist, 6) AS adc_dist,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY ROUND(dist, 6), vec_id) AS rn
       |  FROM adc) WHERE rn <= $k""".stripMargin.replace("\n", " ")

  /** Batch IVF-PQ search WITH exact re-rank — mirrors
    * [[graft.pipeline.Ivf.searchAllPq]] at `reRank = shortK`: the ADC
    * ranking of [[ivfPqBatchSql]] shortlists the top `shortK` codes per
    * query (ascending rounded distance, ties to the lower id), then the
    * shortlist only is re-scored by exact cosine on the raw vectors and
    * cut to `k` (descending rounded cosine, ties to the lower id).
    */
  def ivfPqRerankSql(table: String, nLists: Int, subDim: Int, nQueries: Int,
      nProbe: Int, shortK: Int, k: Int): String = {
    val adcCore = ivfPqBatchSql(table, nLists, subDim, nQueries, nProbe, shortK)
    // reuse the shared CTE prefix up to `adc`, swap the final SELECT for
    // the shortlist + re-rank stages
    val marker = "SELECT q_id, vec_id, adc_dist"
    val idx = adcCore.indexOf(marker)
    require(idx >= 0,
      s"ivfPqBatchSql's final projection no longer starts with '$marker' — " +
        "update ivfPqRerankSql's splice point alongside it")
    val prefix = adcCore.substring(0, idx)
    s"""${prefix}SELECT q_id, vec_id, cos FROM (
       |  SELECT CAST(s.qid AS BIGINT) AS q_id, s.vec_id,
       |    ROUND(s.dot / (sqrt(s.nx) * sqrt(s.nq)), 6) AS cos,
       |    row_number() OVER (PARTITION BY s.qid
       |      ORDER BY ROUND(s.dot / (sqrt(s.nx) * sqrt(s.nq)), 6) DESC,
       |        s.vec_id) AS rn
       |  FROM (
       |    SELECT sh.qid, sh.vec_id, sum(e.v * q.v) AS dot,
       |      sum(e.v * e.v) AS nx, sum(q.v * q.v) AS nq
       |    FROM (SELECT qid, vec_id FROM (
       |        SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
       |          ORDER BY ROUND(dist, 6), vec_id) AS rn FROM adc)
       |      WHERE rn <= $shortK) sh
       |    JOIN e ON e.vec_id = sh.vec_id
       |    JOIN q ON q.qid = sh.qid AND q.i = e.i
       |    GROUP BY sh.qid, sh.vec_id) s) WHERE rn <= $k""".stripMargin
      .replace("\n", " ")
  }

  /** Hashed-linear quality score — mirrors
    * [[graft.pipeline.QualityModel.scoreColumn]] with the deterministic
    * formula weight table `w[b] = ((b·2654435761) mod 97 − 48)/100`:
    * `σ(bias + mean_tok w[hash(tok) mod B])`, rounded to 6.
    */
  def qualityScoreSql(table: String, numBuckets: Int, bias: Double): String = {
    val bk = s"((${portableTokenHashSql("t")}) % $numBuckets)"
    s"""WITH toks AS (SELECT doc_id,
       |  unnest(regexp_split_to_array(trim(text), '\\s+')) AS t FROM $table),
       |s AS (SELECT doc_id, count(*) AS n,
       |  sum((CAST(($bk * 2654435761::BIGINT) % 97 AS DOUBLE) - 48) / 100) AS sw
       |  FROM toks GROUP BY doc_id)
       |SELECT doc_id, ROUND(1.0 / (1.0 + exp(-($bias + sw / n))), 6) AS q_score
       |FROM s""".stripMargin.replace("\n", " ")
  }

  /** Upper-triangle INTEGER-exact covariance moments of the embedding
    * dimensions, mirroring [[graft.pipeline.Pca.exactMoments]]: each
    * float32 component quantizes to `q = ⌊v·2^20⌋` (float32→double,
    * power-of-two multiply, and floor are all exact in every engine),
    * and the gate compares the pure-integer sums `Σ q_i·q_j`, `Σ q_i`,
    * `Σ q_j`, `n`. Unlike any float aggregate — centered or not — the
    * result is bit-identical under any partitioning or row order, so
    * the hash cannot flip on the driver's box (the r6/r7 red-gate
    * failure mode: a post-ROUND(…,6) float hash at a boundary cell).
    */
  def embedCovSql(table: String): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1048576.0) AS BIGINT) AS q
       |  FROM $table)
       |SELECT CAST(a.i - 1 AS INTEGER) AS i, CAST(b.i - 1 AS INTEGER) AS j,
       |  CAST(SUM(a.q * b.q) AS BIGINT) AS sxy,
       |  CAST(SUM(a.q) AS BIGINT) AS sx, CAST(SUM(b.q) AS BIGINT) AS sy,
       |  CAST(COUNT(*) AS BIGINT) AS n_v
       |FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
       |GROUP BY a.i, b.i""".stripMargin.replace("\n", " ")

  /** PQ encoding against seed-sliced codebooks: per (vector, subspace),
    * the index of the nearest seed sub-vector (ties to the lowest id) —
    * mirrors [[graft.pipeline.Pq.encode]] with seed codebooks.
    */
  def pqEncodeSql(table: String, nSeeds: Int, subDim: Int): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS v FROM $table),
       |c AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $nSeeds),
       |rd AS (SELECT a.vec_id, CAST((a.i - 1) // $subDim AS INTEGER) AS sub,
       |  c.cid, sum((a.v - c.v) * (a.v - c.v)) AS dd
       |  FROM e a JOIN c ON a.i = c.i
       |  GROUP BY a.vec_id, ((a.i - 1) // $subDim), c.cid)
       |SELECT vec_id, sub, CAST(cid AS INTEGER) AS code FROM (
       |  SELECT vec_id, sub, cid,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, cid) AS rn
       |  FROM rd) WHERE rn = 1""".stripMargin.replace("\n", " ")

  /** ADC top-k with seed codebooks and the vec_id=0 query: per-vector
    * approximate distance = Σ_sub lut[sub][code], the lookup table being
    * the query-to-sub-centroid distances — mirrors
    * [[graft.pipeline.Pq.adcTopK]] over [[graft.pipeline.Pq.encode]].
    */
  def pqAdcSql(table: String, nSeeds: Int, subDim: Int, k: Int): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS v FROM $table),
       |c AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $nSeeds),
       |rd AS (SELECT a.vec_id, CAST((a.i - 1) // $subDim AS INTEGER) AS sub,
       |  c.cid, sum((a.v - c.v) * (a.v - c.v)) AS dd
       |  FROM e a JOIN c ON a.i = c.i
       |  GROUP BY a.vec_id, ((a.i - 1) // $subDim), c.cid),
       |asg AS (SELECT vec_id, sub, cid FROM (
       |  SELECT vec_id, sub, cid,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dd, cid) AS rn
       |  FROM rd) WHERE rn = 1),
       |q AS (SELECT i, v FROM e WHERE vec_id = 0),
       |lut AS (SELECT CAST((c.i - 1) // $subDim AS INTEGER) AS sub, c.cid,
       |  sum((q.v - c.v) * (q.v - c.v)) AS d
       |  FROM c JOIN q ON c.i = q.i GROUP BY ((c.i - 1) // $subDim), c.cid)
       |SELECT a.vec_id, ROUND(sum(l.d), 6) AS adc_dist
       |FROM asg a JOIN lut l ON a.sub = l.sub AND a.cid = l.cid
       |GROUP BY a.vec_id ORDER BY adc_dist, a.vec_id LIMIT $k""".stripMargin
      .replace("\n", " ")

  /** Mean k-means inertia against the seed centroids:
    * `avg_vec min_cid ||v − c||²` — mirrors
    * [[graft.pipeline.KMeans.inertia]] normalized by the corpus count.
    */
  def kmeansInertiaSql(table: String, nLists: Int): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS v FROM $table),
       |c AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $nLists),
       |rd AS (SELECT a.vec_id, c.cid, sum((a.v - c.v) * (a.v - c.v)) AS dd
       |  FROM e a JOIN c ON a.i = c.i GROUP BY a.vec_id, c.cid),
       |m AS (SELECT vec_id, min(dd) AS mind FROM rd GROUP BY vec_id)
       |SELECT ROUND(avg(mind), 6) AS mean_inertia FROM m""".stripMargin
      .replace("\n", " ")

  /** One Lloyd update step against the first-`nLists` seed embeddings as
    * centroids: nearest-centroid assignment (ties to the lowest id, like
    * the engine) then per-(cluster, dim) member count and mean.
    */
  def kmeansStepSql(table: String, nLists: Int): String =
    s"""WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |  CAST(unnest(embedding) AS DOUBLE) AS v FROM $table),
       |c AS (SELECT vec_id AS cid, i, v FROM e WHERE vec_id < $nLists),
       |rd AS (SELECT e.vec_id, c.cid, sum((e.v - c.v) * (e.v - c.v)) AS dd
       |  FROM e JOIN c ON e.i = c.i GROUP BY e.vec_id, c.cid),
       |asg AS (SELECT vec_id, cid FROM (
       |  SELECT vec_id, cid,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dd, cid) AS rn FROM rd)
       |  WHERE rn = 1)
       |SELECT CAST(a.cid AS INTEGER) AS cluster, CAST(e.i - 1 AS INTEGER) AS dim,
       |  ROUND(avg(e.v), 6) AS mean_v, CAST(count(*) AS BIGINT) AS n
       |FROM asg a JOIN e ON a.vec_id = e.vec_id
       |GROUP BY a.cid, e.i""".stripMargin.replace("\n", " ")

  /** Full sparse-histogram oracle for a set of axes over `table`:
    * `SELECT bin_<c0>…, count(*) AS cnt GROUP BY all bins`, dropping
    * out-of-range events exactly as the kernel does.
    */
  def histogramSql(table: String, axes: Seq[BinAxis], extraWhere: Option[String] = None,
      groupCols: Seq[String] = Nil): String = {
    val js = axes.zipWithIndex.map {
      case (u: UniformAxis, i) => Some(s"j$i" -> uniformJ(u.column, u))
      case _                   => None
    }
    val jSelect = js.flatten.map { case (nm, sql) => s"$sql AS $nm" }
    val idxSelect = groupCols ++ axes.zipWithIndex.map {
      case (u: UniformAxis, i) => s"${uniformIdx(s"j$i", u)} AS bin_${u.column}"
      case (e: EdgesAxis, _)   => s"${edgesIdx(e.column, e)} AS bin_${e.column}"
    }
    val keep = axes.zipWithIndex.map {
      case (u: UniformAxis, i) => uniformKeep(s"j$i", u)
      case (e: EdgesAxis, _)   => s"${edgesIdx(e.column, e)} IS NOT NULL"
    }
    val binNames = groupCols ++ axes.map(ax => s"bin_${ax.column}")
    val passthrough = groupCols ++ axes.collect { case e: EdgesAxis => e.column }
    val innerCols = (passthrough ++ jSelect).distinct
    val inner =
      if (jSelect.isEmpty) table
      else s"(SELECT *, ${jSelect.mkString(", ")} FROM $table${extraWhere.map(w => s" WHERE $w").getOrElse("")})"
    val outerWhere = keep.mkString(" AND ")
    s"""SELECT ${binNames.mkString(", ")}, count(*) AS cnt FROM (
       |  SELECT ${idxSelect.mkString(", ")} FROM $inner WHERE $outerWhere
       |) GROUP BY ${binNames.mkString(", ")}""".stripMargin.replace("\n", " ")
  }
}
