package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling / rebalancing for training-data
  * pipelines. Every operator is reproducible from the data alone (content
  * or id hashing, never `rand()`), so a re-run over re-partitioned,
  * re-ordered, or incrementally grown inputs selects the same rows — the
  * property that makes dataset versions diffable at 100 TB.
  */
object Sampling {

  private def requireFresh(df: DataFrame, names: String*): Unit = {
    val clash = df.columns.toSet.intersect(names.toSet)
    require(clash.isEmpty,
      s"input already has reserved column(s) ${clash.mkString(", ")} — " +
        "rename them first")
  }

  /** Per-mille deterministic hash bucket of a key column (0..999): the
    * portable two-polynomial hash of the key's string form, reduced mod
    * 1000. Stable across engines — [[graft.OracleSql.portableTokenHashSql]]
    * renders the identical value in SQL.
    */
  def hashBucket(key: Column): Column =
    pmod(TextOps.portableTokenHash(key.cast("string")), lit(1000L))

  /** Deterministic Bernoulli sample: keep a row iff its key hashes into
    * the first `permille` of 1000 buckets. A pure codegen'd filter — no
    * shuffle, pushdown-friendly, and the sampled set is a superset-stable
    * function of the keys (growing `permille` only ever ADDS rows, the
    * property A/B data ablations rely on).
    */
  def hashSample(df: DataFrame, keyCol: String, permille: Int): DataFrame = {
    require(permille >= 0 && permille <= 1000, s"permille=$permille")
    df.filter(hashBucket(col(keyCol)) < permille)
  }

  /** Deterministic dataset split assignment (train/val/test): label each
    * row by where its [[hashBucket]] falls among the cumulative
    * per-mille ranges, in the order given. Content-hashed, so the split
    * is stable under re-partitioning, re-ordering, and corpus growth
    * (an existing row never changes split when new rows arrive — the
    * invariant eval-set hygiene depends on), and a pure codegen'd
    * projection: no shuffle, no sampling job. Ranges must sum to ≤ 1000;
    * rows hashing past the last range get NULL (holdout drop).
    */
  def assignSplit(
      df: DataFrame,
      keyCol: String,
      splits: Seq[(String, Int)],
      splitCol: String = "split",
  ): DataFrame = {
    require(splits.nonEmpty, "splits is empty")
    require(splits.forall(_._2 > 0), s"per-mille widths must be positive: $splits")
    require(splits.map(_._2).sum <= 1000,
      s"split widths sum to ${splits.map(_._2).sum} > 1000")
    val bucket = hashBucket(col(keyCol))
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cuts).reverse.foldLeft(lit(null).cast("string")) {
      case (acc, ((name, _), hi)) => when(bucket < hi, lit(name)).otherwise(acc)
    }
    df.withColumn(splitCol, label)
  }

  /** Per-group cap (class rebalancing / boilerplate-source down-weighting):
    * keep at most `maxPerGroup` rows per key, chosen deterministically as
    * the lowest `orderCol` values. One window shuffle keyed on the group
    * columns; pair with [[Dedup.saltBlocks]] upstream if one group
    * dominates the corpus.
    */
  def capPerGroup(
      df: DataFrame,
      keyCols: Seq[String],
      orderCol: String,
      maxPerGroup: Int,
  ): DataFrame = {
    requireFresh(df, "_rn")
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxPerGroup)
      .drop("_rn")
  }

  /** Stratified deterministic sample: an independent [[hashSample]] rate
    * per stratum value (unlisted strata drop out). The hash is salted with
    * the stratum so a row's fate in one stratum is independent of its fate
    * under another stratification.
    */
  def stratifiedHashSample(
      df: DataFrame,
      keyCol: String,
      stratumCol: String,
      permilleByStratum: Map[String, Int],
  ): DataFrame = {
    val bucket = pmod(
      TextOps.portableTokenHash(
        concat_ws("\u0001", col(stratumCol), col(keyCol).cast("string"))),
      lit(1000L))
    val rate = permilleByStratum.foldLeft(lit(0)) { case (acc, (s, p)) =>
      when(col(stratumCol) === s, lit(p)).otherwise(acc)
    }
    df.filter(bucket < rate)
  }

  /** Deterministically resample a corpus to a target domain mixture
    * (DoReMi/Pile-style: "train on 30 % web, 20 % code, …"). Produces the
    * LARGEST corpus achievable by pure downsampling with exactly the
    * target shares: the output size is `N = floor(min_d count_d /
    * share_d)` and each domain keeps `share_d · N` rows in expectation,
    * selected by the salted portable content hash — so the same corpus
    * always resamples identically, and domains not listed drop out.
    *
    * A listed domain with NO rows in the corpus is ignored: the mix is
    * achieved over the domains actually present (their relative shares
    * renormalize implicitly). Callers needing strictness should compare
    * the output's domain set against `targetShares.keySet`.
    *
    * Plan shape at scale: ONE tiny keyed agg for the per-domain counts
    * (map-side combine; |domains| rows), the binding-constraint `N` as a
    * keyless window over those few rows, then the rate table broadcast
    * back onto the corpus scan — the corpus itself is filtered map-side
    * and never shuffled.
    */
  def resampleToMixture(
      df: DataFrame,
      keyCol: String,
      domainCol: String,
      targetShares: Map[String, Double],
  ): DataFrame = {
    require(targetShares.nonEmpty, "targetShares is empty")
    require(targetShares.values.forall(_ > 0), s"shares must be positive: $targetShares")
    val tot = targetShares.values.sum
    require(math.abs(tot - 1.0) < 1e-9, s"shares must sum to 1, got $tot")
    val shares = targetShares.toSeq.sortBy(_._1).foldLeft(lit(null).cast("double")) {
      case (acc, (dom, s)) => when(col(domainCol) === dom, lit(s)).otherwise(acc)
    }
    val counts = df
      .select(col(domainCol)).filter(shares.isNotNull)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).as("_cnt"))
      .withColumn("_share", shares)
    val w = Window.partitionBy()
    // binding constraint: the domain whose inventory runs out first
    val rates = counts.withColumn("_n_out",
      floor(min(col("_cnt").cast("double") / col("_share")).over(w)))
    // salted per-row uniform draw, exactly the stratifiedHashSample form
    val u = (pmod(
      TextOps.portableTokenHash(
        concat_ws("\u0001", col(domainCol), col(keyCol).cast("string"))),
      lit(1000003L)).cast("double") + 0.5) / 1000003.0
    df.join(broadcast(rates.select(col(domainCol), col("_cnt"), col("_share"),
        col("_n_out"))), Seq(domainCol))
      .filter(u < col("_share") * col("_n_out") / col("_cnt").cast("double"))
      .drop("_cnt", "_share", "_n_out")
  }

  /** Temperature-scaled domain rebalancing (the multilingual α-sampling
    * recipe of mBERT/XLM — Devlin et al. 2019, Conneau & Lample 2019):
    * target share of domain `d` is `count_d^α / Σ count^α`. `α = 1`
    * keeps the natural distribution, `α = 0` equalizes all domains,
    * values between damp the head so low-resource domains survive.
    * Largest exact downsample mix, deterministic per row — the same
    * binding-constraint + salted-hash-draw machinery as
    * [[resampleToMixture]], but the share table is computed IN-PLAN
    * from the domain census (no driver-side map, so it composes with
    * any upstream frame in one job).
    *
    * Plan shape at scale: one map-side-combined census (|domains| rows),
    * two keyless windows over those few rows, rate table broadcast back
    * onto the corpus scan; the corpus filters map-side, never shuffles.
    */
  def resampleByTemperature(
      df: DataFrame,
      keyCol: String,
      domainCol: String,
      alpha: Double,
  ): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha=$alpha outside [0, 1]")
    val counts = df.groupBy(col(domainCol)).agg(count(lit(1)).as("_cnt"))
    val w = Window.partitionBy()
    val shares = counts.withColumn("_share",
      pow(col("_cnt").cast("double"), alpha) /
        sum(pow(col("_cnt").cast("double"), alpha)).over(w))
    val rates = shares.withColumn("_n_out",
      floor(min(col("_cnt").cast("double") / col("_share")).over(w)))
    val u = (pmod(
      TextOps.portableTokenHash(
        concat_ws("\u0001", col(domainCol), col(keyCol).cast("string"))),
      lit(1000003L)).cast("double") + 0.5) / 1000003.0
    df.join(broadcast(rates), Seq(domainCol))
      .filter(u < col("_share") * col("_n_out") / col("_cnt").cast("double"))
      .drop("_cnt", "_share", "_n_out")
  }

  /** Data-mixture report: per-group document count, token count, and the
    * group's share of corpus tokens — the summary that drives domain
    * reweighting decisions (what rates to feed [[stratifiedHashSample]]).
    *
    * Plan shape at scale: ONE keyed aggregation over the corpus with
    * map-side combine; the corpus total is a keyless window over the
    * grouped result — whose cardinality is the number of groups (sources/
    * domains: bounded and small by nature), so the single-partition window
    * is free and the corpus is never scanned twice.
    */
  def mixtureReport(
      df: DataFrame,
      textCol: String,
      groupCols: Seq[String],
  ): DataFrame = {
    val grouped = df
      .select(col(textCol) :: groupCols.map(col).toList: _*)
      .withColumn("_n", TextOps.tokenCount(col(textCol)).cast("long"))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("docs"), sum(col("_n")).as("tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    grouped.withColumn("token_share",
      round(col("tokens").cast("double") / sum(col("tokens")).over(w), 6))
  }

  /** Deterministic weighted sampling without replacement, k per group
    * (Efraimidis–Spirakis A-ES): each row draws `u ∈ (0,1)` from the
    * PORTABLE hash of its key and survives if its priority `u^(1/w)` ranks
    * in the group's top k — higher weight ⇒ priority closer to 1 ⇒ more
    * likely kept, and the same corpus always yields the same sample
    * (reproducible training mixtures). Weights must be positive.
    *
    * Plan shape: the priority is a map-side projection; selection is one
    * `row_number` window per group — a single key shuffle, no global
    * sort. Cross-engine note: `pow` may differ from another engine's libm
    * in the last ulp; a rank flip needs two priorities within ~1e-16 at
    * the cut, which hash-derived draws make vanishingly unlikely.
    *
    * Rows with non-positive (or null) weight draw a null priority and
    * rank behind every weighted row, so they are only emitted when a
    * group has fewer than `k` positively-weighted members — NOT an ANSI
    * divide-by-zero error mid-job (Spark 4 ANSI `Divide` throws on
    * zero even for doubles).
    */
  def weightedHashSample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      groupCols: Seq[String],
      k: Int,
  ): DataFrame = {
    requireFresh(df, "_pri")
    val u = (pmod(TextOps.portableTokenHash(col(keyCol).cast("string")),
      lit(1000003L)).cast("double") + 0.5) / 1000003.0
    val w = col(weightCol).cast("double")
    val pri = when(w > 0.0, pow(u, lit(1.0) / w))
    graft.dfops.DfOps.topKPerGroup(
      df.withColumn("_pri", pri), groupCols,
      Seq(col("_pri").desc, col(keyCol)), k)
      .drop("_pri")
  }

  /** Epoch-style mixture upsampling: materialize each group's rows
    * `epochs(group)` times — the "n epochs of Wikipedia" knob of
    * published pretraining mixtures. The integer part replicates
    * exactly; the fractional part keeps one extra copy per row via the
    * salted deterministic hash coin (the [[resampleToMixture]] draw),
    * so the realized size hits the target in expectation and is
    * reproducible from the data alone. Copies carry a 0-based
    * `epoch_copy` index so downstream packing/shuffling treats them as
    * distinct sequences. Groups absent from the map pass through once;
    * a `0.0` entry drops its group entirely.
    *
    * Plan shape at scale: a map-side `sequence`+`explode` generator
    * only — no shuffle, no join; output rows ≈ Σ_g n_g·epochs(g).
    */
  def upsampleEpochs(
      df: DataFrame,
      keyCol: String,
      groupCol: String,
      epochs: Map[String, Double],
  ): DataFrame = {
    require(epochs.values.forall(e => e >= 0 && !e.isNaN && !e.isInfinite),
      s"epochs must be finite and >= 0: $epochs")
    val e = epochs.toSeq.sortBy(_._1).foldLeft(lit(1.0)) {
      case (acc, (g, v)) => when(col(groupCol) === g, lit(v)).otherwise(acc)
    }
    val u = (pmod(
      TextOps.portableTokenHash(
        concat_ws("\u0001", col(groupCol), col(keyCol).cast("string"))),
      lit(1000003L)).cast("double") + 0.5) / 1000003.0
    val n = floor(e).cast("int") + when(u < e - floor(e), 1).otherwise(0)
    df.withColumn("_n_copies", n)
      .filter(col("_n_copies") > 0)
      .withColumn("epoch_copy",
        explode(sequence(lit(0), col("_n_copies") - 1)))
      .drop("_n_copies")
  }

  /** Hierarchical mixture report: [[mixtureReport]]'s census with
    * subtotal rows at every rollup level (per (dim1, dim2, …), per dim1
    * prefix, grand total), each tagged with Spark's `grouping_id` bit
    * vector so consumers can split levels without null-sniffing the
    * dimension columns.
    *
    * Plan shape: ONE `rollup` aggregation — Catalyst expands the
    * grouping sets map-side (`Expand`), so the corpus is scanned once
    * and the exchange carries `levels × groups` rows, not events.
    */
  def mixtureRollup(
      df: DataFrame,
      dims: Seq[String],
      weight: Column,
  ): DataFrame =
    df.rollup(dims.map(col): _*)
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("docs"),
        sum(weight.cast("long")).as("weight"))

  /** Keep each group's top `frac` fraction of rows by `scoreCol` (ties
    * broken by `idCol` so the cut is deterministic) — the
    * percentile-threshold quality filter: "keep the best 25 % per
    * domain" adapts the bar to each domain's score distribution instead
    * of one global constant that starves clean domains and floods noisy
    * ones. Kept count is `ceil(frac * n)`, so every non-empty group
    * keeps at least one row when `frac > 0`.
    *
    * Plan shape: `row_number` and `count` share one partition key →
    * ONE exchange, per-group sort; no global sort, no second scan.
    */
  def topPercentByGroup(
      df: DataFrame,
      scoreCol: String,
      idCol: String,
      groupCols: Seq[String],
      frac: Double,
  ): DataFrame = {
    require(frac >= 0 && frac <= 1, s"frac=$frac")
    requireFresh(df, "_rn", "_n")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val ranked = byGroup.orderBy(col(scoreCol).desc, col(idCol))
    df.withColumn("_rn", row_number().over(ranked))
      .withColumn("_n", count(lit(1)).over(byGroup))
      .filter(col("_rn") <= ceil(col("_n") * frac))
      .drop("_rn", "_n")
  }

  /** Contiguous 0-based sequential ids in the global sort order of
    * `orderCols` — the scalable replacement for
    * `row_number() OVER (ORDER BY …)`, whose empty-PARTITION-BY window
    * funnels the whole corpus through ONE task. Here the corpus is
    * range-repartitioned on the keys (globally ordered partitions),
    * sorted within each, and ids attach via the zipWithIndex recipe: a
    * lightweight per-partition count job (its shuffle output is reused,
    * not recomputed) turns into starting offsets, and the id map is pure
    * per-partition arithmetic. Driver traffic is one Long per partition.
    *
    * Ids are deterministic iff `orderCols` is a total order (e.g.
    * includes a unique key); ties otherwise get arbitrary-but-contiguous
    * ids. The RDD hop is deliberate: this is genuine per-partition
    * imperative logic (offset + running counter) that no Catalyst window
    * can express without collapsing to a single partition.
    */
  def withSequentialIds(
      df: DataFrame,
      orderCols: Seq[String],
      idCol: String = "seq_id",
      numPartitions: Int = 0,
  ): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField(
          idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val zipped = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
    }
    spark.createDataFrame(zipped, schema)
  }

  /** Deterministic epoch shuffle for training order: a reproducible
    * pseudo-random total order from the SALTED portable content hash
    * (different `salt` per epoch → a fresh order; same salt → the same
    * order on any engine/partitioning), materialized as a contiguous
    * `shuffle_pos` via [[withSequentialIds]] — the range-repartition +
    * zipWithIndex path, never a single-partition global window. Hash
    * ties (collisions mod the prime) break by the key itself, keeping
    * the order total and stable.
    */
  def shuffleDeterministic(
      df: DataFrame,
      keyCol: String,
      salt: String,
      posCol: String = "shuffle_pos",
      numPartitions: Int = 0,
  ): DataFrame = {
    requireFresh(df, "__shuffle_h")
    val h = pmod(TextOps.portableTokenHash(
      concat(col(keyCol).cast("string"), lit("\u0001" + salt))),
      lit(1000000007L))
    withSequentialIds(df.withColumn("__shuffle_h", h),
      Seq("__shuffle_h", keyCol), posCol, numPartitions)
      .drop("__shuffle_h")
  }
}
