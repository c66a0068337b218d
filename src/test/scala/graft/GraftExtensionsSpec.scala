package graft

import org.apache.spark.sql.functions._

import graft.binning.{Binning, UniformAxis}

class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftExtensions.register(spark)
  }

  test("graft_bin_uniform in SQL matches the DataFrame API") {
    Seq(0.0, 1.4, 2.5, 499.0, -3.0, 500.0).toDF("value")
      .createOrReplaceTempView("vals")
    val viaSql = spark.sql(
      "SELECT graft_bin_uniform(value, 100, 0.0D, 500.0D) AS b FROM vals")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val ax = UniformAxis("value", 100, 0.0, 500.0)
    val viaApi = spark.table("vals")
      .select(Binning.uniformBinIndex(col("value"), ax).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(viaSql.toSeq === viaApi.toSeq)
    assert(viaSql.exists(_.isEmpty)) // -3.0 is out of range
  }

  test("graft_tof2ev and graft_interp evaluate correctly from SQL") {
    val e = spark.sql(
      "SELECT graft_tof2ev(1000.0D, 1.0E6D, 100.0D, 2.0D, 0, 1.0D, 0.5D) AS e")
      .as[Double].head()
    val r = 1.0e6 / ((1000.0 * 2.0) * 1.0 - 100.0)
    assert(e === 2.84281e-12 * (r * r) + 0.5)
    val v = spark.sql(
      "SELECT graft_interp(5.0D, array(0.0D, 10.0D), array(0.0D, 100.0D)) AS v")
      .as[Double].head()
    assert(v === 50.0)
  }

  test("text-pipeline and calibration scalars work from SQL") {
    val r = spark.sql(
      """SELECT graft_tof2ns(10.0D, 2.0E-9D, 1) AS tns,
        |  graft_mm_to_ps(25.6D, 25.3D) AS ps,
        |  graft_poly_hash('abc', 3) AS h,
        |  graft_token_count(' a b  c ') AS n,
        |  graft_lang_id('the cat and the dog') AS lang,
        |  graft_fingerprint('  A  b ') AS fp,
        |  graft_hamming(graft_simhash('a b c'), graft_simhash('a b c')) AS hd,
        |  graft_hash_bucket('42') AS bkt,
        |  graft_sig_agreement(array(1L, 2L, 3L), array(1L, 9L, 3L)) AS agr,
        |  graft_normalize_text('Hello,  World!') AS norm,
        |  graft_cosine(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS cosz,
        |  graft_cosine(array(2.0D, 0.0D), array(1.0D, 0.0D)) AS cos1,
        |  graft_feature_buckets('a b', 64) AS fb
        |""".stripMargin).collect().head
    assert(r.getAs[Double]("cosz") === 0.0)
    assert(r.getAs[Double]("cos1") === 1.0)
    // 2 unigrams + 1 bigram, every bucket in range
    val fb = r.getAs[scala.collection.Seq[Int]]("fb")
    assert(fb.length === 3)
    assert(fb.forall(b => b >= 0 && b < 64))
    assert(r.getAs[Double]("tns") === 10.0 * 1e9 * 2.0e-9 * 2.0)
    assert(math.abs(r.getAs[Double]("ps") - (25.6 - 25.3) / 0.15) < 1e-12)
    assert(r.getAs[Long]("h") ===
      ('a' * 31L * 31L + 'b' * 31L + 'c') % graft.pipeline.TextOps.PolyPrime)
    assert(r.getAs[Int]("n") === 3)
    assert(r.getAs[String]("lang") === "en")
    assert(r.getAs[String]("fp") ===
      java.security.MessageDigest.getInstance("MD5")
        .digest("a b".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    assert(r.getAs[Int]("hd") === 0)
    assert(r.getAs[Long]("bkt") >= 0L && r.getAs[Long]("bkt") < 1000L)
    assert(r.getAs[Int]("agr") === 2)
    assert(r.getAs[String]("norm") === "hello world")
  }

  test("HTML kernels work from SQL") {
    val r = spark.sql(
      """SELECT graft_html_text('<p>a &amp; b</p><script>x</script>') AS t,
        |  graft_html_markdown('<h1>T</h1><p><b>x</b></p>') AS m,
        |  graft_tag_texts('<u><loc>p</loc><loc>q</loc></u>', 'loc') AS l
        |""".stripMargin).collect().head
    assert(r.getAs[String]("t") === "a & b")
    assert(r.getAs[String]("m") === "# T\n**x**")
    assert(r.getAs[scala.collection.Seq[String]]("l").toSeq === Seq("p", "q"))
  }

  test("non-literal parameters are rejected with a clear error") {
    Seq(1.0).toDF("value").createOrReplaceTempView("v1")
    val err = intercept[Exception] {
      spark.sql("SELECT graft_bin_uniform(value, CAST(value AS INT), 0.0D, 1.0D) FROM v1")
        .collect()
    }
    assert(err.getMessage.toLowerCase.contains("literal"))
  }
}
