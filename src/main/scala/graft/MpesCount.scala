package graft
import org.apache.spark.sql.SparkSession
object MpesCount {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[20]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = "/root/reference/tests/data/loader/mpes/Scan0030_2.h5"
    val (ev, _) = loader.StreamFixture.MpesH5Loader.readDataframe(spark, Seq(p))
    def time(tag: String)(f: => Unit): Unit = {
      f; val t0 = System.nanoTime(); f
      println(f"[mpes] $tag ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    import org.apache.spark.sql.functions._
    time("count")(ev.count())
    time("agg_sum_all")(ev.agg(sum("X"), sum("Y"), sum("t")).collect())
    time("noop_overwrite")(ev.write.format("noop").mode("overwrite").save())
    time("noop_append")(ev.write.format("noop").mode("append").save())
    println("executedPlan read path: " + ev.queryExecution.executedPlan.toString.linesIterator.take(3).mkString(" | "))
    spark.stop()
  }
}
