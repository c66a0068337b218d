package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe main for semantics experiments (dev-only, not part of the
  * library surface).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val df = Seq("abc中", "", "xy").toDF("s")
    df.select(
      ascii(col("s")).as("first_cp"),
      ascii(substring(col("s"), 4, 1)).as("cjk_cp"),
      ascii(substring(col("s"), 9, 1)).as("oob_cp"),
      length(col("s")).as("len"),
      rpad(col("s"), 5, "").as("padded"),
    ).show(false)
    df.select(split(col("s"), "").as("chars")).show(false)
    spark.stop()
  }
}
