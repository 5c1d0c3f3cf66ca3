package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's smoke check: runs SparkEntry.entry and
  * prints the row count (must be > 0). */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.show(5, truncate = 40)
    println(s"entry rows=${df.count()}")
    spark.stop()
  }
}
