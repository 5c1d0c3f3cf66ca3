package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a k× scaled copy of a fixture dir by unioning id-offset copies of
  * the fact tables (dimensions stay single — that's what dimensions do).
  * Foreign keys into dimensions are left untouched so joins stay valid;
  * primary/grouping keys get a per-copy offset so group counts scale
  * linearly instead of collapsing onto the same keys. Used for scaling
  * sanity runs (BASELINE.md), not for correctness gates. */
object GenScale {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, kStr) = args
    val k = kStr.toInt
    val off = 100000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def scaled(df: DataFrame, idCols: Seq[String]): DataFrame =
      (0 until k).map { i =>
        idCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * off)))
      }.reduce(_ unionByName _)

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    // dimensions: copied through unscaled
    Seq("region", "nation", "customer", "supplier", "part").foreach { n =>
      write(graft.io.Tables.load(spark, sfDir, n), n)
    }
    write(scaled(graft.io.Tables.orders(spark, sfDir), Seq("o_orderkey")), "orders")
    write(scaled(graft.io.Tables.lineitem(spark, sfDir), Seq("l_orderkey")), "lineitem")
    write(scaled(graft.io.Tables.events(spark, sfDir), Seq("event_id", "user_id")), "events")
    write(scaled(graft.io.Tables.documents(spark, sfDir), Seq("doc_id")), "documents")
    write(scaled(graft.io.Tables.embeddings(spark, sfDir), Seq("vec_id")), "embeddings")
    println(s"[genscale] wrote ${k}x of $sfDir to $outDir")
    spark.stop()
  }
}
