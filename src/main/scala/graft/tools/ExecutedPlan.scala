package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the POST-EXECUTION physical plan of named queries — the one AQE
  * actually ran, with ReusedExchange/ReusedSubquery nodes and final stage
  * shapes that `explain()` before execution cannot show (the static plan
  * re-plans at runtime under AdaptiveSparkPlan):
  * `runMain graft.tools.ExecutedPlan q98_corpus_datasheet [...]`.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.001). */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      // materialize THIS dataframe's own query execution: an RDD-level
      // action on its executedPlan drives the AdaptiveSparkPlanExec root
      // itself to final stages (count()/noop-write would plan a DIFFERENT
      // query execution and leave this one un-finalized)
      df.queryExecution.executedPlan.execute().count()
      println(s"========== $name (executed) ==========")
      // toString on the adaptive root prints the FINAL plan once executed
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
