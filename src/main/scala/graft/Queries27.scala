package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Twenty-seventh query wave: RFM user segmentation (q206) — the classic
  * recency/frequency/monetary quintile grid over the event log, the
  * user-base health table next to q201's cohort matrix.
  */
object Queries27 {

  type Q = (SparkSession, String) => DataFrame

  private val DayUs = 86400000000L

  /** Per-user R/F/M quintiles (ntile over a total order — metric then
    * user id, so the cut is engine-deterministic), rolled up to the
    * segment grid: (r_q, f_q, m_q, n_users, avg_monetary_e4). Recency
    * ranks DESCENDING by last-seen day (quintile 1 = most recent);
    * frequency/monetary rank ascending (quintile 5 = best). */
  val q206RfmSegments: Q = (spark, dir) => {
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(max(expr(s"unix_micros(ts) div ${DayUs}L")).as("last_day"),
        count(lit(1)).as("freq"),
        sum(round(col("value") * 10000).cast("long")).as("monetary_e4"))
    val rq = ntile(5).over(Window.orderBy(col("last_day").desc,
      col("user_id").asc)).cast("long")
    val fq = ntile(5).over(Window.orderBy(col("freq").asc,
      col("user_id").asc)).cast("long")
    val mq = ntile(5).over(Window.orderBy(col("monetary_e4").asc,
      col("user_id").asc)).cast("long")
    perUser
      .withColumn("r_q", rq).withColumn("f_q", fq).withColumn("m_q", mq)
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        expr("sum(monetary_e4) div count(1)").as("avg_monetary_e4"))
      .orderBy("r_q", "f_q", "m_q")
  }

  val q206Sql: String =
    s"""WITH pu AS (SELECT user_id,
       |    max(epoch_us(ts) // $DayUs)::BIGINT AS last_day,
       |    count(*)::BIGINT AS freq,
       |    sum(round(value * 10000)::BIGINT)::BIGINT AS monetary_e4
       |  FROM events GROUP BY 1),
       |qt AS (SELECT user_id,
       |    ntile(5) OVER (ORDER BY last_day DESC, user_id ASC)::BIGINT AS r_q,
       |    ntile(5) OVER (ORDER BY freq ASC, user_id ASC)::BIGINT AS f_q,
       |    ntile(5) OVER (ORDER BY monetary_e4 ASC, user_id ASC)::BIGINT
       |      AS m_q,
       |    monetary_e4
       |  FROM pu)
       |SELECT r_q, f_q, m_q, count(*)::BIGINT AS n_users,
       |  (sum(monetary_e4) // count(*))::BIGINT AS avg_monetary_e4
       |FROM qt GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  val all: Map[String, Q] = Map("q206_rfm_segments" -> q206RfmSegments)
  val oracle: Map[String, String] = Map("q206_rfm_segments" -> q206Sql)
}
