package graft.tools

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Per-query cost breakdown for the optimization rounds:
  * `runMain graft.tools.Profile <sfDir> <reps> <name> [name...]`.
  *
  * For each named query, prints (after `reps` timed runs, min wall):
  * jobs / stages / tasks launched, summed task time, summed shuffle
  * read+write bytes, and the plan/analysis wall (time from queries(name)
  * call to executedPlan materialization, measured on a FRESH DataFrame so
  * nothing is pre-analyzed). Separating driver-side plan cost and
  * stage-count overhead from genuine compute is guide §1 step 0: a query
  * whose task time is 1/10th of its wall is stage-latency-bound (fix the
  * plan shape, not the kernels); one whose task time ≈ wall × cores is
  * compute-bound (fix the kernels).
  *
  * Session config matches [[graft.Bench]] (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus) so numbers line up with BENCH_full.json. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    val jobs = new AtomicInteger(0)
    val jobEnds = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val gcMs = new AtomicLong(0L)
    val shuffleBytes = new AtomicLong(0L)
    val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageMs = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageShuf = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobEnds.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        stageNames.put(s.stageInfo.stageId,
          s.stageInfo.name.linesIterator.next().take(120))
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskNanos.addAndGet(m.executorRunTime * 1000000L)
          gcMs.addAndGet(m.jvmGCTime)
          val sb = m.shuffleReadMetrics.totalBytesRead + m.shuffleWriteMetrics.bytesWritten
          shuffleBytes.addAndGet(sb)
          stageMs.computeIfAbsent(t.stageId, _ => new AtomicLong)
            .addAndGet(m.executorRunTime)
          stageShuf.computeIfAbsent(t.stageId, _ => new AtomicLong)
            .addAndGet(sb)
          stageTasks.computeIfAbsent(t.stageId, _ => new AtomicLong)
            .incrementAndGet()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // plan cost: fresh frame, force analysis + optimization + physical
      // planning without executing; tracker splits the phases
      val tp0 = System.nanoTime()
      val qe = fn(spark, sfDir).queryExecution
      qe.executedPlan
      val planSec = (System.nanoTime() - tp0) / 1e9
      val phases = qe.tracker.phases.map { case (p, s) =>
        f"$p=${(s.endTimeMs - s.startTimeMs) / 1e3}%.2f" }.mkString(" ")
      System.err.println(s"[profile] $name phases: $phases")
      if (sys.env.contains("GRAFT_PROFILE_RULES")) {
        org.apache.spark.sql.catalyst.rules.RuleExecutor.resetMetrics()
        fn(spark, sfDir).queryExecution.executedPlan
        val top = org.apache.spark.sql.catalyst.rules.RuleExecutor.dumpTimeSpent()
        System.err.println(s"[profile] $name rules:\n" +
          top.linesIterator.take(25).mkString("\n"))
      }
      val runs = (1 to reps).map { _ =>
        jobs.set(0); jobEnds.set(0); stages.set(0); tasks.set(0)
        taskNanos.set(0L); gcMs.set(0L); shuffleBytes.set(0L)
        stageNames.clear(); stageMs.clear(); stageShuf.clear()
        stageTasks.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // the listener bus is async: wait until every started job has
        // reported its end AND the task counters have been quiet for a
        // beat (ADVICE r18 — the previous fixed 150 ms sleep let straggler
        // task-end events bleed into the next rep's totals)
        val deadline = System.nanoTime() + 5L * 1000000000L
        var lastTasks = -1
        while (System.nanoTime() < deadline &&
            (jobEnds.get < jobs.get || tasks.get != lastTasks)) {
          lastTasks = tasks.get
          Thread.sleep(50)
        }
        (wall,
          jobs.get, stages.get, tasks.get, taskNanos.get / 1e9,
          shuffleBytes.get, gcMs.get / 1e3)
      }
      val best = runs.minBy(_._1)
      System.err.println(
        f"[profile] $name wall=${best._1}%.3f plan=$planSec%.3f " +
        f"jobs=${best._2} stages=${best._3} tasks=${best._4} " +
        f"taskSec=${best._5}%.2f gcSec=${best._7}%.2f shufMB=${best._6 / 1e6}%.1f " +
        f"runs=${runs.map(r => f"${r._1}%.2f").mkString(",")}")
      // top stages by summed task time — from the LAST rep (maps cleared
      // per rep), which is fine for attribution: plan shape is identical
      import scala.jdk.CollectionConverters._
      stageMs.asScala.toSeq.sortBy(-_._2.get).take(6).foreach { case (sid, ms) =>
        System.err.println(f"[profile]   stage $sid taskSec=${ms.get / 1e3}%.2f " +
          f"tasks=${stageTasks.getOrDefault(sid, new AtomicLong).get} " +
          f"shufMB=${stageShuf.get(sid).get / 1e6}%.1f ${stageNames.getOrDefault(sid, "?")}")
      }
    }
    spark.stop()
  }
}
