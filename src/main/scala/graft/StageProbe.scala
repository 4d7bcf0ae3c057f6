package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only stage profiler: `runMain graft.StageProbe <query>` runs the
  * named `SparkEntry.queries` entry once to warm codegen, then again with
  * a job/stage listener, printing per-job and per-stage wall-clock — the
  * tool for localizing WHICH exchange or eager boundary a slow query
  * spends its time in (TimeTwice says how slow; this says where). */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = if (args.nonEmpty) args(0) else "q183_containment"
    // honor SPARK_GRAFT_CPUS like Bench does, so per-core-count job/stage
    // composition can be compared (q269 anti-scaling attribution)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.NanosPredicatePushdown :+ graft.plans.EagerMinMaxAggregation
    val fn = SparkEntry.queries(qname)
    fn(spark, sfDir).count() // warm-up (JIT + codegen)

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    // listener callbacks fire on the listener-bus thread; a concurrent
    // queue + a drain AFTER waitUntilEmpty gives the main thread a
    // happens-before edge and loses no straggler stages
    val stages =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, js.time)
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val d = je.time - jobs.getOrDefault(je.jobId, je.time)
        println(f"JOB ${je.jobId}%3d ${d}%6d ms")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val d = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        stages.add((si.stageId, si.name.take(60), d, si.numTasks))
      }
    })
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    println(f"WARM TOTAL ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    // listenerBus.waitUntilEmpty is private[spark]; for a dev tool a
    // generous drain pause + the queue's safe publication suffices
    Thread.sleep(1500)
    import scala.jdk.CollectionConverters._
    stages.asScala.toSeq.sortBy(_._1).foreach { case (id, n, d, t) =>
      println(f"STAGE $id%4d ${d}%6d ms tasks=$t%3d  $n")
    }
    spark.stop()
  }
}
