package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch micro-probe for the TxnLog commit path (dev tool, not driver
  * contract): runs q269's phases (create / upsert / CDF read) separately,
  * three rounds in one JVM, printing per-phase wall time and the staged
  * file counts of each commit — the attribution tool for per-commit fixed
  * cost vs data work. Honors SPARK_GRAFT_CPUS and SPARK_GRAFT_SF_DIR. */
object TxnProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_EXTRA_CONF="k=v;k=v" — knob A/Bs (same dev hook as
    // StreamProbe)
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';')
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    def countFiles(dir: String, sub: String = ""): Int = {
      val d = java.nio.file.Paths.get(dir, sub)
      if (!java.nio.file.Files.isDirectory(d)) return 0
      val w = java.nio.file.Files.walk(d)
      try w.filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_txn_log")).count().toInt
      finally w.close()
    }
    // per-phase job accounting: jobs started during the phase, their
    // summed wall — the remainder of phase wall is driver-side work
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val jobSum = new java.util.concurrent.atomic.AtomicLong(0)
    val jobN = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobStart.put(js.jobId, js.time)
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val s = jobStart.getOrDefault(je.jobId, je.time)
          jobSum.addAndGet(je.time - s); jobN.incrementAndGet(): Unit
        }
      })
    def time[A](name: String)(f: => A): A = {
      Thread.sleep(20) // drain listener bus between phases
      jobSum.set(0); jobN.set(0)
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(20)
      println(f"TXNPROBE $name%-22s $wall%7.3f s  jobs=${jobN.get}%2d " +
        f"jobsum=${jobSum.get / 1e3}%6.3f s  driver=${wall - jobSum.get / 1e3}%6.3f s")
      r
    }
    for (round <- 1 to 6) {
      println(s"--- round $round ---")
      val tbl = TempWork.fresh("txnprobe")
      val o = Tables.load(spark, sfDir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice")
      val d98 = to_date(lit("1998-01-01"))
      time("create")(graft.sources.TxnLog.create(
        spark, tbl, o.filter(col("o_orderdate") < d98)))
      val nCreate = countFiles(tbl)
      val updates = o
        .filter(col("o_orderdate").between(
          to_date(lit("1997-06-01")), to_date(lit("1998-06-30"))))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      val v2 = time("upsert")(graft.sources.TxnLog.upsert(
        spark, tbl, updates, Seq("o_orderkey")))
      val nAll = countFiles(tbl)
      val nCdc = countFiles(tbl, "_change_data")
      println(s"TXNPROBE files: create=$nCreate total=$nAll cdc=$nCdc " +
        s"(upsert data files=${nAll - nCreate - nCdc})")
      time("cdf_read")(graft.sources.TxnLog
        .changesBetween(spark, tbl, 1L, v2)
        .groupBy("_change_type")
        .agg(count(lit(1)).as("n_rows"),
          graft.ops.Exact.moneySum(col("o_totalprice")).as("total_price"))
        .orderBy("_change_type").count())
    }
    spark.stop()
  }
}
