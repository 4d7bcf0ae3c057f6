package graft
import org.apache.spark.sql.SparkSession
object TimeTwice {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val b0 = SparkSession.builder()
    // dev knob: SPARK_GRAFT_NO_EXT=1 times without session extensions
    // (isolates analyzer-rule overhead from plan changes)
    val spark = (if (sys.env.contains("SPARK_GRAFT_NO_EXT")) b0
      else b0.config("spark.sql.extensions", "graft.GraftExtensions"))
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.NanosPredicatePushdown :+ graft.plans.EagerMinMaxAggregation
    // dev knob: SPARK_GRAFT_NO_AQE=1 times queries without adaptive
    // execution (isolates AQE's per-exchange job barriers from the plan)
    if (sys.env.contains("SPARK_GRAFT_NO_AQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val names = args.toSeq
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      val t0 = System.nanoTime(); fn(spark, sfDir).count()
      val c1 = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); fn(spark, sfDir).count()
      val c2 = (System.nanoTime() - t1) / 1e9
      println(f"TIME2 $n%-24s cold=$c1%6.2f warm=$c2%6.2f")
    }
    spark.stop()
  }
}
