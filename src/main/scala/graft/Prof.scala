package graft

import org.apache.spark.sql.SparkSession

/** Per-query profiling harness: `runMain graft.Prof <query> [<query> …]`
  * times each named `SparkEntry.queries` entry twice (cold = includes
  * codegen/JIT of that query's plan; warm = steady state) against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1). Not part of the driver contract —
  * a development tool for chasing per-query regressions that `Bench`'s
  * single-shot totals can't localize.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+
        graft.plans.NanosPredicatePushdown :+ graft.plans.EagerMinMaxAggregation
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { run =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"PROF $name run$run $sec%.3f s ($n rows)")
      }
    }
    spark.stop()
  }
}
