package graft
import org.apache.spark.sql.SparkSession

/** Throwaway dev runner: show results + physical plan for named queries. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      val df = SparkEntry.queries(q)(spark, sfDir)
      println(s"===== $q =====")
      df.show(12, truncate = false)
      println(df.queryExecution.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
