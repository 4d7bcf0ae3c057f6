package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer statistics: ANALYZE TABLE feeds real row counts
  * and column NDVs into Catalyst — the signal join reordering and
  * broadcast selection run on at scale, where file size is a bad proxy
  * for post-filter cardinality. */
class CboSpec extends SparkSpec {

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("ANALYZE TABLE row and column statistics reach the optimized plan") {
    withConf("spark.sql.cbo.enabled" -> "true") {
      spark.sql("DROP TABLE IF EXISTS graft_cbo_t")
      try {
        Tables.load(spark, sf0001, "nation").write.saveAsTable("graft_cbo_t")
        spark.sql("ANALYZE TABLE graft_cbo_t COMPUTE STATISTICS FOR COLUMNS n_nationkey")
        val stats = spark.table("graft_cbo_t").queryExecution.optimizedPlan.stats
        assert(stats.rowCount === Some(BigInt(25)),
          s"analyzed row count must propagate, got ${stats.rowCount}")
        val colStat = stats.attributeStats.find(_._1.name == "n_nationkey").map(_._2)
        assert(colStat.flatMap(_.distinctCount) === Some(BigInt(25)),
          s"column NDV must propagate, got $colStat")
        // CBO cardinality estimation: an equality filter on the analyzed
        // key estimates ~rowCount/NDV = 1 row, not a file-size guess
        val est = spark.table("graft_cbo_t")
          .filter(col("n_nationkey") === 7)
          .queryExecution.optimizedPlan.stats.rowCount
        assert(est.exists(_ <= BigInt(2)),
          s"filter estimate should use NDV, got $est")
      } finally spark.sql("DROP TABLE IF EXISTS graft_cbo_t")
    }
  }
}
