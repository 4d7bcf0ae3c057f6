package graft

/** D6: single CLI entry point (the reference's argparse dispatch,
  * `src/main.py:31-67`, re-expressed as one `runMain graft.Main
  * <command>` that routes to the tool mains). Each tool remains
  * independently runnable — this is the front door, not a wrapper layer.
  */
object Main {
  private val usage =
    """usage: graft.Main <command> [args]
      |
      |  bench                          time all queries (env: SPARK_GRAFT_SF_DIR,
      |                                 SPARK_GRAFT_CPUS, SPARK_GRAFT_ONE_SHOT_CUTOFF)
      |  verify <sfDir> <outDir>        dump query results + oracle SQL for the
      |                                 DuckDB correctness compare
      |  smoke <query>...               show rows + physical plan per query
      |  explain <query>...             formatted plan per query (sf0.1)
      |  scale-probe                    1x/10x/100x linearity probe
      |  entry                          run the flagship query (sf0.001), print row count
      |""".stripMargin

  def main(args: Array[String]): Unit = args.toList match {
    case "bench" :: rest        => Bench.main(rest.toArray)
    case "entry" :: Nil =>
      val spark = org.apache.spark.sql.SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
        .master("local[4]").config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try println(s"ENTRY_ROWS=${SparkEntry.entry(spark).count()}")
      finally spark.stop()
    case "verify" :: sf :: out :: Nil => Verify.main(Array(sf, out))
    case "smoke" :: rest if rest.nonEmpty => Smoke.main(rest.toArray)
    case "explain" :: rest if rest.nonEmpty => ExplainOne.main(rest.toArray)
    case "scale-probe" :: Nil   => ScaleProbe.main(Array.empty)
    case _ =>
      System.err.println(usage)
      sys.exit(2)
  }
}
