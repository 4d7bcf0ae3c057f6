package graft
import graft.functions.TextOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch microbenchmark for chasing per-stage costs (not driver contract). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.contains("PROBE_NANOS_RULE"))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
        graft.plans.NanosPredicatePushdown :+ graft.plans.EagerMinMaxAggregation
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROBE $name%-28s ${(System.nanoTime() - t0) / 1e9}%6.3f s  ($n rows)")
    }
    val d = Tables.load(spark, dir, "documents")
    for (_ <- 1 to 2) {
      time("scan")(d.count())
      time("tokens")(d.select(TextOps.tokens(col("text")).as("tk")).count())
      val bg = d.select(col("lang"), TextOps.tokens(col("text")).as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("lang"), explode(transform(sequence(lit(1), size(col("tk")) - 1),
          i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1)))).as("bigram"))
      time("explode-bigrams")(bg.count())
      time("bigram-groupby")(bg.groupBy("lang", "bigram").count().count())
      time("q79-full")(SparkEntry.queries("q79_bigram_topk")(spark, dir).count())
      time("q96-full")(SparkEntry.queries("q96_sequence_pack")(spark, dir).count())
      val tc = d.select(col("lang"), col("doc_id"), TextOps.tokenCount(col("text")).as("n"))
      time("tokencount")(tc.count())
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      time("window-cumsum")(tc.withColumn("b", coalesce(sum(col("n")).over(w), lit(0L))).count())
      // q199 stage anatomy: where do the 2.5s go?
      val ts3 = TextOps.tokens(col("text"))
      val sh = d.select(col("doc_id"), ts3.as("ts"))
        .filter(size(col("ts")) >= 3)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("ts")) - 2), i =>
            concat_ws(" ", element_at(col("ts"), i),
              element_at(col("ts"), i + 1), element_at(col("ts"), i + 2))))
          .as("sh"))
      time("tfidf-shingles")(sh.count())
      val tf = sh.groupBy("doc_id", "sh").agg(count(lit(1)).as("tf"))
      time("tfidf-tf")(tf.count())
      val dfc = tf.groupBy("sh").agg(count(lit(1)).as("df"))
      time("tfidf-df")(dfc.count())
      val wgt = tf.join(dfc, "sh").filter(col("df") >= 2)
      time("tfidf-pairs-input")(wgt.count())
      val pairs = wgt.select(col("doc_id").as("a"), col("sh"))
        .join(wgt.select(col("doc_id").as("b"), col("sh")), "sh")
        .filter(col("a") < col("b"))
      time("tfidf-cand-pairs")(pairs.count())
      time("tfidf-dot-agg")(pairs.groupBy("a", "b").count().count())
      time("q199-full")(SparkEntry.queries("q199_tfidf_docsim")(spark, dir).count())
    }
    spark.stop()
  }
}
