package graft

import org.apache.spark.sql.functions._

import graft.ops.JdbcSync

/** The JDBC warehouse path against embedded Derby: overwrite-load,
  * partitioned parallel read, append batching, and the staged MERGE
  * upsert (the reference's Postgres ON CONFLICT shape). */
class JdbcSyncSpec extends SparkSpec {

  private def freshUrl(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_derby_")
    d.toFile.deleteOnExit()
    s"jdbc:derby:${d.resolve("db")};create=true"
  }

  private def nation = Tables.load(spark, sf0001, "nation")
    .select("n_nationkey", "n_name", "n_regionkey")

  test("overwrite + readAll round-trips a dimension") {
    val url = freshUrl()
    JdbcSync.overwrite(nation, url, "nation",
      varcharCols = Map("n_name" -> 64))
    val back = JdbcSync.readAll(spark, url, "nation")
    assert(rowsOf(back.orderBy("n_nationkey")) ==
      rowsOf(nation.orderBy("n_nationkey")))
  }

  test("partitioned read slices the key range across tasks") {
    val url = freshUrl()
    JdbcSync.overwrite(nation, url, "nation",
      varcharCols = Map("n_name" -> 64))
    val part = JdbcSync.read(spark, url, "nation",
      "n_nationkey", 0L, 24L, 4)
    assert(part.rdd.getNumPartitions == 4,
      "JDBC range read must plan one task per range slice")
    assert(part.count() == nation.count())
  }

  test("append adds rows") {
    val url = freshUrl()
    JdbcSync.overwrite(nation.filter(col("n_regionkey") < 2), url, "nation",
      varcharCols = Map("n_name" -> 64))
    JdbcSync.append(nation.filter(col("n_regionkey") >= 2), url, "nation")
    assert(JdbcSync.readAll(spark, url, "nation").count() == nation.count())
  }

  test("staged MERGE upsert equals Merge.upsert semantics") {
    val url = freshUrl()
    JdbcSync.overwrite(nation, url, "nation",
      varcharCols = Map("n_name" -> 64))
    val updates = nation.filter(col("n_nationkey") < 3)
      .withColumn("n_name", concat(col("n_name"), lit("_V2")))
      .unionByName(spark.range(900, 902)
        .select(col("id").cast("long").as("n_nationkey"),
          concat(lit("NEW_"), col("id")).as("n_name"),
          lit(9L).as("n_regionkey")))
    JdbcSync.upsertViaStaging(updates, url, "nation", "nation_stage",
      Seq("n_nationkey"), varcharCols = Map("n_name" -> 64))
    val expect = ops.Merge.upsert(nation, updates, Seq("n_nationkey"))
    assert(rowsOf(
      JdbcSync.readAll(spark, url, "nation").orderBy("n_nationkey")) ==
      rowsOf(expect.orderBy("n_nationkey")))
  }
}
