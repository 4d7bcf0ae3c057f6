package graft

import graft.ops.Exact
import org.apache.spark.sql.functions._

/** Dynamic partition overwrite: the write cost of a daily incremental
  * sync scales with the re-extracted delta, not the table — untouched
  * partitions keep their exact files. (Static overwrite mode — the
  * default — would truncate the whole table first.) */
class OverwriteSpec extends SparkSpec {

  private def partFiles(dir: String, day: String): Set[(String, Long)] = {
    val d = new java.io.File(s"$dir/event_date=$day")
    assert(d.isDirectory, s"missing partition dir $d")
    d.listFiles.filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length)).toSet
  }

  test("dynamic partition overwrite rewrites only the updated partitions") {
    val tmp = TempWork.fresh("dpospec")
    val e = Tables.load(spark, sf0001, "events")
      .withColumn("event_date", to_date(col("ts")))
      .select("event_id", "user_id", "value", "event_date")
    e.write.partitionBy("event_date").mode("overwrite").parquet(tmp)

    val untouchedBefore = partFiles(tmp, "2024-01-05")
    val touchedBefore = partFiles(tmp, "2024-01-12")
    val baseline05 = spark.read.parquet(tmp)
      .filter(col("event_date") === "2024-01-05")
      .agg(Exact.moneySum(col("value"))).head().getDouble(0)

    e.filter(col("event_date").between("2024-01-10", "2024-01-14"))
      .withColumn("value", col("value") * 2)
      .write.partitionBy("event_date").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .parquet(tmp)

    // untouched partition: exact same files; touched: rewritten
    assert(partFiles(tmp, "2024-01-05") === untouchedBefore)
    assert(partFiles(tmp, "2024-01-12") !== touchedBefore)
    // and the data reflects it: Jan 5 unchanged, Jan 12 doubled
    val after = spark.read.parquet(tmp)
    assert(after.filter(col("event_date") === "2024-01-05")
      .agg(Exact.moneySum(col("value"))).head().getDouble(0) === baseline05)
    val orig12 = e.filter(col("event_date") === "2024-01-12")
      .agg(Exact.moneySum(col("value") * 2)).head().getDouble(0)
    assert(after.filter(col("event_date") === "2024-01-12")
      .agg(Exact.moneySum(col("value"))).head().getDouble(0) === orig12)
  }
}
