package graft

import graft.functions.ZValue
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order clustering: key correctness (golden interleave + SQL-surface
  * registration) and the layout property that justifies it — a z-sorted
  * layout gives file-level locality on BOTH clustering dimensions, where
  * a single-column sort gives it on one. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("z_value interleaves bits (golden) and registers on the SQL surface") {
    // x=5 (101), y=3 (011): even positions take x, odd take y →
    // z = x0<<0 | y0<<1 | x1<<2 | y1<<3 | x2<<4 | y2<<5 = 1+2+0+8+16+0
    val df = Seq((5L, 3L)).toDF("x", "y")
      .select(ZValue(col("x"), col("y"), 4).as("z"))
    assert(df.head().getLong(0) === 27L)
    // masking: only the low `bits` bits participate
    val masked = Seq((5L + 16L, 3L + 16L)).toDF("x", "y")
      .select(ZValue(col("x"), col("y"), 4).as("z"))
    assert(masked.head().getLong(0) === 27L)
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT z_value(5, 3, 4)").head().getLong(0) === 27L)
  }

  test("z_value is a bijection on the masked domain (property)") {
    // decode by de-interleaving must recover (x & mask, y & mask)
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var x = 0L; var y = 0L
      for (i <- 0 until bits) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val rnd = new scala.util.Random(42)
    val pairs = Seq.tabulate(256)(_ =>
      (rnd.nextLong().abs % 2048, rnd.nextLong().abs % 2048))
    val zs = pairs.toDF("x", "y")
      .select(col("x"), col("y"), ZValue(col("x"), col("y"), 11).as("z"))
      .collect()
    zs.foreach { r =>
      val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(deinterleave(z, 11) === ((x & 2047L, y & 2047L)))
      assert(z >= 0L && z < (1L << 22))
    }
    // distinct inputs → distinct keys
    assert(zs.map(_.getLong(2)).distinct.length === pairs.distinct.length)
  }

  test("z-sorted layout touches fewer files than date-sorted for a user-range filter") {
    val sf001 = "/root/testdata/sf0.01"
    val day = greatest(
      datediff(to_date(col("ts")), to_date(lit("2024-01-01"))), lit(0))
      .cast(LongType)
    val e = Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("value"), day.as("day_idx"))
      .withColumn("z", ZValue(col("day_idx"), col("user_id").cast(LongType), 11))

    val tmp = TempWork.fresh("zorder_spec")
    e.repartitionByRange(8, col("z"))
      .sortWithinPartitions("z")
      .write.mode("overwrite").parquet(s"$tmp/by_z")
    e.repartitionByRange(8, col("day_idx"))
      .sortWithinPartitions("day_idx")
      .write.mode("overwrite").parquet(s"$tmp/by_day")

    def filesTouched(path: String): Long = spark.read.parquet(path)
      .filter(col("user_id") >= 100 && col("user_id") < 150)
      .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(s"$tmp/by_z")
    val dayFiles = filesTouched(s"$tmp/by_day")
    // day-sorted files each span the full user range → every file holds
    // matching rows; z-sorted files cover narrow user ranges → few match
    assert(zFiles < dayFiles,
      s"expected z-layout locality: zFiles=$zFiles dayFiles=$dayFiles")

    // and the layouts are pure reorderings: same filtered aggregate
    val agg = (p: String) => spark.read.parquet(p)
      .filter(col("user_id") >= 100 && col("user_id") < 150)
      .agg(count(lit(1)), sum(col("user_id"))).head()
    assert(agg(s"$tmp/by_z") === agg(s"$tmp/by_day"))
  }
}
