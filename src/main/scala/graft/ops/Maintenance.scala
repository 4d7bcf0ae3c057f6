package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operations (K7 — the reference's `vacuum` /
  * lifecycle step, `src/etl/deltalake_sync.py:90,255`, re-expressed for a
  * parquet layout).
  *
  * The production problem this solves is small files: an incremental
  * sync that appends a few rows per run accretes thousands of tiny
  * parquet files, and at 100 TB the NameNode/listing and per-file open
  * costs dominate scans. Compaction rewrites the data into
  * ~`targetBytes` files. Write-then-swap keeps the table readable until
  * the new files are complete (the poor man's transaction — a real
  * deployment uses a table format's commit protocol for this).
  */
object Maintenance {

  /** Rewrite `dir` into files of roughly `targetBytes` each. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parquetFiles() = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles()
    // a partitionBy layout has no top-level data files; compacting it
    // here would rewrite the data flat while leaving the partition
    // directories in place (duplicates). Partitioned tables need
    // per-partition compaction — fail loudly instead.
    require(before.nonEmpty,
      s"$dir has no top-level parquet files — partitioned layouts must be " +
        "compacted per partition directory")
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val tmp = new Path(dir + "__compact_tmp")
    spark.read.parquet(dir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    // swap: remove old data files, move the compacted ones in
    before.foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(f.getPath, new Path(path, f.getPath.getName)))
    fs.delete(tmp, true)
    (before.length, parquetFiles().length)
  }

  /** K6 full-table delete (the reference's delete-then-reload reset,
    * re-expressed for a parquet layout): replace `dir`'s contents with
    * an EMPTY relation that preserves the table's read schema — a bare
    * directory wipe would make the next `spark.read.parquet` die on
    * schema inference, so one zero-row file carrying the schema stays
    * behind. Works on partitioned layouts too: the partition columns
    * fold back into the file schema (an empty table has no partitions
    * to prune; the next partitioned write re-establishes the layout).
    *
    * Like [[compact]], the directory itself stays present throughout —
    * the empty file is staged to a unique tmp dir, the old contents are
    * removed, and the staged file moves in. Single-writer assumption
    * (the reference's schedulers never overlap a sync with itself): a
    * concurrent reader never sees a MISSING path; in the brief
    * swap window it can see an empty directory and fail schema
    * inference, which is a retryable read error, not data loss. The
    * 100 TB path is `DELETE FROM` on a transactional table format,
    * where this whole dance is one metadata commit.
    * Returns the number of rows deleted. */
  def deleteAll(spark: SparkSession, dir: String): Long = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val df = spark.read.parquet(dir)
    val deleted = df.count()
    // unique staging name: concurrent deletes of DIFFERENT tables can
    // share a parent dir, and a crashed prior attempt must not collide
    val tmp = new Path(dir + "__delete_tmp_" + java.util.UUID.randomUUID())
    spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], df.schema)
      .coalesce(1) // exactly one task → exactly one schema-bearing file
      .write.mode("overwrite").parquet(tmp.toString)
    val empty = fs.listStatus(tmp)
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    fs.listStatus(path).foreach(f => fs.delete(f.getPath, true))
    require(fs.rename(empty, new Path(path, empty.getName)),
      s"swap failed: $empty -> $path")
    fs.delete(tmp, true)
    deleted
  }
}
