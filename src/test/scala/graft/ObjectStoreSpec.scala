package graft

import java.nio.file.Files

import graft.ops.ObjectStore

/** K5 — blob upload/list/delete through the Hadoop FileSystem API
  * (file:// here; gs://'s3a:// in production by classpath alone). */
class ObjectStoreSpec extends SparkSpec {

  test("upload / list / delete round-trip") {
    val src = Files.createTempFile("graft_blob_", ".csv")
    Files.write(src, "a,b\n1,2\n".getBytes)
    val bucket = Files.createTempDirectory("graft_bucket_")
    val url = s"file://$bucket/staging/part-0.csv"

    val uploaded = ObjectStore.upload(spark, src.toString, url)
    assert(uploaded.endsWith("/staging/part-0.csv"))

    val listed = ObjectStore.list(spark, s"file://$bucket/staging")
    assert(listed.map(_._2) == Seq(Files.size(src)),
      s"one object of the source's size expected, got $listed")

    assert(ObjectStore.delete(spark, url))
    assert(!ObjectStore.delete(spark, url), "second delete: already gone")
    assert(ObjectStore.list(spark, s"file://$bucket/staging").isEmpty)

    // prefix delete clears a staging dir in one call (the reference's
    // cleanup-in-except path, bigquery_sync.py:247-261)
    ObjectStore.upload(spark, src.toString, s"file://$bucket/staging/a.csv")
    ObjectStore.upload(spark, src.toString, s"file://$bucket/staging/b.csv")
    assert(ObjectStore.delete(spark, s"file://$bucket/staging",
      recursive = true))
    assert(ObjectStore.list(spark, s"file://$bucket/staging").isEmpty)
    TempWork.deleteRecursively(bucket)
  }

  test("a Spark write is readable through the same FS listing") {
    val bucket = Files.createTempDirectory("graft_bucket2_")
    val dest = s"file://$bucket/events_out"
    Tables.load(spark, sf0001, "nation").write.parquet(dest)
    val objs = ObjectStore.list(spark, dest)
    assert(objs.exists(_._1.endsWith(".parquet")),
      "task-written parquet parts must appear in the listing")
    assert(ObjectStore.delete(spark, dest, recursive = true))
    TempWork.deleteRecursively(bucket)
  }
}
