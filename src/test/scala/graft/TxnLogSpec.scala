package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.TxnLog

/** The transaction-log table format: versioned snapshots, time travel,
  * optimistic-concurrency commits, idempotent init (D4), copy-on-write
  * MERGE, and vacuum (K7) — the transaction story around the merge
  * semantics MergeSpec already pins. */
class TxnLogSpec extends SparkSpec {

  private def freshTable(): String = {
    val d = Files.createTempDirectory("graft_txn_spec_")
    d.toFile.deleteOnExit()
    d.resolve("t").toString
  }

  private def nation = Tables.load(spark, sf0001, "nation")
    .select("n_nationkey", "n_name", "n_regionkey")

  test("create + snapshot round-trips; exists flips; versions = [1]") {
    val t = freshTable()
    assert(!TxnLog.exists(t))
    TxnLog.create(spark, t, nation)
    assert(TxnLog.exists(t))
    assert(TxnLog.versions(t) == Seq(1L))
    assert(rowsOf(TxnLog.snapshot(spark, t).orderBy("n_nationkey")) ==
      rowsOf(nation.orderBy("n_nationkey")))
  }

  test("append commits a new version; time travel reads the old one") {
    val t = freshTable()
    TxnLog.create(spark, t, nation.filter(col("n_regionkey") < 2))
    val v2 = TxnLog.append(spark, t, nation.filter(col("n_regionkey") >= 2))
    assert(v2 == 2L)
    assert(TxnLog.snapshot(spark, t).count() == nation.count())
    assert(TxnLog.snapshot(spark, t, Some(1L)).count() ==
      nation.filter(col("n_regionkey") < 2).count())
  }

  test("overwrite replaces contents but keeps history addressable") {
    val t = freshTable()
    TxnLog.create(spark, t, nation)
    TxnLog.overwrite(spark, t, nation.filter(col("n_regionkey") === 0))
    assert(TxnLog.snapshot(spark, t).count() ==
      nation.filter(col("n_regionkey") === 0).count())
    assert(TxnLog.snapshot(spark, t, Some(1L)).count() == nation.count())
  }

  test("copy-on-write upsert equals Merge.upsert semantics") {
    val t = freshTable()
    TxnLog.create(spark, t, nation)
    val updates = nation.filter(col("n_nationkey") < 3)
      .withColumn("n_name", concat(col("n_name"), lit("_V2")))
      .unionByName(spark.range(900, 902)
        .select(col("id").cast("long").as("n_nationkey"),
          concat(lit("NEW_"), col("id")).as("n_name"),
          lit(9L).as("n_regionkey")))
    TxnLog.upsert(spark, t, updates, Seq("n_nationkey"))
    val expect = ops.Merge.upsert(nation, updates, Seq("n_nationkey"))
    assert(rowsOf(TxnLog.snapshot(spark, t).orderBy("n_nationkey")) ==
      rowsOf(expect.orderBy("n_nationkey")))
    // and v1 is still the pre-merge table
    assert(TxnLog.snapshot(spark, t, Some(1L)).count() == nation.count())
  }

  test("createIfNotExists is idempotent (D4 existence probe)") {
    val t = freshTable()
    assert(TxnLog.createIfNotExists(spark, t, nation))
    assert(!TxnLog.createIfNotExists(spark, t,
      nation.filter(col("n_regionkey") === 0))) // second init is a no-op
    assert(TxnLog.snapshot(spark, t).count() == nation.count())
  }

  test("losing the commit race: append retries, stale overwrite throws") {
    val t = freshTable()
    TxnLog.create(spark, t, nation)
    // simulate a concurrent writer owning version 2
    val log2 = Paths.get(t, "_txn_log", f"${2L}%020d.log")
    Files.write(log2, java.util.Arrays.asList[String]())
    val v = TxnLog.append(spark, t, nation.filter(col("n_nationkey") === 0))
    assert(v == 3L, "blind append must skip past the contested version")
    // an overwrite computed from v1 is stale now that v2/v3 exist: the
    // CAS pin makes it fail instead of silently reverting those commits
    intercept[TxnLog.ConcurrentCommitException] {
      TxnLog.overwrite(spark, t, nation.limit(1), expectedVersion = Some(1L))
    }
  }

  test("vacuum drops files beyond retention; current snapshot survives") {
    val t = freshTable()
    TxnLog.create(spark, t, nation)
    TxnLog.overwrite(spark, t, nation.filter(col("n_regionkey") < 2))
    TxnLog.overwrite(spark, t, nation.filter(col("n_regionkey") === 0))
    def parquetCount() = {
      val s = Files.list(Paths.get(t))
      try s.filter(p => p.toString.endsWith(".parquet")).count()
      finally s.close()
    }
    val before = parquetCount()
    val deleted = TxnLog.vacuum(t, retainVersions = 1)
    assert(deleted.nonEmpty)
    assert(parquetCount() == before - deleted.size)
    // current snapshot unaffected
    assert(TxnLog.snapshot(spark, t).count() ==
      nation.filter(col("n_regionkey") === 0).count())
    // time travel past the horizon now fails at scan time
    intercept[Exception] {
      TxnLog.snapshot(spark, t, Some(1L)).count()
    }
  }

  test("uncommitted staging orphans are invisible and vacuumed") {
    val t = freshTable()
    TxnLog.create(spark, t, nation)
    // a crashed writer's staged-but-never-published file
    Files.write(Paths.get(t, "part-orphan.parquet"), Array[Byte](1, 2, 3))
    assert(TxnLog.snapshot(spark, t).count() == nation.count(),
      "readers replay the log; orphans must be invisible")
    val deleted = TxnLog.vacuum(t)
    assert(deleted.contains("part-orphan.parquet"))
  }
}
