package graft

import java.nio.file.Files

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.sources.TxnLog
import graft.sources.TxnLog.MergeClause

/** Randomized differential test of the general MERGE clause engine:
  * every trial builds a small keyed table plus a dup-free source,
  * draws a random clause set (conditions over either side, UPDATE /
  * DELETE / INSERT actions, NOT MATCHED BY SOURCE, differently-named
  * keys), runs [[TxnLog.merge]], and compares the resulting snapshot
  * against a PLAIN-SCALA reference evaluator implementing SQL MERGE
  * semantics (first-match-wins clause order, NULL condition = false,
  * unmatched rows kept). The clause set is data (a tiny ADT), so the
  * engine Columns and the reference booleans are derived from the
  * SAME spec — a disagreement is a genuine semantics bug, not a test
  * artifact. Seeds are fixed: failures reproduce. */
class MergePropertySpec extends SparkSpec {

  // ── clause spec ADT: one source of truth for both evaluators ──────
  private sealed trait Cond
  private case object Always extends Cond
  private case class SrcGt(c: Int) extends Cond   // __s.sv > c
  private case class TgtGt(c: Int) extends Cond   // __t.tv > c
  private sealed trait Act
  private case object Del extends Act
  private case object SetFromSrc extends Act      // tv = sv
  private case object Bump extends Act            // tv = tv + 1 (matched/nmbs)
  private case class Spec(cond: Cond, act: Act)

  private def condCol(c: Cond): Option[Column] = c match {
    case Always => None
    case SrcGt(v) => Some(col("__s.sv") > v)
    case TgtGt(v) => Some(col("__t.tv") > v)
  }
  private def condRef(c: Cond, t: Option[Int], s: Option[Int]): Boolean =
    c match {
      case Always => true
      case SrcGt(v) => s.exists(_ > v)  // NULL side → false, SQL's rule
      case TgtGt(v) => t.exists(_ > v)
    }

  private def matchedClause(sp: Spec): MergeClause = sp.act match {
    case Del => MergeClause(condCol(sp.cond), isDelete = true, Nil)
    case SetFromSrc => MergeClause(condCol(sp.cond), isDelete = false,
      Seq("tv" -> col("__s.sv")))
    case Bump => MergeClause(condCol(sp.cond), isDelete = false,
      Seq("tv" -> (col("__t.tv") + 1)))
  }
  private def insertClause(sp: Spec): MergeClause =
    MergeClause(condCol(sp.cond), isDelete = false,
      Seq("k" -> col("__s.sk"), "tv" -> col("__s.sv")))

  /** The reference evaluator: SQL MERGE over in-memory rows. */
  private def reference(tRows: Map[Int, Int], sRows: Map[Int, Int],
                        matched: Seq[Spec], notMatched: Seq[Spec],
                        nmbs: Seq[Spec]): Map[Int, Int] = {
    val out = scala.collection.mutable.Map.empty[Int, Int]
    tRows.foreach { case (k, tv) =>
      sRows.get(k) match {
        case Some(sv) =>
          matched.find(sp => condRef(sp.cond, Some(tv), Some(sv))) match {
            case Some(Spec(_, Del)) => ()              // deleted
            case Some(Spec(_, SetFromSrc)) => out(k) = sv
            case Some(Spec(_, Bump)) => out(k) = tv + 1
            case None => out(k) = tv                   // no clause fired
          }
        case None =>
          nmbs.find(sp => condRef(sp.cond, Some(tv), None)) match {
            case Some(Spec(_, Del)) => ()
            case Some(Spec(_, Bump)) => out(k) = tv + 1
            case Some(Spec(_, SetFromSrc)) =>
              sys.error("nmbs cannot read the source") // never generated
            case None => out(k) = tv
          }
      }
    }
    sRows.foreach { case (k, sv) =>
      if (!tRows.contains(k))
        notMatched.find(sp => condRef(sp.cond, None, Some(sv)))
          .foreach(_ => out(k) = sv)
    }
    out.toMap
  }

  test("random clause sets: engine snapshot == reference semantics") {
    val rnd = new scala.util.Random(421551)
    (1 to 14).foreach { trial =>
      val tRows = (0 to 14).filter(_ => rnd.nextBoolean())
        .map(k => k -> rnd.nextInt(20)).toMap
      val sRows = (0 to 19).filter(_ => rnd.nextBoolean())
        .map(k => k -> rnd.nextInt(20)).toMap
      def cond(): Cond = rnd.nextInt(3) match {
        case 0 => Always
        case 1 => SrcGt(rnd.nextInt(20))
        case 2 => TgtGt(rnd.nextInt(20))
      }
      def mAct(): Act = rnd.nextInt(3) match {
        case 0 => Del; case 1 => SetFromSrc; case 2 => Bump
      }
      var matched = Seq.fill(rnd.nextInt(3))(Spec(cond(), mAct()))
      var notMatched = Seq.fill(rnd.nextInt(2))(Spec(cond(), SetFromSrc))
      var nmbs = Seq.fill(rnd.nextInt(2))(
        Spec(cond(), if (rnd.nextBoolean()) Del else Bump))
      if (matched.isEmpty && notMatched.isEmpty && nmbs.isEmpty)
        notMatched = Seq(Spec(Always, SetFromSrc))
      // guard the generator's own rule: matched UPDATE needs assigns —
      // always true here (Del carries none, the rest assign tv)
      val dir = Files.createTempDirectory("graft_mprop_")
      dir.toFile.deleteOnExit()
      val t = dir.resolve("t").toString
      val tDf =
        if (tRows.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("k",
                org.apache.spark.sql.types.IntegerType),
              org.apache.spark.sql.types.StructField("tv",
                org.apache.spark.sql.types.IntegerType))))
        else spark.createDataFrame(tRows.toSeq).toDF("k", "tv")
      if (tRows.isEmpty) TxnLog.createEmpty(spark, t, tDf.schema)
      else TxnLog.create(spark, t, tDf)
      val sDf = spark.createDataFrame(
        (if (sRows.isEmpty) Seq((-99, 0)) else sRows.toSeq))
        .toDF("sk", "sv")
      val sEff = if (sRows.isEmpty) Map(-99 -> 0) else sRows
      TxnLog.merge(spark, t, sDf, keys = Seq("k"),
        matched = matched.map(matchedClause),
        notMatched = notMatched.map(insertClause),
        notMatchedBySource = nmbs.map(matchedClause),
        sourceKeys = Seq("sk"))
      val got = TxnLog.snapshot(spark, t).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      val want = reference(tRows, sEff, matched, notMatched, nmbs)
      assert(got == want,
        s"trial $trial diverged:\n  target=$tRows\n  source=$sEff\n" +
          s"  matched=$matched\n  notMatched=$notMatched\n" +
          s"  nmbs=$nmbs\n  engine=$got\n  reference=$want")
      TempWork.deleteRecursively(dir)
    }
  }
}
