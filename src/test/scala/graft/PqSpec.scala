package graft

import graft.functions.PqEncode
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Product-quantization encoder + ADC search. The encoder test checks the
  * codegen'd expression against an independent straight-Scala argmin over
  * the raw distances ‖v_s − C_c‖² (NOT the dot-form score the expression
  * uses — agreeing answers from the two formulations is the point), and
  * the ADC test checks the distributed top-k against a driver-side
  * brute-force over decoded centroids. */
class PqSpec extends SparkSpec {

  private val nSub = 8; private val nCents = 16; private val subDim = 8
  private val books = Similarity.pqLattice(nSub, nCents, subDim)

  private def encodeRef(v: Array[Double]): Seq[Int] =
    (0 until nSub).map { s =>
      val off = s * subDim
      (0 until nCents).minBy { c =>
        val cent = books(s)(c)
        // full squared distance, accumulated in BigDecimal so the
        // reference can't share a float-rounding artifact with the
        // expression's K − 2·dot shape (ties still break to lowest c
        // via minBy's first-wins)
        (0 until subDim).map { i =>
          val d = BigDecimal(v(off + i)) - BigDecimal(cent(i))
          d * d
        }.sum
      }
    }

  test("PqEncode matches an independent distance-form argmin on all fixture vectors") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val got = e.select(col("vec_id"),
        PqEncode(col("embedding"), books).as("codes"),
        col("embedding").cast("array<double>").as("v"))
      .collect()
    assert(got.length > 0)
    got.foreach { r =>
      val v = r.getSeq[Double](2).toArray
      assert(r.getSeq[Int](1) === encodeRef(v), s"vec_id=${r.getLong(0)}")
    }
  }

  test("PqEncode returns null for vectors shorter than nSub*subDim") {
    val df = spark.createDataFrame(Seq(Tuple1(Array(1.0f, 2.0f)))).toDF("v")
    assert(df.select(PqEncode(col("v"), books)).head().isNullAt(0))
  }

  test("PqEncode compiles under CODEGEN_ONLY over a NON-nullable child") {
    // Regression pin: the expression returns null for short vectors, so
    // nullable must be true even when the child is non-nullable —
    // otherwise codegen receives literal-false isNull, emits invalid
    // Java, and silently falls back to the interpreter (observed as 64
    // UnsafeProjection warnings per ScaleProbe pq_encode pass).
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try {
      // transform over sequence yields a non-nullable array<double>
      val vec = transform(sequence(lit(1), lit(nSub * subDim)),
        i => pmod(col("id") * i, lit(1000)).cast("double") / lit(1000.0))
      val out = spark.range(0, 8).toDF("id")
        .select(PqEncode(vec, books).as("codes"))
        .collect()
      assert(out.length === 8)
      assert(out.forall(!_.isNullAt(0)))
    } finally spark.conf.set(key, prev)
  }

  test("pqAdcTopK matches driver-side brute force over decoded centroids") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val all = e.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    val queries = all.take(2).toSeq
    val base = all.drop(2)
    val k = 4
    val got = Similarity.pqAdcTopK(e.filter(col("vec_id") >= 2), "vec_id",
        "embedding", queries, k)
      .orderBy("q_id", "rk").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = queries.flatMap { case (qid, q) =>
      base.map { case (vid, v) =>
        val codes = encodeRef(v)
        val adc = (0 until nSub).map { s =>
          val off = s * subDim
          val cent = books(s)(codes(s))
          (0 until subDim).map { i =>
            val d = q(off + i) - cent(i); d * d
          }.sum
        }.sum
        (qid, vid, adc)
      }.sortBy { case (_, vid, adc) => (adc, vid) }.take(k)
    }.map { case (qid, vid, _) => (qid, vid) }
    assert(got.toSeq === want)
  }
}
