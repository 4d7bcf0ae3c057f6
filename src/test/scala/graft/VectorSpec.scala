package graft

import graft.functions.VectorOps
import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Specs for embedding-vector math, similarity search, and the multimodal
  * decode plumbing (north-star ops). */
class VectorSpec extends SparkSpec {
  import spark.implicits._

  test("dot / norm / cosine golden values") {
    val df = Seq((Seq(1.0f, 2.0f, 2.0f), Seq(2.0f, 0.0f, 0.0f))).toDF("a", "b")
    val Row(d: Double, n: Double, c: Double) = df.select(
      VectorOps.dot(col("a"), col("b")),
      VectorOps.norm(col("a")),
      VectorOps.cosine(col("a"), col("b"))).head()
    assert(d === 2.0)
    assert(n === 3.0)
    assert(c === 2.0 / (3.0 * 2.0))
  }

  test("native CosineSim is bit-identical to the HOF composition on fixtures") {
    val e = Tables.load(spark, sf0001, "embeddings").limit(200)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = e.crossJoin(q)
      .select(VectorOps.cosine(col("embedding"), col("qv")).as("fast"),
        VectorOps.cosineHof(col("embedding"), col("qv")).as("ref"))
      .collect()
    both.foreach(r => assert(
      java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1))))
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(3.0f, 4.0f), Seq(3.0f, 4.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    val out = df.select(VectorOps.cosine(col("a"), col("b"))).collect().map(_.getDouble(0))
    assert(math.abs(out(0) - 1.0) < 1e-12)
    assert(out(1) === 0.0)
  }

  test("bruteForceTopK returns nearest ids in similarity order") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      query = Seq(1.0, 0.0), k = 2).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getDouble(1) === 1.0)
  }

  test("randomHyperplaneSig is deterministic and groups near vectors") {
    val vecs = Seq(
      (1L, Seq.fill(8)(1.0f)), (2L, Seq.fill(8)(1.01f)),
      (3L, Seq.fill(8)(-1.0f))).toDF("vec_id", "embedding")
    val sigs = vecs.select(col("vec_id"),
      VectorOps.randomHyperplaneSig(col("embedding"), dim = 8, nPlanes = 8))
      .orderBy("vec_id").collect().map(_.getLong(1))
    assert(sigs(0) === sigs(1)) // parallel vectors share all sign bits
    assert(sigs(0) !== sigs(2)) // antipodal vectors flip every bit
  }

  test("native HyperplaneSig matches the HOF signature on fixtures") {
    val e = Tables.load(spark, sf0001, "embeddings").limit(100)
    val both = e.select(
      VectorOps.randomHyperplaneSig(col("embedding"), 64, 8).as("fast"),
      VectorOps.randomHyperplaneSigHof(col("embedding"), 64, 8).as("ref"))
      .collect()
    both.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("blockedNearDups only compares within a block") {
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f), "x"), (2L, Seq(1.0f, 0.01f), "x"),
      (3L, Seq(1.0f, 0.0f), "y")).toDF("vec_id", "embedding", "label")
    val out = Similarity.blockedNearDups(vecs, "vec_id", "embedding", "label", 0.9)
      .collect()
    // (1,3) identical but different blocks → absent; (1,2) present
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSet === Set((1L, 2L)))
  }

  test("ivfTopK: k results, descending sims, substantial brute-force recall") {
    val e = Tables.load(spark, sf0001, "embeddings")
    val qv = e.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val rest = e.filter(col("vec_id") =!= 0)
    val ivf = Similarity.ivfTopK(rest, "vec_id", "embedding", qv, k = 10)
      .collect()
    assert(ivf.length === 10)
    val sims = ivf.map(_.getDouble(2))
    assert(sims.sameElements(sims.sortBy(-_)))
    // probing 4/16 cells on near-uniform random vectors can miss single
    // neighbors across cell boundaries (inherent ANN recall loss); require
    // solid overlap with the exact answer rather than exact top-1.
    // Deterministic: fixed kmeans seed + seeded fixture.
    val bf10 = Similarity.bruteForceTopK(rest, "vec_id", "embedding", qv, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(ivf.map(_.getLong(0)).count(bf10) >= 3)
  }

  test("q88 centroid pooling: full dim per label, norm below unit vectors") {
    val rows = SparkEntry.queries("q88_embed_centroids")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // every label's centroid spans the full embedding dimension
    assert(rows.forall(_.getLong(1) === 64L))
    // averaging near-uniform random unit-scale vectors shrinks the norm
    // well below 1 but never to 0
    assert(rows.forall { r =>
      val n = r.getDouble(2); n > 0.0 && n < 1.0
    })
  }

  test("q89 int8 quantization: reconstruction error bounded by half an LSB") {
    val rows = SparkEntry.queries("q89_vec_quantize")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    // round-to-nearest symmetric quantization: per-vector max error is at
    // most 0.5 quantization steps, and positive for any non-lattice input
    assert(rows.forall { r =>
      val lsb = r.getDouble(2); lsb > 0.0 && lsb <= 0.5
    })
  }

  test("multimodal decode stub: per-row features from blob bytes") {
    val docs = Seq((7L, "ab", "en", "web")).toDF("doc_id", "text", "lang", "source")
    val out = Multimodal.decodeFeatures(spark, Multimodal.asMedia(docs)).collect()
    assert(out.length === 1)
    val f = out(0)
    assert(f.doc_id === 7L && f.n_bytes === 2L)
    assert(f.feat0 === (97 + 98) / 2.0) // byte-sum / n
    assert(f.feat1 === (97 - 98) / 2.0) // alternating sum / n
  }

  test("media embed stub: fixed-dim strided-byte vector, empty-safe") {
    val docs = Seq((7L, "abcdefgh", "en", "web"), (8L, "", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = Multimodal.embedStub(spark, Multimodal.asMedia(docs))
      .collect().sortBy(_.doc_id)
    assert(out.length === 2)
    // 8 bytes, dim 8: component j samples byte j exactly
    assert(out(0).mvec.toSeq ===
      "abcdefgh".getBytes.toSeq.map(b => (b & 0xff) / 255.0))
    assert(out(1).mvec.toSeq === Seq.fill(8)(0.0), "empty blob → zeros")
    // partition-independence: the vector is a pure function of bytes
    val out2 = Multimodal.embedStub(spark,
      Multimodal.asMedia(docs.repartition(5))).collect().sortBy(_.doc_id)
    assert(out2.map(_.mvec.toSeq).toSeq === out.map(_.mvec.toSeq).toSeq)
  }

  test("kmeans assignment is partition-independent and a true argmin") {
    import graft.operators.Clustering
    val emb = Tables.load(spark, sf0001, "embeddings")
    val q = emb.select(col("vec_id"), Clustering.quantize(col("embedding")).as("qv"))
    val a1 = Clustering.kmeansAssign(q, "vec_id", k = 4, iters = 2)
      .select("vec_id", "cid")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    val a2 = Clustering.kmeansAssign(q.repartition(7), "vec_id", k = 4, iters = 2)
      .select("vec_id", "cid")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a1 === a2, "assignment depends on partitioning")
    assert(a1.map(_._2).distinct.length > 1, "degenerate single cluster")

    // brute-force check of the FIRST round: round-1 assignment against
    // the seed centroids must be the exact integer argmin
    val qv = q.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val seeds = qv.take(4).map(_._2)
    val firstRound = Clustering.kmeansAssign(q, "vec_id", k = 4, iters = 1)
      .select("vec_id", "cid")
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    qv.zip(firstRound).foreach { case ((id, v), (id2, cid)) =>
      assert(id === id2)
      val dists = seeds.map(c => v.zip(c).map { case (x, y) =>
        (x - y) * (x - y) }.sum)
      val want = dists.zipWithIndex.min._2
      assert(cid === want, s"vec $id: got cluster $cid, argmin is $want")
    }
  }

  test("JlProject: sign-fold semantics and q154 shortlist recall") {
    import graft.functions.{JlProject, Sha60}
    val e = Tables.load(spark, sf0001, "embeddings")
    val got = e.select(col("vec_id"),
        col("embedding"), JlProject(col("embedding"), 16).as("p"))
      .orderBy("vec_id").limit(20).collect()
    got.foreach { r =>
      val v = r.getSeq[Float](1).toArray
      val p = r.getSeq[Double](2).toArray
      assert(p.length === 16)
      val masks = v.indices.map(j => Sha60.hash(s"rp:$j"))
      (0 until 16).foreach { k =>
        var acc = 0.0
        v.indices.foreach { j =>
          val x = v(j).toDouble
          acc += (if (((masks(j) >>> k) & 1L) == 1L) x else -x)
        }
        assert(p(k) === acc, s"vec ${r.getLong(0)} dim $k")
      }
    }
    // the projected-cosine shortlist must recover most of the exact
    // top-10 (JL preserves angles; fixture is deterministic so this is
    // a fixed number, not a flaky bound)
    val exact = SparkEntry.queries("q30_cosine_topk")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    val viaJl = SparkEntry.queries("q154_jl_ann")(spark, sf0001)
      .collect().map(_.getLong(0)).toSet
    assert((exact & viaJl).size >= 6,
      s"JL shortlist recalled only ${(exact & viaJl).size}/10 exact neighbors")
  }

  test("rrfFusion: hand-checkable reciprocal-rank arithmetic") {
    import graft.operators.Similarity
    // list A ranks: 1→doc1, 2→doc2, 3→doc3; list B: 1→doc2, 2→doc4
    val a = Seq((1L, 9.0), (2L, 5.0), (3L, 1.0)).toDF("id", "score")
    val b = Seq((2L, 7.0), (4L, 3.0)).toDF("id", "score")
    val got = Similarity.rrfFusion(Seq(a, b), "id", "score", k = 60,
      topN = 10).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expect = Seq(
      2L -> (1.0 / 62 + 1.0 / 61), // rank 2 in A, rank 1 in B — wins
      1L -> 1.0 / 61,
      4L -> 1.0 / 62,
      3L -> 1.0 / 63)
    assert(got.toSeq == expect)
    // equal scores tie-break on id: doc5 before doc6
    val t = Seq((6L, 2.0), (5L, 2.0)).toDF("id", "score")
    val ranks = Similarity.rrfFusion(Seq(t), "id", "score", k = 60,
      topN = 2).collect().map(_.getLong(0)).toSeq
    assert(ranks == Seq(5L, 6L))
  }
}
