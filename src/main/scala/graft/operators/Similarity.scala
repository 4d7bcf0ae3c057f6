package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (north-star operator; no reference implementation).
  *
  * Baseline: brute-force cosine top-k — one scan, per-partition top-k
  * (Spark plans orderBy+limit as TakeOrderedAndProject: each task keeps a
  * k-element heap, the driver merges — no global sort, no shuffle of the
  * full table). This is the correct plan at 100 TB when k is small.
  *
  * Scale path: LSH bucketing (random hyperplanes) turns candidate
  * generation into an equi-join on a 16-bit signature; only bucket-mates
  * get exact cosine. IVF-style coarse quantization would follow the same
  * shape with learned centroids as bucket keys.
  */
object Similarity {

  /** Brute-force cosine top-k against one literal query vector. */
  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) — the standard
    * hybrid-search combiner: each retriever contributes
    * 1/(k + rank_i) per candidate, summed over the lists it appears
    * in; k=60 is the published default. Inputs are (id, score)
    * SHORTLISTS — each retriever's top-M, produced upstream as
    * orderBy+limit (TakeOrderedAndProject: map-side heaps, no global
    * sort) — so the no-partition ranking window here runs over ≤ Σ M
    * rows, a bounded plan parameter, never the corpus. That is the
    * production hybrid-retrieval shape: the corpus-sized work lives in
    * the per-retriever scans; fusion touches shortlists only. Ranks
    * tie-break on id, so the fused list is deterministic on any
    * engine. */
  def rrfFusion(lists: Seq[DataFrame], idCol: String, scoreCol: String,
                k: Int = 60, topN: Int = 10): DataFrame = {
    require(lists.nonEmpty, "rrfFusion needs at least one ranked list")
    import org.apache.spark.sql.expressions.Window
    val ranked = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol),
        row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol)))
          .as(s"__rrf_r$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val rrf = ranked.indices
      .map(i => when(col(s"__rrf_r$i").isNotNull,
        lit(1.0) / (lit(k.toDouble) + col(s"__rrf_r$i")))
        .otherwise(lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol), rrf.as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topN)
  }

  def bruteForceTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    embeddings
      .withColumn("sim", VectorOps.cosine(col(vecCol), q))
      .select(col(idCol), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs near-duplicates in embedding space, blocked by a grouping
    * key (e.g. a cluster label or LSH bucket): exact cosine only within a
    * block, so the cross product never materializes globally. */
  def blockedNearDups(embeddings: DataFrame, idCol: String, vecCol: String,
                      blockCol: String, threshold: Double): DataFrame = {
    val a = embeddings.select(col(blockCol).as("block"), col(idCol).as("id_a"),
      col(vecCol).as("v_a"))
    val b = embeddings.select(col(blockCol).as("block"), col(idCol).as("id_b"),
      col(vecCol).as("v_b"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", VectorOps.cosine(col("v_a"), col("v_b")))
      .filter(col("sim") >= threshold)
      .select(col("block"), col("id_a"), col("id_b"), col("sim"))
  }

  /** ANN via IVF (inverted-file) coarse quantization: k-means centroids
    * partition the vector space; each vector is assigned to its nearest
    * centroid ("cell"); a query probes only the `nProbes` cells whose
    * centroids are nearest, then brute-forces inside them.
    *
    * The codebook is trained driver-side with Lloyd iterations over a
    * bounded sample — the production shape (FAISS-style IVF trains the
    * coarse quantizer offline on a corpus sample; centroid count ≪ rows,
    * so distributing the *training* buys nothing and costs a scheduled
    * job per iteration). The cluster-scale parts stay distributed:
    * assignment is a narrow map against the broadcast-as-literal centroid
    * matrix (native [[graft.functions.CosineSim]] per centroid — on unit
    * vectors argmax cosine = argmin euclidean), and the probe filter
    * prunes the search scan to nProbes/nCells of the data; with the table
    * written partitioned/bucketed by `cell` it becomes partition pruning
    * and never touches the rest. Deterministic: sample = first
    * `trainCap` rows in storage order, farthest-point init. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, nCells: Int = 16,
              nProbes: Int = 4, trainCap: Int = 4096): DataFrame = {
    val sample = embeddings.select(col(vecCol).cast("array<double>"))
      .limit(trainCap).collect()
      .map(_.getSeq[Double](0).toArray)
      .map(unitNorm)
    val cents = lloyd(sample, nCells, iters = 5)
    // driver-side: the nProbes centroids nearest the query
    val qUnit = unitNorm(query.toArray)
    val probes = cents.zipWithIndex
      .map { case (c, i) => (i, c.zip(qUnit).map { case (x, y) => x * y }.sum) }
      .sortBy(-_._2).take(nProbes).map(_._1)
    val q = array(query.map(lit): _*)
    embeddings
      // cell = argmax dot against the broadcast codebook (centroids are
      // unit vectors, so argmax dot ≡ argmax cosine); one native fused
      // loop per row — see NearestCentroid for why not an expression array
      .withColumn("__cell",
        graft.functions.NearestCentroid(col(vecCol), cents).cast("long"))
      .filter(col("__cell").isin(probes.map(_.toLong): _*))
      .withColumn("sim", VectorOps.cosine(col(vecCol), q))
      .select(col(idCol), col("__cell").as("cell"), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic integer-rational centroid lattice for the verifiable
    * IVF variant: component (p,i) is an exact small-integer/1000 division,
    * so embedding the integers as `<int>/1000.0` in an oracle's SQL
    * reproduces the identical IEEE doubles (same trick as
    * [[graft.functions.VectorOps.randomHyperplaneSig]]'s plane lattice). */
  def ivfLatticeInt(p: Int, i: Int): Long =
    ((p * 2017L + i * 7351L + 523L) * 2654435761L) % 2001L - 1000L

  def ivfLattice(nCells: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nCells, dim)((p, i) => ivfLatticeInt(p, i) / 1000.0)

  /** [[ivfTopK]] with the k-means codebook swapped for the deterministic
    * [[ivfLattice]], so cell assignment, probe selection, and the final
    * top-k all hash-match an ANSI-SQL oracle (the trained codebook is
    * engine-private state; a fixed lattice is not). The plan is the
    * production plan — narrow argmax-dot assignment against a plan-time
    * constant matrix ([[graft.functions.NearestCentroid]]), probe filter,
    * local top-k — only the codebook quality differs, which is the
    * documented trade: q43 stays the production form. */
  def ivfTopKVerifiable(embeddings: DataFrame, idCol: String, vecCol: String,
                        query: Seq[Double], k: Int, nCells: Int = 8,
                        dim: Int = 64, nProbes: Int = 2): DataFrame = {
    val cents = ivfLattice(nCells, dim)
    // probe ranking mirrors NearestCentroid's left-to-right dot loop; ties
    // break to the lower cell id (matches the oracle's ORDER BY d DESC, cid)
    val probes = cents.zipWithIndex.map { case (c, p) =>
      var dot = 0.0; var i = 0
      val n = math.min(query.length, c.length)
      while (i < n) { dot += query(i) * c(i); i += 1 }
      (p, dot)
    }.sortBy { case (p, d) => (-d, p) }.take(nProbes).map(_._1)
    val q = array(query.map(lit): _*)
    embeddings
      .withColumn("cell",
        graft.functions.NearestCentroid(col(vecCol), cents).cast("long"))
      .filter(col("cell").isin(probes.map(_.toLong): _*))
      .withColumn("sim", VectorOps.cosine(col(vecCol), q))
      .select(col(idCol), col("cell"), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  private def unitNorm(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Deterministic Lloyd: farthest-point init (first point, then greedily
    * the point farthest from its nearest chosen centroid), `iters` rounds
    * of assign + mean, re-normalized to the unit sphere each round
    * (spherical k-means — cells respect cosine geometry). */
  private def lloyd(xs: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(xs.nonEmpty, "empty training sample")
    val d = xs.head.length
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val kk = math.min(k, xs.length)
    val cents = scala.collection.mutable.ArrayBuffer(xs.head)
    while (cents.length < kk) {
      val next = xs.maxBy(x => cents.map(c => dist2(x, c)).min)
      cents += next
    }
    var cur = cents.toArray
    for (_ <- 0 until iters) {
      val sums = Array.fill(kk)(new Array[Double](d))
      val counts = new Array[Int](kk)
      xs.foreach { x =>
        var best = 0; var bestD = Double.MaxValue; var j = 0
        while (j < kk) {
          val dd = dist2(x, cur(j)); if (dd < bestD) { bestD = dd; best = j }; j += 1
        }
        var i = 0; while (i < d) { sums(best)(i) += x(i); i += 1 }
        counts(best) += 1
      }
      cur = cur.indices.map { j =>
        if (counts(j) == 0) cur(j)
        else unitNorm(sums(j).map(_ / counts(j)))
      }.toArray
    }
    cur
  }

  /** ANN via random-hyperplane LSH: bucket all vectors by signature, then
    * brute-force only inside the query's bucket. Trades recall for a
    * candidate set ~N/2^nPlanes. */
  def lshTopK(embeddings: DataFrame, idCol: String, vecCol: String, dim: Int,
              query: Seq[Double], k: Int, nPlanes: Int = 8): DataFrame = {
    val sig = VectorOps.randomHyperplaneSig(col(vecCol), dim, nPlanes)
    val q = array(query.map(lit): _*)
    val querySig = VectorOps.randomHyperplaneSig(q, dim, nPlanes)
    embeddings
      .withColumn("bucket", sig)
      .filter(col("bucket") === querySig)
      .withColumn("sim", VectorOps.cosine(col(vecCol), q))
      .select(col(idCol), col("bucket"), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic PQ codebook lattice: component (s, c, i) is an exact
    * small-integer/1000 division — same rational-literal trick as
    * [[ivfLatticeInt]], so a SQL oracle reproduces identical IEEE
    * doubles from the integers. */
  def pqLatticeInt(s: Int, c: Int, i: Int): Long =
    ((s * 3049L + c * 2017L + i * 7351L + 523L) * 2654435761L) % 2001L - 1000L

  def pqLattice(nSub: Int, nCents: Int, subDim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(nSub, nCents, subDim)((s, c, i) => pqLatticeInt(s, c, i) / 1000.0)

  /** ANN via product quantization with asymmetric distance computation
    * (IVFADC scan stage; Jégou et al., TPAMI 2011): vectors are stored as
    * `nSub` centroid indices ([[graft.functions.PqEncode]], here 8 bytes
    * in place of 256 — the representation a 100 TB index actually scans),
    * and each query's distance to a coded vector is the sum over
    * subspaces of ‖q_s − C[code_s]‖², looked up from per-query tables of
    * nSub × nCents precomputed doubles.
    *
    * Scale shape: encoding is a narrow scan-pipelined map (no shuffle);
    * the ADC scan reads ONLY the code column — 32× less I/O than raw
    * float vectors before any pruning — with the query tables as
    * plan-time literals (`element_at` on a literal array, whole-stage
    * codegen'd); top-k is a per-query row_number bounded by k. Distances
    * use the oracle-replayable float shape
    * `(⟨q_s,q_s⟩ − 2·⟨q_s,C⟩) + ‖C‖²` summed left-to-right over
    * subspaces, so results hash-match ANSI SQL replaying the same
    * lookups. Queries are bounded plan parameters (collected like q81's
    * broadcast query set). */
  def pqAdcTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                queries: Seq[(Long, Array[Double])], k: Int,
                nSub: Int = 8, nCents: Int = 16, subDim: Int = 8): DataFrame = {
    val books = pqLattice(nSub, nCents, subDim)
    val kTerm = books.map(_.map(c => c.map(x => x * x).sum))
    val codes = embeddings.select(col(idCol),
      graft.functions.PqEncode(col(vecCol), books).as("codes"))
    def adcFor(q: Array[Double]): Column = {
      val terms = (0 until nSub).map { s =>
        val off = s * subDim
        var qq = 0.0
        var i = 0
        while (i < subDim) { qq += q(off + i) * q(off + i); i += 1 }
        val dq = books(s).map { cent =>
          var d = 0.0; var j = 0
          while (j < subDim) { d += q(off + j) * cent(j); j += 1 }
          d
        }
        val code = element_at(col("codes"), s + 1)
        (lit(qq) - lit(2.0) * element_at(typedLit(dq.toSeq), code + 1)) +
          element_at(typedLit(kTerm(s).toSeq), code + 1)
      }
      terms.reduceLeft(_ + _)
    }
    val perQuery = queries.map { case (qid, q) =>
      struct(lit(qid).as("q_id"), adcFor(q).as("adc"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("adc").asc, col(idCol))
    codes
      .select(col(idCol), explode(array(perQuery: _*)).as("qa"))
      .select(col("qa.q_id").as("q_id"), col(idCol), col("qa.adc").as("adc"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }
}
