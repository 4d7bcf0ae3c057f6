package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.{Column, DataFrame}

/** Integer-exact Lloyd k-means over embedding vectors — the clustering
  * stage of SemDeDup-style semantic curation (Abbas et al., 2023: cluster
  * the corpus, then search for near-duplicates only WITHIN clusters, so
  * the O(N²) similarity problem becomes Σ cluster² ≪ N²).
  *
  * Every arithmetic step is chosen to replay bit-identically in an
  * ANSI-SQL oracle, the same discipline as PageRank's scaled-bigint
  * ranks (Graph.pageRankFixedPoint):
  *   - vectors quantize to integers once: `floor(v * 1024)` — float32 ×
  *     2^10 is EXACT in double, so the floor is unambiguous cross-engine;
  *   - assignment distance is a bigint Σ(x−c)² (≤ 2.7e8 at 64 dims —
  *     no overflow, no floating point);
  *   - ties break to the smallest centroid id (total order);
  *   - the centroid update `floor(Σx / n)` runs in double — exact here
  *     because a true quotient with denominator n < 2^26 sits ≥ 2^-26
  *     from the nearest other integer, while the division's rounding
  *     error is ~1e-10: the floor can never land on the wrong integer.
  *     (Bigint `div` would hit the truncate-vs-floor mismatch between
  *     engines on negative sums.)
  *
  * Scale shape: centroids are a k×dim plan parameter (collected to the
  * driver each round — k·dim values, size-independent of the corpus, the
  * q92-vocabulary pattern), so ASSIGNMENT is pure row-local expression
  * work inside the scan's codegen: zero joins, zero shuffles. Each
  * iteration pays ONE exchange — the (cid, dim) centroid-update
  * aggregate, whose result is ≤ k·dim rows. Seeds are the k smallest
  * ids' vectors (deterministic; k-means++ would add data-dependent
  * randomness the oracle could not replay).
  */
object Clustering {

  /** element-wise integer quantization: floor(v * 1024) as bigint */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1024).cast(LongType))

  private def sqDistTo(centroid: Array[Long]): Column = {
    val c = array(centroid.map(lit(_)): _*)
    aggregate(zip_with(col("qv"), c, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, d) => acc + d)
  }

  /** argmin over centroids via least() on (dist, cid) structs —
    * lexicographic struct order IS min-distance with smallest-id ties */
  private def assignTo(centroids: Seq[(Int, Array[Long])]): Column = {
    val cands = centroids.map { case (cid, vec) =>
      struct(sqDistTo(vec).as("dist"), lit(cid).as("cid"))
    }
    least(cands: _*).getField("cid")
  }

  /** Runs `iters` assignment rounds with a centroid update between each
    * pair; returns the input columns plus `cid` — the final assignment of
    * every vector. The assignment is a pure expression column (centroids
    * are literals), NOT a join: callers that need cid next to other
    * vector columns (q149's cluster-blocked pair search) pass them in
    * here instead of joining assignments back on the id, which would pay
    * a full-table shuffle join for a column the scan can compute.
    * `quantized` must carry `idCol` and a bigint-array column `qv`. */
  def kmeansAssign(quantized: DataFrame, idCol: String,
                   k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one assignment round, got $iters")
    // seeds: the k smallest ids' vectors, a deterministic plan parameter
    var centroids: Seq[(Int, Array[Long])] =
      quantized.orderBy(col(idCol)).limit(k)
        .select(col("qv")).collect().toSeq.zipWithIndex
        .map { case (r, i) => (i, r.getSeq[Long](0).toArray) }
    var assigned = quantized.withColumn("cid", assignTo(centroids))
    for (_ <- 1 until iters) {
      // ONE exchange: per-(cid, dim) bigint sums + counts, ≤ k·dim rows
      val upd = assigned
        .select(col("cid"), posexplode(col("qv")).as(Seq("d", "x")))
        .groupBy("cid", "d")
        .agg(sum(col("x")).as("s"), count(lit(1)).as("n"))
        .withColumn("c", floor(col("s").cast("double") / col("n")).cast(LongType))
        .groupBy("cid")
        .agg(map_from_arrays(collect_list(col("d")), collect_list(col("c"))).as("cm"))
        .collect()
      centroids = upd.map { r =>
        val cm = r.getMap[Int, Long](1)
        (r.getInt(0), Array.tabulate(cm.size)(d => cm(d)))
      }.toSeq.sortBy(_._1)
      assigned = quantized.withColumn("cid", assignTo(centroids))
    }
    assigned
  }
}
