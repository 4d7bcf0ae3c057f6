package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.DataFrame
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
}
