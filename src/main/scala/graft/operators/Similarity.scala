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

  /** ANN via IVF (inverted-file) coarse quantization: k-means centroids
    * partition the vector space; each vector is assigned to its nearest
    * centroid ("cell"); a query probes only the `nProbes` cells whose
    * centroids are nearest, then brute-forces inside them.
    *
    * Scale notes: training samples the corpus (centroid count ≪ rows);
    * assignment is a narrow map (broadcast centroid matrix); the search
    * scan prunes to nProbes/nCells of the data — with a table bucketed or
    * partitioned by `cell`, the probe becomes partition pruning and never
    * touches the rest. Deterministic: fixed seed, deterministic init. */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              query: Seq[Double], k: Int, nCells: Int = 16,
              nProbes: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    // L2-normalize before clustering: on unit vectors euclidean distance
    // is monotone in cosine, so euclidean k-means cells respect the
    // cosine geometry the search runs in.
    val unit = {
      val v = col(vecCol).cast("array<double>")
      transform(v, x => x / VectorOps.norm(col(vecCol)))
    }
    val withFeat = embeddings.withColumn("__fv", array_to_vector(unit))
    // coarse quantizer: a few Lloyd iterations suffice (cells only gate
    // the probe set; in production the codebook is trained offline once,
    // on a sample). Cache the training projection — Lloyd iterates it,
    // and recomputing scan+normalize per iteration dominates otherwise.
    val train = withFeat.select("__fv").cache()
    val model = try new KMeans().setK(nCells).setSeed(42L).setMaxIter(5)
      .setFeaturesCol("__fv").setPredictionCol("__cell")
      .fit(train)
    finally train.unpersist()
    // driver-side: the nProbes centroids nearest the query (tiny matrix)
    val qNorm = math.sqrt(query.map(x => x * x).sum)
    val qArr = query.map(_ / qNorm).toArray
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(qArr).map { case (x, y) => (x - y) * (x - y) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nProbes).map(_._1)
    val q = array(query.map(lit): _*)
    model.transform(withFeat)
      .filter(col("__cell").isin(probes.toSeq: _*))
      .withColumn("sim", VectorOps.cosine(col(vecCol), q))
      .select(col(idCol), col("__cell").as("cell"), col("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
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
