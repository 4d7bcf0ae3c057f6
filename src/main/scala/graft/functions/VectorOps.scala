package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-vector column math for similarity search (north star).
  *
  * All built on Spark's higher-order array functions (`zip_with` /
  * `aggregate` / `transform`) — expression-tree evaluation, no UDF
  * serialization, stays inside whole-stage codegen. Elements are cast
  * float→double *before* any arithmetic so results are IEEE-deterministic
  * and identical to the DuckDB oracle's double-precision list functions.
  *
  * Scale notes: brute-force top-k against N stored vectors is a single
  * scan + partial top-k per partition (TakeOrderedAndProject) — at 100 TB
  * the scan dominates and parallelizes linearly. The LSH path
  * (randomHyperplaneSig) buckets vectors so candidate generation becomes
  * an equi-join on the signature — a shuffle on a small key instead of a
  * cross product.
  */
object VectorOps {

  private def asDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Sequential-fold dot product — summation order is the array order in
    * both Spark and the oracle, so the result is bit-reproducible. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity — native codegen'd expression ([[CosineSim]]):
    * one fused loop, stays inside whole-stage codegen. Bit-identical to
    * [[cosineHof]] (same summation order). */
  def cosine(a: Column, b: Column): Column = CosineSim(a, b)

  /** The higher-order-function composition of the same quantity; kept as
    * the pure-built-in reference implementation (and the cross-check in
    * tests). */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane (SimHash-for-vectors) LSH signature: `nPlanes` sign
    * bits packed into a long. Hyperplane components are a deterministic
    * pseudo-random lattice (no RNG at execution time → reproducible plans,
    * no per-task seed skew). Vectors with small angle collide with high
    * probability; use the bucket as a join key for ANN candidate pairs. */
  def randomHyperplaneSig(v: Column, dim: Int, nPlanes: Int = 16): Column =
    HyperplaneSig(v, dim, nPlanes)

  /** Expression-tree form of the same signature (nPlanes × dim flat
    * terms); kept as the pure-built-in reference for tests — its codegen
    * compile time makes it the wrong choice in hot paths. */
  def randomHyperplaneSigHof(v: Column, dim: Int, nPlanes: Int = 16): Column = {
    def planeComponent(p: Int, i: Int): Double =
      (((p * 1009 + i * 9176 + 917) * 2654435761L) % 2001 - 1000) / 1000.0
    val bits = (0 until nPlanes).map { p =>
      val proj = (0 until dim).map { i =>
        element_at(v, i + 1).cast(DoubleType) * lit(planeComponent(p, i))
      }.reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
