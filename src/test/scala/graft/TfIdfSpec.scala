package graft

import graft.operators.TfIdf
import org.apache.spark.sql.functions._

/** TF-IDF pair similarity: golden values computable by hand and the
  * blocking/cap invariants. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("identical docs score exactly 1.0") {
    // 11 docs: two identical rare docs + 9 distinct fillers — the df
    // cap needs df·5 < n_docs, i.e. 10 < 11, to keep the twins' df=2
    // shingles (at exactly 10 docs the cap would drop them).
    val fillers = (0 until 9).map(i =>
      (10L + i, s"f$i a$i b$i c$i d$i e$i"))
    val docs = (Seq((1L, "x y z w v"), (2L, "x y z w v")) ++ fillers)
      .toDF("doc_id", "text")
    val got = TfIdf.pairSims(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    // identical shingle multisets → cosine exactly 1.0 (identical exact
    // integer vectors, sim = dot/(√n²·√n²) with dot = n²)
    assert(got((1L, 2L)) === 1.0)
    // fillers share no shingle with anything → no other pair at all
    assert(got.size === 1)
  }

  test("df cap drops corpus-wide boilerplate from pairing") {
    // every doc shares the same 3-token opening; df = n_docs fails
    // df*5 < n_docs, so NO pairs form from the boilerplate alone
    val docs = (0 until 10).map(i =>
      (i.toLong, s"common open phrase u$i v$i")).toDF("doc_id", "text")
    assert(TfIdf.pairSims(docs).count() === 0)
  }

  test("partial overlap scores strictly between 0 and 1") {
    val fillers = (0 until 18).map(i => (20L + i, s"f$i a$i b$i"))
    val docs = (Seq(
      (1L, "p q r s t"), // shares shingle "q r s" with doc 2
      (2L, "a q r s b")) ++ fillers).toDF("doc_id", "text")
    val rows = TfIdf.pairSims(docs).collect()
    assert(rows.length === 1)
    val sim = rows.head.getDouble(2)
    assert(sim > 0.0 && sim < 1.0, s"sim $sim")
  }
}
