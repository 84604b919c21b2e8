package graft.operators

import graft.SparkSpec

class IvfSpec extends SparkSpec {

  test("ivf assigns every vector to exactly one of k centroids") {
    val rows = Similarity.ivfAssign(t, k = 8, iters = 2).collect()
    assert(rows.length == t.embeddings.count())
    val cids = rows.map(_.getLong(1)).toSet
    assert(cids.subsetOf((0L until 8L).toSet))
    assert(cids.size > 1, "degenerate clustering: everything in one cell")
    assert(rows.forall(_.getDouble(2) >= 0.0))
  }

  test("empty cluster keeps its previous centroid instead of zeroing") {
    import spark.implicits._
    // vec 0 and vec 1 are identical, so init centroids coincide and
    // cluster 1 goes empty on the first assignment. With the round-1
    // zeroing bug, centroid 1 became the origin and captured the
    // small-norm vec 2 (dist2 ~0.02); keeping the previous centroid
    // leaves vec 2 with the real cluster-0 mean.
    val vecs = Seq(
      (0L, Array(1.0f, 1.0f)),
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.1f, 0.1f))).toDF("vec_id", "embedding")
    val rows = Similarity.ivfAssignVecs(vecs, k = 2, iters = 1).collect()
    val vec2 = rows.find(_.getLong(0) == 2L).get
    assert(vec2.getLong(1) == 0L, "vec 2 captured by a phantom cell")
    assert(vec2.getDouble(2) > 0.5, "vec 2 distance says centroid was zeroed")
  }

  test("lloyd stops at the fixpoint, not the iteration budget") {
    // once assignments stop changing the recomputed means are identical
    // and the centroid shift is exactly zero — the loop must exit there
    val (model, rounds) = Similarity.ivfModel(t.embeddings, k = 8, maxIters = 50)
    info(s"converged after $rounds rounds")
    assert(rounds < 50)
    assert(model.length == 8)
  }

  test("iterations do not increase total distortion") {
    val d1 = Similarity.ivfAssign(t, k = 8, iters = 1).collect().map(_.getDouble(2)).sum
    val d3 = Similarity.ivfAssign(t, k = 8, iters = 3).collect().map(_.getDouble(2)).sum
    info(s"distortion iters=1: $d1, iters=3: $d3")
    assert(d3 <= d1 * 1.001)
  }
}
