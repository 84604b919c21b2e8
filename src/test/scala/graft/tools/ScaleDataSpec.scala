package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The scale-probe generator's one hard contract: replicas must be
  * DECORRELATED. A single pair of colliding replica transforms turns
  * every original row into a cross-replica exact-duplicate clique,
  * which inflates candidate-pair output quadratically in the replica
  * count and silently invalidates every LSH/ANN scale probe run on the
  * generated corpus. Factor 100 is the sf10 deploy-tier slice, where
  * both the Caesar-rotation space (26) and the vector-rotation space
  * (32) are exhausted and the seeded-permutation / sign-mask paths
  * take over. */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "en", "web", 43L),
    (2L, "pack my box with five dozen liquor jugs", "en", "web", 39L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private def embs = {
    val rnd = new scala.util.Random(7)
    Seq.tabulate(3)(i => (i.toLong, Array.fill(64)(rnd.nextFloat() - 0.5f), 0))
      .toDF("vec_id", "embedding", "label")
  }

  test("scaleDocuments at factor 100: no cross-replica text duplicates") {
    val out = ScaleData.scaleDocuments(docs, 100).cache()
    assert(out.count() === 200)
    // every replica rewrites every letter-bearing text uniquely
    assert(out.select("text").distinct().count() === 200)
    // structure preserved: char count of each replica matches original
    val badLen = out.filter(length(col("text")) =!= col("n_chars")).count()
    assert(badLen === 0)
    out.unpersist()
  }

  test("scaleDocuments replica 0 is the verbatim original") {
    val out = ScaleData.scaleDocuments(docs, 30)
      .filter(col("doc_id") < ScaleData.IdStride)
    assert(out.orderBy("doc_id").collect().map(_.getString(1)).toSeq ===
      docs.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
  }

  test("scaleEmbeddings at factor 100: no duplicate vectors, norms kept") {
    val out = ScaleData.scaleEmbeddings(embs, 100).cache()
    assert(out.count() === 300)
    assert(out.select("embedding").distinct().count() === 300)
    // rotation and ±1 masking both preserve the L2 norm exactly up to
    // float association order — compare against each source norm
    val srcNorms = embs.collect().map { r =>
      r.getLong(0) -> math.sqrt(
        r.getSeq[Float](1).map(x => x.toDouble * x).sum)
    }.toMap
    val normErr = out.select(col("vec_id"),
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => acc + x.cast("double") * x.cast("double")).as("sq"))
      .collect().map { r =>
        val src = srcNorms(r.getLong(0) % ScaleData.IdStride)
        math.abs(math.sqrt(r.getDouble(1)) - src)
      }.max
    assert(normErr < 1e-4, s"norm drifted by $normErr")
    out.unpersist()
  }

  test("scaleEmbeddings factor 10 stays bit-compatible with sf1 artifacts") {
    // replicas < 32 must remain pure rotations (no mask): replica 1 of
    // a vector is its 6-position left rotation, element for element
    val src = embs.filter(col("vec_id") === 0L)
      .head().getSeq[Float](1).toArray
    val rep1 = ScaleData.scaleEmbeddings(embs, 10)
      .filter(col("vec_id") === ScaleData.IdStride)
      .head().getSeq[Float](1).toArray
    val expected = src.drop(6) ++ src.take(6)
    assert(rep1.toSeq === expected.toSeq)
  }
}
