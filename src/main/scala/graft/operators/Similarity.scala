package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Sketches
import graft.plans.VectorFunctions
import graft.sources.Tables

/** Similarity search over the embedding column (SURVEY §2E).
  *
  * Scale notes: brute-force top-k is the correctness baseline (query set ⋈
  * full corpus — the broadcast-queries pattern: the small query set
  * broadcasts, the corpus streams, nothing shuffles). The LSH variant
  * buckets the corpus with ONE shuffle on the bucket id, confining
  * candidate generation to bucket-local pairs — the scale path. Vector
  * kernels are tight JVM UDFs (see Sketches) with oracle-identical
  * left-fold accumulation.
  */
object Similarity {

  /** Embeddings with float→double cast and precomputed squared norm. */
  def withNorm(embeddings: DataFrame): DataFrame = {
    VectorFunctions.register(embeddings.sparkSession)
    embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("norm", call_function("graft_norm2", col("v")))
  }

  /** E1 — brute-force cosine top-k: queries are vec_id < 10, k=5. */
  def annBruteTopK(t: Tables, k: Int = 5): DataFrame = {
    val vecs = withNorm(t.embeddings)
    val q = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("v").as("v_q"), col("norm").as("norm_q"))
    val c = vecs.select(col("vec_id").as("n_id"), col("v").as("v_n"), col("norm").as("norm_n"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(c, col("q_id") =!= col("n_id"))
      .withColumn("cos",
        call_function("graft_dot", col("v_q"), col("v_n")) / (sqrt(col("norm_q")) * sqrt(col("norm_n"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("cos"), 4).as("cos4"))
      .orderBy("q_id", "rnk")
  }

  /** E3 — IVF coarse quantizer: Lloyd's k-means over the corpus (each
    * iteration = one broadcast of k·dim doubles out, one groupBy shuffle
    * back — the standard distributed k-means shape; only the k×64 model
    * ever touches the driver, never data). Returns (vec_id, cid, dist2). */
  def ivfAssign(t: Tables, k: Int = 8, iters: Int = 3): DataFrame =
    ivfAssignVecs(t.embeddings, k, iters)

  def ivfAssignVecs(embeddings: DataFrame, k: Int = 8, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.UserDefinedFunction
    import org.apache.spark.storage.StorageLevel
    // persist across Lloyd iterations: each iteration materializes the
    // working set once; without this the parquet scan + norm cast reruns
    // per iteration (round-1 debt). MEMORY_AND_DISK so a 100 TB corpus
    // spills instead of OOMing; released after the model converges.
    val vecs = withNorm(embeddings).select("vec_id", "v")
      .persist(StorageLevel.MEMORY_AND_DISK)
    // deterministic init: the k lowest vec_ids
    var centroids: Array[Array[Double]] = vecs.filter(col("vec_id") < k)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    def assignUdf(cs: Array[Array[Double]]): UserDefinedFunction =
      udf { (v: Seq[Double]) =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          val ctr = cs(c)
          while (i < ctr.length) { val x = v(i) - ctr(i); d += x * x; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        (best, bestD)
      }
    var it = 0
    while (it < iters) {
      val assigned = vecs.withColumn("a", assignUdf(centroids)(col("v")))
        .select(col("vec_id"), col("a._1").as("cid"), col("v"))
      // recompute means element-wise: explode dims, one shuffle on (cid, dim)
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy("cid", "dim").agg(avg("x").as("m"))
        .collect()
      // a cluster that attracted no points KEEPS its previous centroid —
      // round 1 silently zeroed it, creating a phantom cell at the origin
      // that could capture small-norm vectors on the next assignment
      val next = centroids.map(_.clone)
      means.foreach(r => next(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
      centroids = next
      it += 1
    }
    val out = vecs.withColumn("a", assignUdf(centroids)(col("v")))
      .select(col("vec_id"), col("a._1").cast("long").as("cid"),
        round(col("a._2"), 4).as("dist2"))
      .orderBy("vec_id")
    vecs.unpersist(blocking = false) // model is frozen; the returned plan re-derives
    out
  }

  /** E2 — LSH-bucketed ANN: 8 hyperplane tables × 6 bits; candidates share
    * any table bucket; exact cosine re-ranks candidates. The query side
    * MULTIPROBES: base bucket plus every 1-bit flip per table (round-1
    * recall@5 was 0.2 with exact-bucket probing; multiprobe lifts it
    * without adding corpus-side volume). Rows-only oracle; SimilaritySpec
    * asserts recall@5 >= 0.6 vs E1. ONE shuffle on bucket id. */
  def annLshTopK(t: Tables, k: Int = 5): DataFrame = {
    val vecs = withNorm(t.embeddings)
      .withColumn("buckets", Sketches.lshBuckets()(col("v")))
    val qb = withNorm(t.embeddings).filter(col("vec_id") < 10)
      .withColumn("probes", Sketches.lshProbeBuckets()(col("v")))
      .select(col("vec_id").as("q_id"), explode(col("probes")).as("bucket"))
    val cb = vecs.select(col("vec_id").as("n_id"), explode(col("buckets")).as("bucket"))
    val cand = qb.join(cb, "bucket")
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
      .distinct()
    val q = vecs.select(col("vec_id").as("q_id"), col("v").as("v_q"), col("norm").as("norm_q"))
    val c = vecs.select(col("vec_id").as("n_id"), col("v").as("v_n"), col("norm").as("norm_n"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    cand
      .join(broadcast(q), "q_id")
      .join(c, "n_id")
      .withColumn("cos",
        call_function("graft_dot", col("v_q"), col("v_n")) / (sqrt(col("norm_q")) * sqrt(col("norm_n"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("cos"), 4).as("cos4"))
      .orderBy("q_id", "rnk")
  }
}
