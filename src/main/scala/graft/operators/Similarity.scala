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

  /** E2 — LSH-bucketed ANN: 8 hyperplane tables × 6 bits; candidates share
    * any table bucket; exact cosine re-ranks candidates. Rows-only oracle;
    * SimilaritySpec measures recall vs E1. ONE shuffle on bucket id. */
  def annLshTopK(t: Tables, k: Int = 5): DataFrame = {
    val vecs = withNorm(t.embeddings)
      .withColumn("buckets", Sketches.lshBuckets()(col("v")))
    val qb = vecs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), explode(col("buckets")).as("bucket"))
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
