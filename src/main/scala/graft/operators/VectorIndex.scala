package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** PERSISTED vector index — the deployment shape of IVF+PQ at 100 TB:
  * fit ONCE, write the artifact to tables, search MANY times against it.
  * The inline operators (Similarity.ivfPqTopK and friends) refit their
  * models per materialization — correct and self-contained for a bench,
  * but a real corpus amortizes its index over millions of queries (the
  * reference's consumer, parser.py:272-310, runs continuously; its
  * analytics must not refit per query batch).
  *
  * Artifact layout under `dir` (all parquet):
  *   - `centroids`: (cell int, centroid array<double>) — coarse
  *     quantizer over UNIT vectors; model-sized (kCells × dim).
  *   - `codebook`: (j int, c int, vec array<double>) — per-subspace
  *     residual PQ codebooks; model-sized (m × pqCells × dim/m).
  *   - `codes`: (n_id long, codes array<int>), PARTITIONED BY cell —
  *     the compressed corpus, ~m bytes of payload per row (the ~64×
  *     compression), and the ONLY data-sized table. Partitioning by
  *     cell turns query routing into parquet PARTITION PRUNING: a
  *     search's scan physically reads nprobe/kCells of the archive.
  *
  * Search loads the two model tables driver-side (the same model-class
  * state as inline fits hold in memory — doubles round-trip parquet
  * bit-exactly) and runs the SAME Similarity.ivfPqSearchStage as the
  * inline operator, so prefit results are identical to ivfPqTopK at
  * equal parameters (IvfSpec pins the equality, the zero-fit-job
  * property, and the codes-only scan).
  */
object VectorIndex {

  /** Job-group tag on every fit-side job — lets a listener (and the
    * spec) prove the search path launches NO fit work. */
  val FitJobGroup = "graft-index-fit"

  /** Fit the coarse + residual-PQ models on `embeddings` and write the
    * artifact under `dir`. All Lloyd/fit jobs run inside the
    * [[FitJobGroup]] job group. */
  def fit(embeddings: DataFrame, dir: String, kCells: Int = 8,
      m: Int = 8, pqCells: Int = 16, iters: Int = 5): Unit = {
    import org.apache.spark.storage.StorageLevel
    val spark = embeddings.sparkSession
    val sc = spark.sparkContext
    sc.setJobGroup(FitJobGroup, s"IVF+PQ index fit -> $dir",
      interruptOnCancel = false)
    try {
      val vecs = Similarity.unitized(embeddings)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val dim = vecs.select(size(col("v"))).head().getInt(0)
      require(dim % m == 0,
        s"embedding dim $dim must be divisible by m=$m subspaces")
      val fitted = Similarity.fitIvfPq(vecs, dim, kCells, m, pqCells, iters)
      import spark.implicits._
      // model tables: tiny, single-file writes
      fitted.coarse.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("cell", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
      (for {
        j <- fitted.codebook.indices
        c <- fitted.codebook(j).indices
      } yield (j, c, fitted.codebook(j)(c).toSeq)).toDF("j", "c", "vec")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/codebook")
      // the compressed corpus, partitioned by (ingest_batch, cell):
      // cell gives routed partition PRUNING; the ingest_batch level is
      // the idempotency key incremental/streaming appends overwrite
      // into (fit itself is batch -1 and statically overwrites all)
      fitted.codes.withColumn("ingest_batch", lit(-1L))
        .write.mode("overwrite").partitionBy("ingest_batch", "cell")
        .parquet(s"$dir/codes")
      fitted.residuals.unpersist(blocking = false)
      vecs.unpersist(blocking = false)
      // a refit replaced the model tables: drop any cached copy
      modelCache.remove(dir)
      ()
    } finally sc.clearJobGroup()
  }

  /** Session-lifetime model cache: the artifact's models are immutable
    * for a given dir+layout (appends only add codes; a refit goes
    * through [[fit]], which invalidates), so search-many pays the two
    * model-table reads ONCE instead of per query batch. */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Array[Array[Double]], Array[Array[Array[Double]]])]()

  /** Driver-side model load: (coarse centroids, PQ codebook). Two tiny
    * parquet reads on first use, cached per dir after — the amortized
    * artifact, not a fit. */
  def loadModel(spark: SparkSession,
      dir: String): (Array[Array[Double]], Array[Array[Array[Double]]]) = {
    val cached = modelCache.get(dir)
    if (cached != null) return cached
    val coarse = spark.read.parquet(s"$dir/centroids")
      .orderBy("cell").collect()
      .map(_.getSeq[Double](1).toArray)
    val cbRows = spark.read.parquet(s"$dir/codebook")
      .orderBy("j", "c").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    val m = cbRows.map(_._1).max + 1
    val kc = cbRows.map(_._2).max + 1
    val codebook = Array.ofDim[Array[Double]](m, kc)
    cbRows.foreach { case (j, c, v) => codebook(j)(c) = v }
    val loaded = (coarse, codebook)
    modelCache.put(dir, loaded)
    loaded
  }

  /** Search-only IVF+PQ top-k against a prefit artifact: NO fit jobs —
    * the models load driver-side, the codes table is scanned with the
    * probed cells pruned at the parquet partition level, and the exact
    * re-rank touches `corpus` only for the candidate ids. `corpus` must
    * be the frame the index was fit on (codes reference its vec_ids);
    * `queries` carries (vec_id, v, norm) — the Similarity.ivfTopKOf
    * contract and id-space caveat. */
  def searchTopK(corpus: DataFrame, queries: DataFrame, dir: String,
      k: Int = 5, nprobe: Int = 3, rerank: Int = 100): DataFrame = {
    val spark = corpus.sparkSession
    val (coarse, codebook) = loadModel(spark, dir)
    val codes = spark.read.parquet(s"$dir/codes")
    Similarity.ivfPqSearchStage(codes, coarse, codebook, queries,
      Similarity.withNorm(corpus), k, nprobe, rerank, pruneCells = true)
  }

  /** Search-only IVF (exact-vector) top-k against the prefit artifact —
    * the EXACT-tier sibling of [[searchTopK]]: queries route through
    * the persisted centroids, the codes table serves ONLY as the cell
    * membership map (cell → n_id, partition-pruned to the probed
    * cells), and ranking is exact cosine against the corpus vectors for
    * the routed members. Still zero fit jobs. Note the routing model is
    * the artifact's UNIT-vector quantizer, so results match the
    * compressed tiers' routing, not Similarity.ivfTopKOf's raw-vector
    * inline fit — both are valid IVF indexes; an artifact must be
    * searched with its own quantizer. */
  def searchIvfTopK(corpus: DataFrame, queries: DataFrame, dir: String,
      k: Int = 5, nprobe: Int = 3): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = corpus.sparkSession
    val (coarse, _) = loadModel(spark, dir)
    // unit-space routing (the quantizer was fit on unit vectors)
    val qUnit = queries.select(col("vec_id"),
        call_function("graft_vec_scale", col("v"),
          lit(1.0) / sqrt(col("norm"))).as("v"))
      .withColumn("norm", call_function("graft_norm2", col("v")))
    val probed = qUnit
      .select(explode(Similarity.probeCells(coarse, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val q = qUnit
      .withColumn("cell", explode(Similarity.probeCells(coarse, nprobe)))
      .select(col("cell"), col("vec_id").as("q_id"))
      .join(queries.select(col("vec_id").as("q_id"),
        col("v").as("v_q"), col("norm").as("norm_q")), "q_id")
    val members = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(probed: _*)) // parquet partition pruning
      .select(col("cell"), col("n_id"))
    val c = Similarity.withNorm(corpus)
      .select(col("vec_id").as("n_id"), col("v").as("v_n"), col("norm").as("norm_n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    broadcast(q).join(members, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .join(c, "n_id")
      .withColumn("cos",
        call_function("graft_dot", col("v_q"), col("v_n")) /
          (sqrt(col("norm_q")) * sqrt(col("norm_n"))))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), round(col("cos"), 4).as("cos4"))
      .orderBy("q_id", "rnk")
  }

  /** Approximate ADC-only search: (q_id, rnk, n_id, adc) straight off
    * the codes table — no exact re-rank, so the returned plan's ONLY
    * file scan is `dir/codes` (model tables are driver-held constants,
    * queries broadcast). The first-response tier for latency-bound
    * callers; [[searchTopK]] is the exact-scored tier. */
  def searchAdc(queries: DataFrame, dir: String, k: Int = 5,
      nprobe: Int = 3): DataFrame = {
    val spark = queries.sparkSession
    val (coarse, codebook) = loadModel(spark, dir)
    val qUnit = queries.select(col("vec_id"),
        call_function("graft_vec_scale", col("v"),
          lit(1.0) / sqrt(col("norm"))).as("v"))
      .withColumn("norm", call_function("graft_norm2", col("v")))
    val qRows = qUnit
      .withColumn("probes", Similarity.probeCells(coarse, nprobe))
      .select(col("vec_id"), col("v"), col("probes")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray,
        r.getSeq[Int](2).toArray))
    val routed = qRows.flatMap { case (qid, qu, probes) =>
      probes.map(cell =>
        (qid, cell, Similarity.adcTableOf(qu, coarse(cell), codebook).toSeq))
    }
    import spark.implicits._
    val queriesDf = routed.toSeq.toDF("q_id", "cell", "tbl")
    val codes = spark.read.parquet(s"$dir/codes")
      .filter(col("cell").isin(routed.map(_._2).distinct.toSeq: _*))
    val w = Window.partitionBy("q_id").orderBy(col("adc"), col("n_id"))
    codes.join(broadcast(queriesDf), "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("adc", call_function("graft_pq_adc", col("tbl"), col("codes")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("n_id"), col("adc"))
      .orderBy("q_id", "rnk")
  }

  /** INCREMENTAL maintenance — the deployment's steady state: the
    * reference consumer ingests continuously, so new vectors must join
    * the index without a refit. New rows are assigned to the EXISTING
    * coarse cells and coded against the EXISTING residual codebooks
    * (model quality degrades only as the data distribution drifts —
    * the standard IVF+PQ operating assumption; refit on drift is a
    * scheduled rebuild, not a per-batch cost), and their codes APPEND
    * into the cell partitions. Zero fit jobs; a subsequent search sees
    * old and new rows identically. `ingestBatch` tags the write's
    * partition level (default -2 for ad-hoc batch appends; the
    * streaming path keys it by the micro-batch id). */
  def append(newVecs: DataFrame, dir: String,
      ingestBatch: Long = -2L): Unit =
    codeAgainstModel(newVecs, dir, ingestBatch)
      .write.mode("append").partitionBy("ingest_batch", "cell")
      .parquet(s"$dir/codes")

  /** New rows assigned + coded against the PERSISTED models — the
    * shared encode stage of [[append]] and [[appendBatch]]. */
  private def codeAgainstModel(newVecs: DataFrame, dir: String,
      ingestBatch: Long): DataFrame = {
    val spark = newVecs.sparkSession
    val (coarse, codebook) = loadModel(spark, dir)
    val m = codebook.length
    val flat = codebook.flatMap(_.flatMap(_.toSeq))
    val unit = Similarity.unitized(newVecs)
      .select(col("vec_id"), col("u").as("v"),
        call_function("graft_norm2", col("u")).as("norm"))
    val coarseLit = typedLit(coarse.map(_.toSeq).toSeq)
    unit
      .withColumn("cell", Similarity.nearestCentroid(coarse).getField("cid"))
      .withColumn("res", call_function("graft_vec_sub", col("v"),
        element_at(coarseLit, col("cell") + 1)))
      .select(col("cell"), col("vec_id").as("n_id"),
        call_function("graft_pq_assign", col("res"),
          typedLit(flat.toSeq), lit(m)).as("codes"))
      .withColumn("ingest_batch", lit(ingestBatch))
  }

  /** One micro-batch of streaming maintenance, IDEMPOTENTLY: foreachBatch
    * re-executes a batch after a failure, so a plain append would
    * double-index its vectors. Dynamic partition overwrite keyed by
    * (ingest_batch = the micro-batch id, cell) makes the retry replace
    * exactly its own partitions — the ConsumerApp.persistBatch rule
    * applied to index maintenance. */
  def appendBatch(batch: DataFrame, batchId: Long, dir: String): Unit = {
    codeAgainstModel(batch, dir, batchId)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("ingest_batch", "cell")
      .parquet(s"$dir/codes")
    ()
  }

  /** STREAMING index maintenance: embeddings arriving on a stream join
    * the prefit index per micro-batch (assigned + coded against the
    * persisted models, replay-safe) — the consumer's feature pipeline
    * feeding search continuously without ever refitting inline. */
  def appendStream(vecs: DataFrame, dir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, dir)
      }
      .start()

  /** Builds (once, marker-gated) the index for `sfDir`'s embeddings at
    * the default ivfPqTopK parameters and returns its directory — the
    * idempotent test-side stand-in for an artifact a deployment already
    * has (the FragmentArchive pattern). */
  def materialize(t: Tables, sfDir: String): String = {
    val spark = t.embeddings.sparkSession
    // the dir name carries a layout version + the fit params: a code or
    // parameter change must never silently search a stale artifact left
    // by an earlier run in the shared tmpdir
    val out = new Path(System.getProperty("java.io.tmpdir"),
      s"graft_vec_index_v2_k8_m8_pq16_i5_${math.abs(sfDir.hashCode)}")
    val fs = out.getFileSystem(spark.sessionState.newHadoopConf())
    val marker = new Path(out, "_INDEX_SUCCESS")
    if (!fs.exists(marker)) {
      fs.delete(out, true)
      fit(t.embeddings, out.toString)
      fs.create(marker, true).close()
    }
    out.toString
  }
}
