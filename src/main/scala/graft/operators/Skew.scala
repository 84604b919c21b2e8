package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation building blocks (SURVEY §5).
  *
  * AQE's skew-join handles sort-merge skew at runtime, but two patterns
  * still need explicit structure at 100 TB: hot-key aggregation (one
  * reducer drowns) and hot-key dim joins with shuffle joins. Both use
  * deterministic salts derived from a disambiguator column — reproducible
  * under retries, unlike rand().
  */
object Skew {

  /** Two-phase salted aggregation: count+sum per key without any single
    * reducer receiving a hot key's full volume. Phase 1 aggregates
    * (key, salt) partials; phase 2 merges the ≤`salts` partials per key. */
  def saltedAgg(df: DataFrame, key: String, valueCol: Column, saltFrom: Column,
      salts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(valueCol).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as("n"), sum("_s").as("s"))

  /** Salted big⋈small equi-join: the big (skewed) side gets a salt from a
    * disambiguator column; the small side is replicated `salts` times so
    * every (key, salt) bucket finds its match. Breaks one hot key across
    * `salts` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFrom: Column,
      salts: Int = 16): DataFrame = {
    val bigS = big.withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }
}
