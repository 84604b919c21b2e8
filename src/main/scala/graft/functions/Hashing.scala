package graft.functions

import java.nio.charset.StandardCharsets

/** Deterministic 64-bit hashing for sketch operators (MinHash / SimHash /
  * LSH). Self-contained splitmix64-based mixing — stable across JVMs,
  * partitions, and Spark versions, which is what makes the sketch queries
  * reproducible row-order-independently at any scale.
  *
  * These run inside tight per-row UDF loops on purpose: Spark's
  * higher-order-function lambdas (transform/aggregate) evaluate
  * interpreted per element (~µs each), while a JVM loop over the same data
  * is ~ns per element. The UDF boundary costs one row-level
  * serialization but wins 3 orders of magnitude on the inner loop.
  */
object Hashing {

  /** splitmix64 finalizer — strong 64-bit mix. */
  @inline def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Hash of a string's UTF-8 bytes (8-byte little-endian blocks + tail),
    * chained through mix64. */
  def hashString(s: String): Long = {
    val bs = s.getBytes(StandardCharsets.UTF_8)
    var h = 0x51_7c_c1_b7_27_22_0a_95L ^ bs.length
    var i = 0
    var block = 0L
    var shift = 0
    while (i < bs.length) {
      block |= (bs(i) & 0xffL) << shift
      shift += 8
      if (shift == 64) { h = mix64(h ^ block); block = 0L; shift = 0 }
      i += 1
    }
    if (shift > 0) h = mix64(h ^ block)
    h
  }

  /** Seeded variant: combine a precomputed base hash with a seed. */
  @inline def withSeed(baseHash: Long, seed: Long): Long = mix64(baseHash ^ seed)
}
