package graft.util

/** Deterministic 64-bit mixing (SplitMix64, public domain constants from
  * Steele et al., "Fast Splittable Pseudorandom Number Generators", OOPSLA'14).
  * Used by the WAL generator so that the engine-side generation (executors)
  * and the test oracle (driver) compute identical streams with no RNG state.
  */
object DetHash {
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** Uniform double in [0, 1) derived from the top 53 bits of the mix. */
  def uniform01(x: Long): Double =
    (splitmix64(x) >>> 11).toDouble / (1L << 53).toDouble

  /** Non-negative long in [0, n). */
  def nextLong(x: Long, n: Long): Long = {
    val h = splitmix64(x)
    java.lang.Math.floorMod(h, n)
  }

  @volatile private var calibSink = 0L

  /** Fixed-work single-thread CPU calibration (splitmix64 Mops) — a noise
    * index for benchmark runs on shared hosts.
    */
  def calibrateMops(): Double = {
    val t0 = System.nanoTime()
    var x = 0L; var i = 0L
    while (i < 50000000L) { x = splitmix64(x); i += 1 }
    calibSink = x
    50.0 / ((System.nanoTime() - t0) / 1e9)
  }
}
