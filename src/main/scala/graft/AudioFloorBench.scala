package graft

/** Minimal JDK-codec microbench for the mm_decode_audio floor
  * (round-12 verdict item 7): measures javax.sound WAV encode and
  * decode alone — no Spark, no shuffle, one thread — over the exact
  * synthetic clips the catalog entry uses
  * ([[graft.operators.Multimodal.syntheticWav]] /
  * `decodeAudioFeatures`'s per-row body).
  *
  * Purpose: the entry's median moved 0.72 → 1.76 s between rounds 9
  * and 11 with NO touching commit; BASELINE.md root-caused it to this
  * VM class's drifting JDK/JNI codec floor. This main makes that
  * claim reproducible forever: run it, multiply the per-clip cost by
  * the row count and divide by the thread count, and compare with the
  * entry median — when the box drifts, THIS number drifts with it,
  * and the entry is codec-bound, not engine-bound.
  *
  * Usage: `runMain graft.AudioFloorBench [clips]` (default 30000).
  */
object AudioFloorBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 30000
    val M = graft.operators.Multimodal

    def decodeOne(p: Array[Byte]): Double = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(p))
      val fmt = ais.getFormat
      val bytes = ais.readAllBytes()
      val nn = bytes.length / 2
      var sum = 0L
      var i = 0
      while (i < nn) {
        val s = (bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff)
        sum += s; i += 1
      }
      require(fmt.getChannels == 1)
      sum.toDouble
    }

    // warmup (JIT + codec provider registry init)
    (0 until 3000).foreach(i => decodeOne(M.syntheticWav(i.toLong)))

    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { val _ = M.syntheticWav(i.toLong); i += 1 }
    val tEnc = (System.nanoTime() - t0) / 1e9

    val wavs = Array.tabulate(math.min(n, 4096))(i => M.syntheticWav(i.toLong))
    val t1 = System.nanoTime()
    i = 0
    while (i < n) { val _ = decodeOne(wavs(i % wavs.length)); i += 1 }
    val tDec = (System.nanoTime() - t1) / 1e9

    val encUs = tEnc / n * 1e6
    val decUs = tDec / n * 1e6
    println(f"[audio-floor] encode: $encUs%.1f us/clip  " +
      f"decode: $decUs%.1f us/clip  " +
      f"(single-thread, ${n} clips)")
    // the catalog entry does BOTH per row; project its floor at the
    // bench's documents row count and thread count
    val rows = 5000.0 // sf0.1 documents table row count
    val threads = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toDouble
    println(f"[audio-floor] projected mm_decode_audio codec floor at " +
      f"sf0.1/local[${threads.toInt}]: " +
      f"${rows * (encUs + decUs) / 1e6 / threads}%.2f s " +
      "(excludes Spark scan/row overhead)")
  }
}
