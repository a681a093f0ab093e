package graft.ops

/** Minimal pure-JVM PCM WAV container codec.
  *
  * `decode` is a REAL RIFF/WAVE parser — it walks the chunk list (4-byte
  * id, little-endian 32-bit size, odd-size pad byte), reads the `fmt `
  * chunk (PCM format tag, channel count, sample rate, bits per sample)
  * and the `data` chunk, and returns the 16-bit samples — it will decode
  * any standard PCM16 WAV file, not just the synthetic fixtures. No
  * codec LIBRARY ships in this environment, but a PCM container needs
  * none: the "decode" is header parsing + sample extraction, which is
  * exactly what this does.
  *
  * `synthesize` builds a deterministic PCM16 mono WAV from seed bytes —
  * the fixture side: the corpus has no real media column, so the op
  * manufactures one in-flight and then treats it as opaque payload
  * bytes.
  */
object Wav {

  final case class Pcm(channels: Int, sampleRate: Int, bitsPerSample: Int,
      samples: Array[Short]) {
    def nSamples: Int = samples.length / math.max(channels, 1)
    def durationMs: Double =
      if (sampleRate == 0) 0.0 else nSamples * 1000.0 / sampleRate
    def rms: Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.foldLeft(0.0)((a, x) => a + x.toDouble * x) / samples.length)
    def peak: Int =
      if (samples.isEmpty) 0 else samples.foldLeft(0)((a, x) => math.max(a, math.abs(x.toInt)))
  }

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE byte array; None unless it is a well-formed
    * 16-bit PCM (format tag 1) file with both `fmt ` and `data` chunks.
    */
  def decode(b: Array[Byte]): Option[Pcm] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12L // Long walk: a crafted u32 chunk size must fail the
    var fmt: Option[(Int, Int, Int, Int)] = None // bound check, not overflow past it
    var data: Option[(Int, Int)] = None          // (offset, length)
    while (off + 8 <= b.length) {
      val id = tag(b, off.toInt)
      val size = le32(b, off.toInt + 4).toLong & 0xffffffffL // chunk size is u32
      if (off + 8 + size > b.length) return None
      id match {
        case "fmt " if size >= 16 =>
          val o = off.toInt
          fmt = Some((le16(b, o + 8), le16(b, o + 10), le32(b, o + 12), le16(b, o + 22)))
        case "data" =>
          data = Some((off.toInt + 8, size.toInt))
        case _ => () // skip unknown chunks (LIST, fact, …)
      }
      off += 8 + size + (size & 1) // odd chunk sizes carry a pad byte
    }
    (fmt, data) match {
      case (Some((1, ch, rate, 16)), Some((doff, dlen))) if ch > 0 && rate > 0 =>
        val n = dlen / 2
        val samples = new Array[Short](n)
        var i = 0
        while (i < n) { samples(i) = le16(b, doff + 2 * i).toShort; i += 1 }
        Some(Pcm(ch, rate, 16, samples))
      case _ => None
    }
  }

  /** The deterministic PCM16 waveform shared by every audio-container
    * synth (WAV here, AU in [[Au]] — r14): same (seed, bytes) ⇒ same
    * samples, so cross-container features must agree exactly.
    */
  def samplesOf(seed: Long, src: Array[Byte]): Array[Short] = {
    val n = 200 + (math.abs(seed) % 56).toInt + (src.length % 256)
    val samples = new Array[Short](n)
    val l = math.max(src.length, 1)
    var i = 0
    while (i < n) {
      val base = if (src.isEmpty) 0 else src(i % l) & 0xff
      samples(i) = ((((base * 131 + i * 7 + seed % 251) % 65536) + 65536) % 65536 - 32768).toShort
      i += 1
    }
    samples
  }

  /** Deterministic PCM16 mono 8 kHz WAV from seed bytes: sample count
    * and waveform derive from (seed, bytes) by integer arithmetic only.
    */
  def synthesize(seed: Long, src: Array[Byte]): Array[Byte] = {
    val samples = samplesOf(seed, src)
    val n = samples.length
    val dataLen = 2 * n
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + dataLen); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1); out.putShort(1)      // PCM, mono
    out.putInt(8000); out.putInt(16000)   // rate, byte rate
    out.putShort(2); out.putShort(16)     // block align, bits
    out.put("data".getBytes); out.putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }
}
