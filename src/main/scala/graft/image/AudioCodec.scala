package graft.image

/** Opaque AUDIO payloads for the multimodal column path: 16-bit
  * signed big-endian PCM behind a tiny self-describing header —
  * `syntha://v1/<seed>/<nSamples>/<period>/<amplitude>` synthesizes a
  * square wave, the deterministic stand-in for audio decode (the
  * production seam swaps `fetch` for an object-store read and `decode`
  * for a real codec; every downstream step — binary payload, per-task
  * decode, windowed feature extraction — is real and tested).
  *
  * A square wave makes every extracted feature CLOSED-FORM in the ref
  * parameters, so the driver query's DuckDB oracle can state the
  * expected rms / zero-crossing counts exactly:
  *   - sample(i) = +A if (i / halfPeriod) is even else -A
  *   - rms == A exactly (every sample has magnitude A)
  *   - sign changes at i = k * halfPeriod (k >= 1, i <= n-1):
  *     zeroCrossings == floor((n - 1) / halfPeriod)
  */
object AudioCodec {
  val Scheme = "syntha://v1/"
  private val Magic = Array[Byte]('A', 'U', 'D', '1')

  def ref(seed: Long, nSamples: Int, period: Int, amplitude: Int): String = {
    require(period >= 2 && period % 2 == 0, s"period $period must be even >= 2")
    s"$Scheme$seed/$nSamples/$period/$amplitude"
  }

  /** Synthesize the PCM payload: 4-byte magic, int32 sample count,
    * then big-endian int16 samples.
    */
  def fetch(mediaRef: String): Array[Byte] = {
    require(mediaRef.startsWith(Scheme), s"unsupported audio ref: $mediaRef")
    val parts = mediaRef.substring(Scheme.length).split("/")
    require(parts.length == 4, s"bad audio ref: $mediaRef")
    val n = parts(1).toInt
    val period = parts(2).toInt
    val amp = parts(3).toInt
    // refs can be hand-authored data, not just ref() output — enforce
    // the invariant HERE (period 0/1 would divide by zero below; odd
    // periods silently break the closed-form feature contract)
    require(period >= 2 && period % 2 == 0, s"period $period must be even >= 2: $mediaRef")
    require(n >= 0, s"negative sample count in $mediaRef")
    val half = period / 2
    val out = new Array[Byte](8 + 2 * n)
    System.arraycopy(Magic, 0, out, 0, 4)
    out(4) = (n >>> 24).toByte; out(5) = (n >>> 16).toByte
    out(6) = (n >>> 8).toByte; out(7) = n.toByte
    var i = 0
    while (i < n) {
      val v = if ((i / half) % 2 == 0) amp else -amp
      out(8 + 2 * i) = (v >>> 8).toByte
      out(9 + 2 * i) = v.toByte
      i += 1
    }
    out
  }

  /** Decode a payload back to samples (validates magic + length). */
  def decode(bytes: Array[Byte]): Array[Short] = {
    require(bytes.length >= 8 && bytes(0) == 'A' && bytes(1) == 'U' &&
      bytes(2) == 'D' && bytes(3) == '1', "not an AUD1 payload")
    val n = ((bytes(4) & 0xff) << 24) | ((bytes(5) & 0xff) << 16) |
      ((bytes(6) & 0xff) << 8) | (bytes(7) & 0xff)
    require(bytes.length == 8 + 2 * n, s"truncated AUD1 payload: $n samples, ${bytes.length} bytes")
    val s = new Array[Short](n)
    var i = 0
    while (i < n) {
      s(i) = (((bytes(8 + 2 * i) & 0xff) << 8) | (bytes(9 + 2 * i) & 0xff)).toShort
      i += 1
    }
    s
  }

  final case class AudioFeatures(nSamples: Long, rms: Double, zeroCrossings: Long)

  /** One pass: root-mean-square + sign-change count (the standard
    * cheap audio features a filter pipeline gates on).
    */
  def features(samples: Array[Short]): AudioFeatures = {
    var sumSq = 0.0
    var zc = 0L
    var i = 0
    while (i < samples.length) {
      val v = samples(i).toDouble
      sumSq += v * v
      if (i > 0 && ((samples(i - 1) < 0) != (samples(i) < 0))) zc += 1
      i += 1
    }
    val rms = if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length)
    AudioFeatures(samples.length.toLong, rms, zc)
  }
}
