package graft.image

import java.nio.charset.StandardCharsets
import java.util.Base64

/** Resolves a span's `media_ref` to raw page-image bytes inside a
  * task. In production this would read an object store / side table
  * keyed by media_ref (SURVEY.md §2.7 J3); for deterministic offline
  * fixtures the ref is self-describing (`synth://...`) and the bytes
  * are rendered on the fly — no side files, no joins, no shuffles.
  *
  * Implementations must be Serializable: they are closed over by
  * mapPartitions tasks.
  */
trait MediaStore extends Serializable {
  def fetch(mediaRef: String): Array[Byte]

  /** Fetch with caller-provided scratch: implementations MAY write the
    * payload into `reuse` when it fits (and return it), eliminating
    * the per-image payload allocation inside a task's fetch loop — the
    * single biggest allocation on the OCR hot path, which is
    * allocation/bandwidth-bound at high task parallelism. The returned
    * payload is only valid until the next reuse-fetch on that scratch.
    * Default: plain fetch (remote stores hand over network buffers).
    */
  def fetch(mediaRef: String, reuse: Array[Byte]): Array[Byte] = fetch(mediaRef)
}

/** `synth://v1/<seed>/<angleMdeg>/<noisePpm>/<base64url(utf8 text)>`
  * (PGM payload) or `synth://v1png/...` (same fields, PNG payload —
  * the reference's actual page-render format, smart.py:91-96).
  *
  * The embedded text is the ground-truth page content; the OCR engine
  * never sees it — it only sees the rendered raster (the oracle
  * decodes it independently when building expected outputs).
  */
object SynthMediaStore extends MediaStore {
  val Scheme = "synth://v1/"
  val PngScheme = "synth://v1png/"

  def ref(text: String, angleMdeg: Int, noisePpm: Int, seed: Long): String = {
    val b64 = Base64.getUrlEncoder.withoutPadding
      .encodeToString(text.getBytes(StandardCharsets.UTF_8))
    s"$Scheme$seed/$angleMdeg/$noisePpm/$b64"
  }

  /** Same render, PNG payload (exercises the PngCodec decode path). */
  def refPng(text: String, angleMdeg: Int, noisePpm: Int, seed: Long): String = {
    val b64 = Base64.getUrlEncoder.withoutPadding
      .encodeToString(text.getBytes(StandardCharsets.UTF_8))
    s"$PngScheme$seed/$angleMdeg/$noisePpm/$b64"
  }

  final case class Parsed(seed: Long, angleMdeg: Int, noisePpm: Int, text: String, png: Boolean)

  def parse(mediaRef: String): Parsed = {
    val png = mediaRef.startsWith(PngScheme)
    require(png || mediaRef.startsWith(Scheme), s"unsupported media_ref: $mediaRef")
    val parts = mediaRef.substring(if (png) PngScheme.length else Scheme.length).split("/", 4)
    require(parts.length == 4, s"malformed synth ref: $mediaRef")
    val text = new String(Base64.getUrlDecoder.decode(parts(3)), StandardCharsets.UTF_8)
    Parsed(parts(0).toLong, parts(1).toInt, parts(2).toInt, text, png)
  }

  /** Ground truth for oracle construction ONLY (never used by the OCR path). */
  def expectedText(mediaRef: String): String = parse(mediaRef).text

  override def fetch(mediaRef: String): Array[Byte] = fetch(mediaRef, null)

  override def fetch(mediaRef: String, reuse: Array[Byte]): Array[Byte] = {
    val p = parse(mediaRef)
    if (p.png) PngCodec.encode(SynthRenderer.render(p.text, p.angleMdeg, p.noisePpm, p.seed))
    // one layout pass + render straight into the (reusable) PGM payload
    else SynthRenderer.renderPgm(p.text, p.angleMdeg, p.noisePpm, p.seed, reuse)
  }
}
