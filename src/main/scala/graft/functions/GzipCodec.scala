package graft.functions

/** Gzip text codec (RFC 1952 via the JDK's java.util.zip) — the
  * COMPRESSED TEXT member of the opaque-payload family: crawled corpora
  * arrive as gzip members (WARC/WET convention), so a 100-TB text
  * pipeline's first operator is often "gunzip this binary column".
  * PngCodec crosses the zlib boundary for image payloads; this is the
  * text twin.
  *
  * Integrity contract mirrors the other codecs: gzip carries CRC-32 and
  * ISIZE trailers which GZIPInputStream VERIFIES — a bit flip anywhere
  * in the member surfaces as an IOException, which [[gunzip]] degrades
  * to null (never throws, never emits garbage). A zip-bomb guard caps
  * the inflated size. Compressed BYTES are JVM-internal (zlib-version-
  * dependent) and never cross the engine boundary: oracles recompute
  * answers from the original text column.
  */
object GzipCodec {

  /** Inflated-size cap (64 MiB): a hostile member must fail the decode,
    * never balloon executor memory. */
  val MaxInflated: Int = 64 << 20

  /** Gzip a UTF-8 text payload. Null in, null out. */
  def gzip(text: Array[Byte]): Array[Byte] = {
    if (text == null) return null
    val bos = new java.io.ByteArrayOutputStream(text.length / 2 + 32)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(text)
    gz.close()
    bos.toByteArray
  }

  /** Gunzip to the original bytes; null on ANY structural violation
    * (bad magic, truncation, CRC/ISIZE mismatch, over-cap inflation).
    * CONCATENATED members decode to the concatenated payload — the
    * standard `cat a.gz b.gz` semantics the JDK stream implements,
    * and exactly how WARC/WET shards arrive. Pure header METADATA
    * (MTIME/XFL/OS) does not affect the recovered content — integrity
    * is the payload CRC's job, not the metadata's (spec-pinned). */
  def gunzip(b: Array[Byte]): Array[Byte] = {
    if (b == null) return null
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val bos = new java.io.ByteArrayOutputStream(math.min(b.length * 3, 1 << 16))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) {
        bos.write(buf, 0, n)
        if (bos.size() > MaxInflated) return null
        n = in.read(buf)
      }
      in.close()
      bos.toByteArray
    } catch {
      case _: java.io.IOException => null
    }
  }
}
