package graft.ingest

import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction, StandardCharsets}

/** The reference's encoding-fallback chain (file_handler.py:146-168:
  * try `utf-8-sig`, then `utf-8`, `latin-1`, `cp1252`, `ascii`; each
  * leg decodes STRICTLY and a decode error falls through to the next;
  * the last leg's failure propagates).
  *
  * Faithfulness note: latin-1 maps every byte, so in the DEFAULT chain
  * the cp1252/ascii legs are unreachable — in the reference exactly as
  * here (Python's latin-1 never raises UnicodeDecodeError either). The
  * later legs exist for CUSTOM chains: a caller who knows their corpus
  * is Windows-exported passes e.g. `Seq("utf-8", "cp1252")` and gets
  * real Windows-1252 semantics (0x93 → U+201C curly quote, where
  * latin-1 would yield the C1 control U+0093). Spec'd byte-for-byte
  * against Python's codec behavior in EncodingsSpec.
  */
object Encodings {

  /** Python codec name → (strict JVM decoder factory, canonical JVM
    * charset name usable as a Spark reader `encoding` option).
    * `utf-8-sig` = UTF-8 with the BOM stripped before decode.
    */
  val DefaultChain: Seq[String] = Seq("utf-8-sig", "utf-8", "latin-1", "cp1252", "ascii")

  private def strictDecoder(cs: Charset): CharsetDecoder =
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.REPORT)
      .onUnmappableCharacter(CodingErrorAction.REPORT)

  private def charsetFor(name: String): Charset = name.toLowerCase match {
    case "utf-8-sig" | "utf-8" | "utf8" => StandardCharsets.UTF_8
    case "latin-1" | "latin1" | "iso-8859-1" => StandardCharsets.ISO_8859_1
    case "cp1252" | "windows-1252" => Charset.forName("windows-1252")
    case "ascii" | "us-ascii" => StandardCharsets.US_ASCII
    case other => Charset.forName(other)
  }

  /** Canonical JVM charset name for a chain entry (what
    * `spark.read.option("encoding", _)` accepts).
    */
  def javaName(name: String): String = charsetFor(name).name()

  private val Utf8Bom = Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte)

  /** Decode `bytes` through the chain: first leg that decodes strictly
    * wins. Returns (text, canonical JVM charset name of the winning
    * leg). Throws the last leg's CharacterCodingException when every
    * leg fails (only possible for chains without a total encoding like
    * latin-1 — same contract as the reference's final re-raise).
    */
  def decode(bytes: Array[Byte], chain: Seq[String] = DefaultChain): (String, String) = {
    require(chain.nonEmpty, "empty encoding chain")
    var last: java.nio.charset.CharacterCodingException = null
    chain.foreach { name =>
      val stripBom = name.toLowerCase == "utf-8-sig" &&
        bytes.length >= 3 && bytes.take(3).sameElements(Utf8Bom)
      val body = if (stripBom) java.util.Arrays.copyOfRange(bytes, 3, bytes.length) else bytes
      try {
        val text = strictDecoder(charsetFor(name))
          .decode(java.nio.ByteBuffer.wrap(body)).toString
        return (text, javaName(name))
      } catch {
        case e: java.nio.charset.CharacterCodingException => last = e
      }
    }
    throw last
  }
}
