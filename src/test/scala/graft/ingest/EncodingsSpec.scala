package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

/** The reference encoding chain (file_handler.py:146-168), leg by leg,
  * pinned against Python codec behavior byte-for-byte.
  */
class EncodingsSpec extends AnyFunSuite {

  private val smartQuotes: Array[Byte] =
    // {"q":"<0x93>hi<0x94>"} — cp1252 smart quotes, invalid UTF-8
    Array('{', '"', 'q', '"', ':', '"', 0x93, 'h', 'i', 0x94, '"', '}').map(_.toByte)

  test("default chain: valid UTF-8 decodes as UTF-8") {
    val (text, enc) = Encodings.decode("{\"a\":\"déjà\"}".getBytes("UTF-8"))
    assert(enc == "UTF-8")
    assert(text == "{\"a\":\"déjà\"}")
  }

  test("default chain: utf-8-sig leg strips a BOM (Python utf-8-sig behavior)") {
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte)
    val (text, enc) = Encodings.decode(bom ++ "{\"a\":1}".getBytes("UTF-8"))
    assert(enc == "UTF-8")
    assert(text == "{\"a\":1}") // no U+FEFF prefix
  }

  test("default chain: invalid UTF-8 falls to latin-1, same as Python's default walk") {
    // Python: 'utf-8-sig' fails, 'utf-8' fails, 'latin-1' wins — 0x93
    // becomes the C1 control U+0093, NOT a smart quote, because latin-1
    // precedes cp1252 in the reference chain and never fails
    val (text, enc) = Encodings.decode(smartQuotes)
    assert(enc == "ISO-8859-1")
    assert(text.charAt(6) == 0x93.toChar && text.charAt(9) == 0x94.toChar)
  }

  test("cp1252 leg: a custom Windows chain decodes smart quotes (Python cp1252 behavior)") {
    val (text, enc) = Encodings.decode(smartQuotes, Seq("utf-8", "cp1252"))
    assert(enc == "windows-1252")
    // bytes 0x93/0x94 are U+201C/U+201D in cp1252 — what Python's
    // bytes.decode('cp1252') yields
    assert(text == "{\"q\":\"“hi”\"}")
  }

  test("ascii leg: strict — pure ASCII passes, 8-bit bytes fail through") {
    val (text, enc) = Encodings.decode("{\"a\":1}".getBytes("US-ASCII"), Seq("ascii"))
    assert(enc == "US-ASCII" && text == "{\"a\":1}")
    // cp1252 maps 0x93 but NOT 0x81/0x8D/0x8F/0x90/0x9D (undefined in
    // Windows-1252, same as Python raising on them)
    val undefinedCp1252 = Array[Byte]('a', 0x81.toByte)
    intercept[java.nio.charset.CharacterCodingException] {
      Encodings.decode(undefinedCp1252, Seq("ascii", "cp1252"))
    }
  }

  test("chain order matters: cp1252 before latin-1 wins on Windows bytes") {
    val (_, encA) = Encodings.decode(smartQuotes, Seq("cp1252", "latin-1"))
    assert(encA == "windows-1252")
    val (_, encB) = Encodings.decode(smartQuotes, Seq("latin-1", "cp1252"))
    assert(encB == "ISO-8859-1")
  }
}
