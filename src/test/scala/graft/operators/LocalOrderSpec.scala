package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The driver-local tie-break ordering must match UTF-8 byte order
  * (DuckDB / Spark binary string comparison), not Java's UTF-16
  * code-unit order. The two diverge exactly when a supplementary-plane
  * character (surrogate pair, high unit 0xD800-0xDBFF) meets a BMP
  * character in [U+E000, U+FFFF].
  */
class LocalOrderSpec extends AnyFunSuite {

  test("code-point order ranks U+E000 before an emoji; UTF-16 order flips it") {
    val emoji = new String(Character.toChars(0x1F600)) // surrogate pair D83D DE00
    val pua = ""
    // Java default (UTF-16 code units): D83D < E000
    assert(Ordering.String.compare(emoji, pua) < 0)
    // code points / UTF-8 bytes: 0x1F600 > 0xE000
    assert(LocalOrder.utf8.compare(emoji, pua) > 0)
    assert(LocalOrder.utf8.compare(pua, emoji) < 0)
    // and agrees with actual UTF-8 byte comparison
    def utf8Bytes(s: String) = s.getBytes("UTF-8").map(_ & 0xff)
    def byteCmp(a: String, b: String): Int = {
      val (x, y) = (utf8Bytes(a), utf8Bytes(b))
      x.zip(y).collectFirst { case (p, q) if p != q => Integer.compare(p, q) }
        .getOrElse(Integer.compare(x.length, y.length))
    }
    for (s <- Seq("", "a", "ab", "b", pua, emoji, "z￿", "z" + emoji);
         t <- Seq("", "a", "ab", "b", pua, emoji, "z￿", "z" + emoji))
      assert(Integer.signum(LocalOrder.utf8.compare(s, t)) == Integer.signum(byteCmp(s, t)),
        s"mismatch on ${s.codePoints().toArray.toSeq} vs ${t.codePoints().toArray.toSeq}")
  }

  test("prefix and equality behave like standard string ordering") {
    assert(LocalOrder.utf8.compare("abc", "abc") == 0)
    assert(LocalOrder.utf8.compare("ab", "abc") < 0)
    assert(LocalOrder.utf8.compare("abd", "abc") > 0)
  }
}
