package graft.operators

/** Orderings for driver-local tie-breaks that must match the
  * distributed path and the DuckDB oracle, which both compare strings
  * as UTF-8 bytes (equivalently, by Unicode code point). Scala's
  * default `Ordering[String]` compares UTF-16 code units, which
  * diverges for supplementary-plane characters vs [U+E000, U+FFFF].
  */
private[operators] object LocalOrder {

  /** Code-point-wise comparison — identical to UTF-8 byte order. */
  val utf8: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      var i = 0
      var j = 0
      while (i < a.length && j < b.length) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(j)
        if (ca != cb) return Integer.compare(ca, cb)
        i += Character.charCount(ca)
        j += Character.charCount(cb)
      }
      Integer.compare(a.length - i, b.length - j)
    }
  }
}
