package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline
  * operators — all pure `Column` expression compositions (codegen'd
  * built-ins, no UDFs), each with an exact DuckDB-SQL equivalent so
  * dedup/similarity results are oracle-verifiable cross-engine.
  *
  * Cross-engine hash: the first 15 hex chars of md5 parsed as a 60-bit
  * integer — Spark `conv(substring(md5(x),1,15),16,10)` ==
  * DuckDB `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`. md5 is
  * byte-identical in both engines; 60 bits keeps values positive in a
  * signed 64-bit long on both sides.
  */
object TextFunctions {

  /** Whitespace tokenization (the baseline tokenizer). */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** A BPE-ish regex tokenizer: letter runs, digit runs, or single
    * punctuation — closer to how byte-pair pretokenizers split.
    */
  def regexTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\p{L}+|\\d+|[^\\s\\p{L}\\d]"), lit(0))

  /** Distinct word n-gram shingles (n>=1). Guarded: fewer than n
    * tokens yields an empty set (Spark `sequence(1,0)` would descend).
    */
  def shingles(toks: Column, n: Int): Column = {
    require(n >= 1)
    if (n == 1) array_distinct(toks)
    else {
      val grams = transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*))
      array_distinct(when(size(toks) >= n, grams).otherwise(array()))
    }
  }

  /** 60-bit md5-derived hash of a string column. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Redact PII-ish spans for training-data cleaning: email addresses,
    * then long digit runs (ids/phones) — both global replaces (DuckDB
    * replay needs the 'g' flag; Spark is global by default).
    */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\d{6,}", "<NUM>")

  /** Seeded variant: h_j(s) = hash60(s || '#' || j). */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(c, lit("#"), lit(seed.toString)))

  /** Scala-side mirror of [[hash60]] for typed (Dataset) operators —
    * streaming stateful groups can't evaluate Columns. Bit-identical
    * to the Column form (asserted in HashExprSpec): md5 hex of the
    * UTF-8 bytes, first 15 hex chars as a 60-bit long.
    */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60Scala(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    // first 15 hex chars == high 60 bits of the first 8 digest bytes
    // (big-endian >>> 4) — integer form of parseLong(hex.take(15), 16),
    // pinned bit-identical to the Column family by HashExprSpec
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Seeded Scala mirror of hash60(c, seed). */
  def hash60Scala(s: String, seed: Int): Long = hash60Scala(s + "#" + seed)

  /** Element-wise hash60 over a string array — hash shingles ONCE,
    * then signatures/simhash/Jaccard all work on the long values
    * (DuckDB: list_transform(xs, s -> hash60 SQL)).
    */
  def hash60Array(strings: Column): Column =
    transform(strings, s => hash60(s))

  /** MinHash signature over a PRE-HASHED (hash60Array) shingle set:
    * numHashes minima of bijective xor-add mixes (see
    * graft.plans.MinHashSig for the scheme and the fast single-pass
    * implementation this composed form mirrors).
    */
  def minhashSignature(hashedShingles: Column, numHashes: Int): Column = {
    import graft.plans.MinHashSig.{mixA, mixB, Mask60}
    array((0 until numHashes).map { j =>
      array_min(transform(hashedShingles, h =>
        (h.bitwiseXOR(lit(mixA(j))) + lit(mixB(j))).bitwiseAND(lit(Mask60))))
    }: _*)
  }

  /** 60-bit SimHash over a PRE-HASHED shingle set: bit b of each hash
    * votes +1/-1, bit set where the vote sum is positive, packed
    * MSB-first (b=0 highest). Matches the DuckDB list_reduce
    * formulation exactly.
    */
  def simhash60(hashedShingles: Column): Column =
    aggregate(
      transform(sequence(lit(0), lit(59)), b =>
        when(
          aggregate(hashedShingles, lit(0L),
            (acc, h) => acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)) > 0,
          lit(1L)).otherwise(lit(0L))),
      lit(0L),
      (acc, x) => acc * 2 + x)

  private def shiftright(c: Column, bits: Column): Column =
    call_function("shiftright", c, bits)

  /** Hamming distance between two packed simhashes. */
  def hamming(a: Column, b: Column): Column =
    call_function("bit_count", a.bitwiseXOR(b)).cast("long")

  /** Jaccard similarity of two distinct-element arrays. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact content fingerprint (md5 hex — identical in DuckDB). */
  def fingerprint(text: Column): Column = md5(text)

  /** Canonicalized fingerprint: lowercase, collapse whitespace. */
  def canonicalFingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  // ---- quality scoring (length / punctuation / stopword ratios) ----

  val DefaultStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  def avgWordLen(text: Column): Column = {
    val t = tokens(text)
    aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") / size(t)
  }

  def stopwordRatio(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val t = tokens(lower(text))
    val stops = array(stopwords.map(lit): _*)
    size(filter(t, w => array_contains(stops, w))).cast("double") / size(t)
  }

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double") /
      greatest(length(text), lit(1))

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * punctuation density and a natural-language stopword rate.
    */
  def qualityScore(text: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    round((lenScore + punctScore + stopScore) / 3.0, 4)
  }

  // ---- language identification (marker-word occurrence heuristic) ----

  /** Occurrences of a marker (space-padded word match) via the
    * length-difference trick — identical arithmetic in DuckDB.
    */
  def occurrences(text: Column, marker: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $marker "
    // literal (non-regex) replace — same non-overlapping left-to-right
    // semantics as DuckDB's replace(), ~3× faster than the regex engine
    ((length(padded) - length(replace(padded, lit(needle), lit(" ")))) /
      lit(needle.length - 1)).cast("long")
  }

  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "es" -> Seq("el", "la", "de"),
    "de" -> Seq("der", "die", "und"),
    "fr" -> Seq("le", "les", "est"),
    "zh" -> Seq("的", "是", "在"))

  /** Predicted language = argmax of marker-occurrence scores as a CASE
    * chain (branch i fires when score_i > 0 and >= every *later* score;
    * fall-through handles earlier branches) — deterministic and
    * byte-identical to the same CASE chain in DuckDB.
    */
  def langId(text: Column): Column = {
    val lowered = lower(text)
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> markers.map(m => occurrences(lowered, m)).reduce(_ + _)
    }
    scores.zipWithIndex.foldRight(lit("und")) { case (((lang, score), i), elseCol) =>
      val beatsLater = scores.drop(i + 1).map(_._2)
        .foldLeft(lit(true))((acc, s2) => acc && score >= s2)
      when(score > 0 && beatsLater, lit(lang)).otherwise(elseCol)
    }
  }
}
