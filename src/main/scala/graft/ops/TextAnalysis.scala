package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification and document
  * fingerprinting. All but langId/fingerprint are pure `sql.functions`
  * column expressions (whole-stage-codegen friendly, no UDF); the two
  * hash/score functions are deterministic Scala UDF-style functions with
  * no external model, so results are reproducible across runs and engines.
  */
object TextAnalysis {

  /** Whitespace tokenizer — the engine's canonical tokenization. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A small, fixed English-ish stopword set (deterministic contract). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t =>
      t.isin(Stopwords.map(x => x: Any): _*)))

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** PII patterns, deliberately restricted to the regex dialect common to
    * Java (Spark) and RE2 (DuckDB, Go scrubbers): no lookarounds, no
    * backreferences — so one pattern string drives both the engine and
    * the oracle. Redaction is a chain of global regexp_replace calls
    * (left-to-right, email → phone → IPv4), pure codegen'd string ops.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+1-[0-9]{3}-[0-9]{4}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Replaces emails, +1-NNN-NNNN phone numbers, and IPv4 addresses with
    * typed placeholder tags. Email runs first so an address's domain dots
    * can never be half-eaten by the IPv4 pass.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Composite quality score in [0,1]:
    * 0.4·min(tokens/100, 1) + 0.3·(1 − stopwordRatio) + 0.3·distinctRatio.
    * Pure integer-derived arithmetic → bit-identical across engines.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast("double")
    val stopRatio = stopwordCount(text).cast("double") / n
    val distinctRatio = distinctTokenCount(text).cast("double") / n
    round(least(n / 100.0, lit(1.0)) * 0.4 +
      (lit(1.0) - stopRatio) * 0.3 + distinctRatio * 0.3, 6)
  }

  /** Token n-gram shingles (n consecutive tokens joined by one space),
    * distinct. `sequence` + `slice` keeps this inside codegen — no UDF.
    */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val cnt = size(toks) - (n - 1)
    // sequence(1, 0) would produce a DESCENDING sequence in Spark, so the
    // short-text case is handled explicitly with an empty array.
    array_distinct(
      when(cnt >= 1,
        transform(sequence(lit(1), cnt),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** Token n-gram shingles WITH duplicates (one entry per position) —
    * the multiset the repetition-filter statistics need, where
    * [[shingles]]'s distinct set would erase exactly the signal being
    * measured. n = 1 degenerates to the token array itself.
    */
  def shinglesWithDuplicates(text: Column, n: Int): Column = {
    val toks = tokens(text)
    if (n == 1) toks
    else {
      val cnt = size(toks) - (n - 1)
      when(cnt >= 1,
        transform(sequence(lit(1), cnt),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
    }
  }

  /** BPE-ish pre-tokenization pattern (GPT-2 style, merges elided): a
    * token is a letter run, a digit run, or a punctuation run. Counting
    * these pre-token pieces is the standard cheap proxy for "how many BPE
    * tokens will this cost" without shipping a merges table.
    */
  val BpeTokenPattern: String = "[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]+"

  /** Number of BPE-ish pre-tokens — `regexp_extract_all` is codegen'd and
    * the pattern is RE2/Java-compatible, so the DuckDB oracle counts the
    * identical pieces.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeTokenPattern), lit(0)))

  /** Fixed-window token chunking with overlap — the RAG / training-sample
    * prep step that splits each document into `window`-token pieces every
    * `stride` tokens (the final piece is shorter; overlap = window −
    * stride). Chunk starts are the 1-based positions 1, 1+stride, … ≤
    * n_tokens. Pure built-ins (sequence → transform → slice), fully
    * codegen'd and per-row: chunking 100 TB is map-only, no shuffle.
    * Returns array<struct<chunk_start, toks>>.
    */
  def chunks(text: Column, window: Int, stride: Int): Column = {
    require(window >= 1 && stride >= 1,
      s"window/stride must be >= 1, got $window/$stride")
    val toks = tokens(text)
    transform(sequence(lit(1), size(toks), lit(stride)),
      s => struct(s.cast("long").as("chunk_start"),
        slice(toks, s, lit(window)).as("toks")))
  }

  /** Distinct token n-gram shingles of one string — plain-Scala twin of
    * [[shingles]] for typed (Dataset) pipelines. Interpreted higher-order
    * functions are a trap in hot per-row stages: they run outside codegen,
    * and once several queries have exercised many Expression classes in
    * one JVM their eval() call sites go megamorphic — observed 15× slower
    * than this tight loop doing identical work. Tokenization matches
    * `split(text, " ", -1)` (empties kept), as the SQL oracles assume.
    */
  def shingleSetOf(text: String, n: Int): Array[String] = {
    val toks = text.split(" ", -1)
    val set = new java.util.LinkedHashSet[String]
    var i = 0
    while (i + n <= toks.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      set.add(sb.toString)
      i += 1
    }
    val out = new Array[String](set.size)
    set.toArray(out)
    out
  }

  /** Per-language marker profiles for the n-gram/stopword language-ID
    * heuristic. Deterministic, no model download; ties break in `Langs`
    * order.
    */
  private val Langs: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "a", "and", "of", "is", "to", "in", "that"),
    "fr" -> Set("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Set("el", "la", "y", "los", "las", "un", "una", "es"),
    "de" -> Set("der", "die", "das", "und", "ist", "ein", "eine", "nicht"),
    "zh" -> Set.empty, // CJK detected by codepoint range below
  )

  /** Language-ID over a raw string: CJK codepoint ratio first, then argmax
    * of per-language marker-token hit counts; 'und' when nothing matches.
    */
  def langIdOf(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val cjk = text.codePoints().filter(cp =>
      (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF))
      .count()
    if (cjk * 10 >= text.length) return "zh"
    val toks = text.toLowerCase.split("\\s+")
    val scores = Langs.map { case (l, markers) =>
      l -> toks.count(markers.contains)
    }
    val best = scores.maxBy(_._2)
    if (best._2 == 0) "und" else best._1
  }

  /** 64-bit rolling polynomial (Rabin-Karp) hash of a token sequence. */
  def rollingHash(toks: Seq[String]): Long = {
    var h = 1125899906842597L
    toks.foreach { t =>
      var th = 17L
      var i = 0
      while (i < t.length) { th = th * 31 + t.charAt(i); i += 1 }
      h = h * 1000003L + th
    }
    h
  }

  /** Winnowing-style document fingerprint: the minimum rolling hash over
    * all token n-gram windows (content-defined, deterministic; equal for
    * identical token streams, near-equal streams collide with high
    * probability on shared windows).
    */
  def fingerprintOf(text: String, n: Int): Long = {
    val toks = text.split(" ", -1)
    if (toks.length < n) return rollingHash(toks.toSeq)
    var min = Long.MaxValue
    var i = 0
    while (i + n <= toks.length) {
      val h = rollingHash(toks.slice(i, i + n).toSeq)
      if (h < min) min = h
      i += 1
    }
    min
  }
}
