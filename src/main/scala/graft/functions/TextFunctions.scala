package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, n-grams/shingles, quality scoring, language ID and
  * document fingerprinting. No reference counterpart (SURVEY.md §1.4
  * north-star mandate).
  *
  * Everything is built from `org.apache.spark.sql.functions` —
  * higher-order array functions and hash expressions, all codegen'd;
  * no UDFs, no driver-side loops, no shuffle. Each helper is a pure
  * `Column => Column`, so Catalyst can pipeline them inside one
  * whole-stage-codegen span over a 100 TB scan.
  */
object TextFunctions {

  /** Lowercased whitespace tokens, empty strings dropped (leading
    * whitespace would otherwise produce one). Implemented by the
    * imperative [[SketchExpressions.Tokenize]] kernel — output is
    * identical to `filter(split(lower(trim(text)), "\s+"), _ =!= "")`
    * but one pass instead of an interpreted HOF chain (~10× on the
    * documents fixture). */
  def tokens(text: Column): Column = SketchExpressions.tokenize(text)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Contiguous k-word shingles (space-joined). Documents shorter than
    * k words contribute their whole token string as one shingle so
    * they still participate in similarity. */
  def wordShingles(text: Column, k: Int): Column = {
    val ts = tokens(text)
    when(size(ts) >= k,
      array_distinct(transform(sequence(lit(0), size(ts) - k),
        i => array_join(slice(ts, i + 1, lit(k)), " "))))
      .otherwise(array(array_join(ts, " ")))
  }

  /** Character n-grams of the lowercased text (whitespace collapsed),
    * distinct. */
  def charNGrams(text: Column, n: Int): Column = {
    val t = regexp_replace(lower(trim(text)), "\\s+", " ")
    when(length(t) >= n,
      array_distinct(transform(sequence(lit(0), length(t) - n),
        i => t.substr(i + 1, lit(n)))))
      .otherwise(array(t))
  }

  // Tiny per-language function-word lists (public-knowledge stopwords)
  // for the n-gram/stopword language-ID heuristic. Ordered Seq: the
  // fold below breaks score ties by list order, deterministically.
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "it", "for", "on", "with", "as", "this"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por", "con", "para", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine", "zu", "im", "auf", "nicht"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une", "dans", "que", "pour", "sur", "avec"))

  private val stopwordMap: Map[String, Seq[String]] = stopwords.toMap

  def stopwordRatio(text: Column, lang: String = "en"): Column = {
    val ts = tokens(text)
    val sw = typedlit(stopwordMap(lang))
    when(size(ts) > 0,
      size(filter(ts, t => array_contains(sw, t))).cast("double") / size(ts))
      .otherwise(lit(0.0))
  }

  /** Share of CJK codepoints — the zh detector (stopword lists don't
    * apply to unsegmented text). */
  def cjkRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")))
        .cast("double") / length(text))
      .otherwise(lit(0.0))

  /** Heuristic language ID over {en, es, de, fr, zh}: CJK share first,
    * then the language whose function-word list overlaps the token
    * stream most. Pure expressions — one pass, no shuffle. */
  def langId(text: Column): Column = {
    val scores = stopwords.map { case (l, _) => l -> stopwordRatio(text, l) }
    val best = greatest(scores.map(_._2): _*)
    // Reverse fold: earlier-listed languages win exact ties.
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === best && s > 0.0, lit(l)).otherwise(acc)
    }
    when(cjkRatio(text) > 0.05, lit("zh")).otherwise(pick)
  }

  /** Composite quality score in [0,1]: length sweet-spot, moderate
    * punctuation, function-word presence, bounded mean word length.
    * Deterministic, documented formula — the point is the shape (a
    * cheap expression-only filter stage before expensive dedup), not
    * the exact weights. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTok = size(tokens(text)).cast("double")
    val punct = length(regexp_replace(text, "[^.!?,;:]", "")).cast("double")
    val punctRatio = when(nChars > 0, punct / nChars).otherwise(lit(0.0))
    val meanWordLen = when(nTok > 0, nChars / nTok).otherwise(lit(0.0))
    val lenScore = least(nChars / 200.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * 10.0, lit(1.0))
    val swScore = least(greatest(stopwordRatio(text), cjkRatio(text)) * 5.0, lit(1.0))
    val wordLenScore = when(meanWordLen.between(2.0, 12.0), 1.0).otherwise(0.3)
    // quantize4, not round(_, 4): the score is oracle-compared and
    // round() is not portable across engines (see Quantize).
    Quantize.quantize4(lenScore * 0.3 + punctScore * 0.2 + swScore * 0.3 + wordLenScore * 0.2)
  }

  /** Order-sensitive 64-bit document fingerprint: a rolling hash
    * chain over the token stream, `acc' = xxhash64(acc, token)`.
    * Same token sequence ⇒ same fingerprint; any reorder/edit ⇒
    * different — the cheap exact-ish identity for archive-level
    * dedup. (Hash-chaining instead of the classic `acc*31 + h`
    * polynomial: ANSI mode makes wrapping multiplication throw.) */
  def fingerprint64(text: Column): Column =
    aggregate(tokens(text), lit(-3750763034362895579L), // FNV-1a offset basis
      (acc, t) => xxhash64(acc, t))

  /** Portable order-sensitive fingerprint: md5 of the normalized
    * (lowercased, whitespace-collapsed) token stream. Same identity
    * semantics as [[fingerprint64]] but reproducible by any engine
    * with md5 — this is the oracle-checkable variant. */
  def fingerprintMd5(text: Column): Column =
    md5(array_join(tokens(text), " "))

  /** 64-bit portable rolling fingerprint — the numeric twin of
    * [[fingerprintMd5]]: the mix-chain of the tokens' portable hashes
    * (see [[SketchExpressions.PortableFingerprint64]]), recomputable
    * step-by-step in external SQL engines. Prefer this over
    * [[fingerprint64]] when the fingerprint must be verifiable
    * outside Spark. */
  def fingerprintPortable64(text: Column): Column =
    SketchExpressions.portableFingerprint64(tokens(text))
}
