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

  /** PII patterns for training-corpus scrubbing (the published
    * pretraining pipelines all carry this stage). Deliberately kept to
    * the RE2-compatible regex subset — no lookaround, no backrefs —
    * so an external engine (the DuckDB oracle, or a CCNet/Dolma-style
    * re-implementation) recognizes exactly the same spans. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private[graft] val Ipv4Re  = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Text with emails/phones/IPv4s replaced by typed placeholder
    * tags. Three chained codegen'd `regexp_replace`s — order is
    * email → phone → IP so a placeholder never creates a new match
    * (tags contain no digits or `@`). Pure per-row expression: no
    * shuffle, pipelines inside the scan's codegen span. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Per-category PII match counts over the ORIGINAL text (audit
    * metric for the scrub stage): (n_emails, n_phones, n_ips). */
  def piiCounts(text: Column): (Column, Column, Column) = (
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(PhoneRe), lit(0))).cast("long"),
    size(regexp_extract_all(text, lit(Ipv4Re), lit(0))).cast("long"))

  /** All http(s) URLs in the text, as an array column. The character
    * class stops at whitespace and quote-like characters, the same
    * boundary the common-crawl extractors use; RE2-compatible (and
    * SQL-string-safe) for the same reason as the PII patterns. */
  private[graft] val UrlRe = "https?://[A-Za-z0-9._~:/?#@!$&*+,;=%-]+"
  def urls(text: Column): Column = regexp_extract_all(text, lit(UrlRe), lit(0))

  /** Host part of one URL (`https://host/path` → `host`), the join
    * key for domain-blocklist filtering. */
  def urlDomain(url: Column): Column =
    regexp_extract(url, "^https?://([^/?#]+)", 1)

  /** 64-bit portable rolling fingerprint — the numeric twin of
    * [[fingerprintMd5]]: the mix-chain of the tokens' portable hashes
    * (see [[SketchExpressions.PortableFingerprint64]]), recomputable
    * step-by-step in external SQL engines. Prefer this over
    * [[fingerprint64]] when the fingerprint must be verifiable
    * outside Spark. */
  def fingerprintPortable64(text: Column): Column =
    SketchExpressions.portableFingerprint64(tokens(text))
}
