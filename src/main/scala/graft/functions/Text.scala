package graft.functions

import org.apache.spark.sql.{Column, functions => F}

/** Text-analysis primitives for training-data pipelines (north-star
  * extension, BASELINE.json): tokenization, language ID, quality
  * scoring, token counting, fingerprinting.
  *
  * Everything is a pure Column expression over
  * `org.apache.spark.sql.functions` — codegen'd, shuffle-free,
  * linear-scan friendly at 100 TB. Hashes use md5 (bit-identical in
  * every engine) so results are portable to the DuckDB oracle; no
  * JVM-specific hashCode anywhere.
  */
object Text {

  /** Whitespace tokenizer (lower-cased). */
  def tokens(text: Column): Column = F.split(F.lower(text), "\\s+")

  def distinctTokens(text: Column): Column = F.array_distinct(tokens(text))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = F.size(tokens(text))

  /** BPE-ish sub-token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the usual pre-merge
    * word-piece segmentation shape). */
  def subTokenCount(text: Column): Column =
    F.size(F.regexp_extract_all(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), F.lit(0)))

  /** Word n-gram shingles over the whitespace tokens: the standard
    * unit for near-dup detection (MinHash/Jaccard over shingles sees
    * word ORDER, unlike bag-of-words). Texts shorter than n tokens
    * yield one whole-text shingle.
    *
    * Built as `arrays_zip` over n shifted slices of the token array,
    * NOT as `transform(sequence(...), i -> element_at(toks, i+o))`:
    * higher-order lambdas re-evaluate captured non-attribute
    * subtrees per element, so the element_at form re-runs the regex
    * split n times per shingle — O(words²) per row. The slice form
    * evaluates the split a constant number of times per row. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val cnt = F.size(toks)
    val zipped = F.arrays_zip(
      (0 until n).map(o => F.slice(toks, F.lit(o + 1), cnt - (n - 1))): _*)
    F.when(cnt >= n,
      F.transform(zipped, s =>
        F.concat_ws(" ", (0 until n).map(o => s.getField(o.toString)): _*)))
      .otherwise(F.array(F.array_join(toks, " ")))
  }

  def distinctShingles(text: Column, n: Int = 3): Column =
    F.array_distinct(shingles(text, n))

  /** Portable 60-bit hash: first 15 hex digits of md5, as a
    * non-negative long. Identical in any engine with md5 —
    * this is the backbone of MinHash/SimHash/fingerprints. */
  def hash60(c: Column): Column =
    F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Exact-content fingerprint: md5 of whitespace-normalized,
    * lower-cased text. */
  def fingerprint(text: Column): Column =
    F.md5(F.regexp_replace(F.trim(F.lower(text)), "\\s+", " "))

  /** Order-insensitive content fingerprint: md5 over the sorted
    * distinct token set (robust to shuffled word order). */
  def bagFingerprint(text: Column): Column =
    F.md5(F.array_join(F.array_sort(distinctTokens(text)), " "))

  // ---- PII-style masking ----

  /** Portable regexes (no lookaround — valid in both Java regex and
    * RE2, so the DuckDB oracle replays them verbatim). Whitespace is
    * an EXPLICIT class, not `\s`: Java's `\s` includes vertical tab
    * (\x0B) while RE2's does not, so `\s` would diverge between
    * engines on texts containing \x0B. URL first so an address inside
    * a URL is masked as [URL], not split by [EMAIL]. */
  private val wsClass = " \\t\\n\\x0B\\f\\r"
  val urlRe = s"https?://[^$wsClass]+"
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = s"\\+?[0-9][0-9()\\-$wsClass]{7,}[0-9]"

  /** Mask URLs, emails, and phone-shaped digit runs — the standard
    * pre-training redaction pass, as pure codegen'd Column work. */
  def redact(text: Column): Column =
    F.regexp_replace(
      F.regexp_replace(
        F.regexp_replace(text, urlRe, "[URL]"),
        emailRe, "[EMAIL]"),
      phoneRe, "[PHONE]")

  // ---- language ID (stopword heuristic) ----

  /** Tiny per-language stopword inventories. Deterministic, public
    * knowledge; good enough for a coarse n-gram/stopword router. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "it", "for", "on",
      "with", "as", "at", "by", "an", "be", "this", "that", "from", "or"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por",
      "los", "las", "del", "se", "con", "para", "su", "al", "lo", "como"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "mit", "von",
      "zu", "den", "im", "nicht", "auch", "auf", "es", "sich", "des", "dem", "bei"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "est", "un", "une", "du",
      "en", "que", "qui", "dans", "pour", "pas", "sur", "au", "plus", "par")
  )

  /** Number of distinct tokens of `text` found in `lang`'s list. */
  def stopwordHits(text: Column, lang: String): Column =
    F.size(F.array_intersect(distinctTokens(text),
      F.array(stopwords(lang).map(F.lit): _*)))

  /** Predicted language: argmax of stopword hits with a fixed
    * tie-break order (en > es > de > fr > und). "und" = undetermined
    * when nothing matched. */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, "en"); val es = stopwordHits(text, "es")
    val de = stopwordHits(text, "de"); val fr = stopwordHits(text, "fr")
    F.when(en === 0 && es === 0 && de === 0 && fr === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  // ---- quality scoring ----

  def charCount(text: Column): Column = F.length(text)

  def punctRatio(text: Column): Column =
    F.size(F.regexp_extract_all(text, F.lit("[^A-Za-z0-9\\s]"), F.lit(0)))
      .cast("double") / F.greatest(F.length(text).cast("double"), F.lit(1.0))

  def stopwordRatio(text: Column): Column =
    stopwordHits(text, "en").cast("double") /
      F.greatest(F.size(distinctTokens(text)).cast("double"), F.lit(1.0))

  def avgTokenLen(text: Column): Column =
    F.length(F.regexp_replace(F.lower(text), "\\s+", "")).cast("double") /
      F.greatest(tokenCount(text).cast("double"), F.lit(1.0))

  /** Composite quality score in [0,1]: long enough, not
    * punctuation-soup, has function words, sane word lengths. The
    * exact weights are pinned by the oracle SQL — change both or
    * neither. */
  def qualityScore(text: Column): Column = {
    val lenScore = F.least(F.length(text).cast("double") / 200.0, F.lit(1.0))
    val punctOk = F.lit(1.0) - F.least(punctRatio(text) * 5.0, F.lit(1.0))
    val stopOk = F.least(stopwordRatio(text) * 4.0, F.lit(1.0))
    val wordOk = F.when(avgTokenLen(text) >= 3.0 && avgTokenLen(text) <= 10.0, 1.0)
      .otherwise(0.5)
    (lenScore * 0.3) + (punctOk * 0.2) + (stopOk * 0.3) + (wordOk * 0.2)
  }
}
