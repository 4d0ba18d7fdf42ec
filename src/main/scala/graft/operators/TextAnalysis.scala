package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Expr, Hashing}

/** Text-analysis operators for LLM-data pipelines, over the `documents`
  * fixture (FIXTURES.md §A). All pure Catalyst expressions — per-row,
  * shuffle-free, embarrassingly parallel: the shape that scales linearly
  * to 100 TB because it is a single codegen'd projection over the scan.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased. ONE token definition shared by every
    * operator in this file and by Dedup (shingles/simhash): trim then
    * split on `\s+` — newlines/tabs/runs of spaces all count as one
    * separator, and the trim avoids leading/trailing empty tokens. The
    * DuckDB oracle uses the same definition
    * (`string_split_regex(trim(lower(text)), '\s+')`). */
  def tokens(text: Column): Column = split(trim(lower(text)), "\\s+")

  /** BPE-ish subword token estimate: words + punctuation marks counted
    * separately (a cheap, deterministic proxy for tokenizer counts). */
  def tokenEstimate(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      length(regexp_replace(text, "[^.,;:!?]", ""))

  /** BPE-ish subword tokenization via a GPT-2-style pretokenizer regex:
    * leading-space-attached letter runs, digit runs, and punctuation
    * runs as separate tokens. Deliberately lookahead-free so the same
    * pattern runs identically under Java regex (Spark) and RE2
    * (DuckDB oracle); alternatives are disjoint so engine preference
    * order cannot differ. */
  val BpePattern: String = " ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 ]+"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(BpePattern), lit(0))

  /** Token/char statistics. */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_tokens", size(tokens(col(textCol))))
    .withColumn("n_chars_m", length(col(textCol)))
    .withColumn("n_punct", length(regexp_replace(col(textCol), "[^.,;:!?]", "")))
    .withColumn("token_estimate", tokenEstimate(col(textCol)))

  /** Quality score in [0,1]: penalize extreme length, high punctuation
    * density, low alphabetic ratio, very short words. Integer counts +
    * one final double division, truncated with floor(x*1e6)/1e6 —
    * bit-reproducible in any engine (round() is boundary-sensitive). */
  def withQuality(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    def f6(c: org.apache.spark.sql.Column) = floor(c * lit(1000000L)) / lit(1000000.0)
    val nChars = length(t).cast("double")
    val nAlpha = length(regexp_replace(t, "[^a-zA-Z]", "")).cast("double")
    val nPunct = length(regexp_replace(t, "[^.,;:!?]", "")).cast("double")
    val nWords = size(split(trim(t), "\\s+")).cast("double")
    df.withColumn("alpha_ratio", f6(nAlpha / nChars))
      .withColumn("punct_ratio", f6(nPunct / nChars))
      .withColumn("avg_word_len", f6(nChars / nWords))
      .withColumn("quality_score", f6(
        least(lit(1.0), nWords / lit(20.0)) * (nAlpha / nChars)))
  }

  /** Function-word language-ID heuristic: score each candidate language
    * by counting tokens equal to one of its most frequent function
    * words; argmax wins, ties broken by language code order; all-zero
    * scores → "und". Stopword lists are tiny and public-knowledge. At
    * scale this is a per-row projection — no shuffle, no dictionary
    * join. Token-equality counting (size∘filter over the token array)
    * counts repeated adjacent words correctly, unlike remove-and-measure
    * on the raw string (overlapping separators undercount). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "et", "les", "de"),
    "es" -> Seq("el", "que", "los", "una", "y"),
    "de" -> Seq("der", "und", "die", "das", "ist"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  private def langScore(toks: Column, lang: String): Column =
    size(filter(toks,
      t => stopwords(lang).map(w => t === lit(w)).reduce(_ || _))).cast("long")

  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val langs = stopwords.keys.toSeq.sorted // tie-break: alphabetical code
    // one tokenization and one score array per row (let-bound):
    // score-as-columns would inline the split into every comparison via
    // CollapseProject, and filter() keeps this out of codegen/CSE
    val pred = Expr.let(tokens(col(textCol))) { tk =>
      Expr.let(array(langs.map(l => langScore(tk, l)): _*)) { arr =>
        when(array_max(arr) === 0, lit("und")).otherwise(
          langs.zipWithIndex.foldRight(lit("und"): Column) {
            case ((l, i), other) =>
              when(element_at(arr, i + 1) === array_max(arr), lit(l))
                .otherwise(other)
          })
      }
    }
    // NULL text → NULL prediction, not a fabricated "und" (the fold's
    // null comparisons would otherwise fall through to the default)
    df.withColumn("lang_pred",
      when(col(textCol).isNotNull, pred))
  }

  /** Within-document repetition (Gopher-style quality signal): the
    * fraction of word bigrams that are repeats of an earlier bigram in
    * the same doc. High values flag boilerplate/spam/generated loops.
    * Pure per-row projection — zero shuffle. `shingles` falls back to a
    * single whole-text shingle below 2 tokens, so n_bigrams ≥ 1 and the
    * division is total. */
  def withRepetition(df: DataFrame, textCol: String): DataFrame = {
    def f6(c: Column) = floor(c * lit(1000000L)) / lit(1000000.0)
    // NULL text must yield NULL stats, not a fabricated 0.0 dup_frac:
    // shingles' whole-text fallback turns a null doc into [null] (one
    // "bigram"), so guard explicitly
    val res = when(col(textCol).isNotNull,
      Expr.let(Dedup.shingles(col(textCol), 2)) { bg =>
        struct(
          size(bg).as("n"),
          size(array_distinct(bg)).as("d"))
      })
    df.withColumn("_rep", res)
      .withColumn("n_bigrams", col("_rep.n"))
      .withColumn("n_distinct_bigrams", col("_rep.d"))
      .withColumn("dup_frac", f6(
        (col("_rep.n") - col("_rep.d")).cast("double") /
          col("_rep.n").cast("double")))
      .drop("_rep")
  }

  /** PII redaction patterns — deliberately lookahead-free so they run
    * identically under Java regex (Spark) and RE2 (the DuckDB oracle).
    * A production pass would carry a larger battery (SSNs, IBANs,
    * addresses); the operator shape — count + replace in one
    * codegen'd projection — is the contract. */
  val EmailPattern: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val PhonePattern: String = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]+"

  /** Count and mask emails/phone numbers. Adds n_emails, n_phones and
    * `redacted` (the scrubbed text). Per-row projection, no shuffle. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_emails",
      size(regexp_extract_all(col(textCol), lit(EmailPattern), lit(0))))
    .withColumn("n_phones",
      size(regexp_extract_all(col(textCol), lit(PhonePattern), lit(0))))
    .withColumn("redacted",
      regexp_replace(
        regexp_replace(col(textCol), EmailPattern, "<EMAIL>"),
        PhonePattern, "<PHONE>"))

  /** Rolling polynomial fingerprint of the token stream:
    * fold(h = (h*31 + md5mod(token)) mod p). Order-sensitive (unlike a
    * set hash) so it fingerprints the document, not its vocabulary.
    * Expressed with the `aggregate` higher-order function — sequential
    * left fold, reproducible anywhere. */
  def fingerprint(text: Column): Column =
    aggregate(
      Dedup.shingleHashes(text, n = 1, mod = true),
      lit(0L),
      (h, x) => (h * lit(31L) + x) % lit(Hashing.SmallPrime))

  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", fingerprint(col(textCol)))
}
