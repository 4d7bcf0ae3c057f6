package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis column builders for the LLM-data-pipeline surface
  * (BASELINE.json north star): tokenization, quality scoring, language ID,
  * fingerprinting. All are pure Catalyst expression trees (higher-order
  * array functions — codegen-friendly, no UDFs), so they pipeline inside
  * whole-stage codegen over a 100 TB documents table with zero shuffle.
  */
object TextOps {

  /** Whitespace tokens, empties dropped (robust to double spaces). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= lit(""))

  /** BPE-ish subword segmentation: split on non-alphanumeric runs —
    * the cheap deterministic stand-in for a real BPE vocab. */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text))).cast(LongType)

  /** Non-space character count via literal `replace` — same value as the
    * regexp form but a plain memchr-style scan: the regex engine is the
    * whole cost of a per-row quality pass at corpus scale (measured 22s
    * vs <1s over 500k docs for the class-regex variant). */
  private def nonSpaceLen(text: Column): Column =
    length(replace(text, lit(" "), lit("")))

  /** Mean token length = non-space chars / token count (IEEE division of
    * exact ints — reproducible bit-for-bit across engines). */
  def avgTokenLen(text: Column): Column =
    nonSpaceLen(text).cast(DoubleType) /
      size(tokens(text)).cast(DoubleType)

  val StopWords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Fraction of tokens that are stopwords — the classic fluency signal. */
  def stopwordRatio(text: Column): Column = {
    val stops = array(StopWords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(stops, t))).cast(DoubleType) /
      size(tokens(text)).cast(DoubleType)
  }

  /** Fraction of non-space chars outside [a-z0-9] — punctuation/noise.
    * Membership in the literal char set is counted with `translate`
    * (delete the set, count what remains) instead of a negated-class
    * regexp_replace: identical values — both enumerate the same chars —
    * but a codegen'd char-map loop instead of the regex engine, which
    * measured 20× slower over a 500k-doc corpus and would dominate the
    * whole quality gate at scale. */
  def punctRatio(text: Column): Column = {
    val punct = length(translate(text,
      "abcdefghijklmnopqrstuvwxyz0123456789 ", ""))
    punct.cast(DoubleType) / nonSpaceLen(text).cast(DoubleType)
  }

  /** Composite quality score in [0,2]: stopword fluency + length band.
    * Pure +,*,CASE arithmetic (no transcendental fns → cross-engine exact). */
  def qualityScore(text: Column): Column =
    stopwordRatio(text) * lit(2.0) +
      when(tokenCount(text).between(20, 400), lit(1.0)).otherwise(lit(0.0)) -
      punctRatio(text)

  /** Language ID via character n-gram profile voting: score each candidate
    * language by how many of its signature character bigrams occur in the
    * text; argmax wins, 'und' when nothing matches. Deterministic, driver
    * supplies the profiles. This is the classic n-gram heuristic (à la
    * TextCat) reduced to an expression tree. */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("th", "he", "in", "er", "an"),
    "es" -> Seq("de", "la", "os", "en", "el"),
    "fr" -> Seq("le", "es", "on", "re", "nt"),
    "de" -> Seq("en", "er", "ch", "de", "ei"),
    "zh" -> Seq("zh", "sh", "ng", "ia", "uo"))

  def langScore(text: Column, grams: Seq[String]): Column =
    grams.map(g => when(text.contains(g), 1).otherwise(0)).reduce(_ + _)

  def langId(text: Column): Column = {
    // greatest score wins; ties broken by language code order (stable)
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, grams) =>
      struct(langScore(text, grams).as("s"), lit(lang).as("l"))
    }
    val best = greatest(scored: _*)
    when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und"))
  }

  /** Rolling polynomial fingerprint over character codes:
    * h = fold(h * 31 + code) mod 2^30. Order-sensitive (unlike a bag of
    * words) so it distinguishes permuted documents; bounded so 64-bit
    * arithmetic never overflows in any engine. */
  def fingerprint(text: Column, prefixLen: Int = 64): Column =
    aggregate(
      transform(
        filter(split(substring(text, 1, prefixLen), ""), ch => ch =!= lit("")),
        ch => ascii(ch)),
      lit(0L),
      (h, c) => pmod(h * lit(31L) + c.cast(LongType), lit(1073741824L)))
}
