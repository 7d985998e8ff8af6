package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, functions => F}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.functions.Text

/** Distributed BPE tokenizer training — the canonical LLM-data
  * computation: iterative most-frequent-pair counting and merging
  * over the corpus.
  *
  * Scale design: merges operate on the DISTINCT-WORD frequency table,
  * never the corpus. The corpus is scanned exactly once (tokenize +
  * count); every merge round then runs over |vocab| rows — bounded by
  * distinct words (maybe 10^7 at 100 TB), not by corpus size, and
  * each round is one map-side pair explode + one grouped sum whose
  * result (distinct adjacent pairs) is small enough that the max-pair
  * pick ships ONE row to the driver. The driver loop + per-round
  * `localCheckpoint` pin is the same pattern as
  * [[Dedup.dupComponents]]: lineage is truncated every round, so
  * round N's plan never replays rounds 1..N-1.
  *
  * Determinism (so any engine can replay the merge sequence):
  *  - tie-break = pair count DESC, then (left, right) lexicographic
  *    ASC — no partition-order dependence;
  *  - pair counts are exact long sums;
  *  - a word's symbol sequence is a DOUBLE-space-delimited string
  *    with single leading/trailing spaces (" 6c  6f  77 "). Merging
  *    pair (l, r) is then a plain `replace(symstr, " l  r ", " lr ")`:
  *    left-to-right non-overlapping replacement IS greedy BPE merge
  *    order, the double-space separator makes the pattern
  *    boundary-safe without lookarounds (a match consumes one space
  *    from each side's separator, leaving the neighbor's boundary
  *    intact), and `replace` behaves identically in Spark and DuckDB.
  *
  * BYTE-LEVEL alphabet: the base symbols are a token's UTF-8 BYTES,
  * rendered as lowercase hex pairs ("low" → " 6c  6f  77 ", "é" →
  * " c3  a9 ") — the alphabet real tokenizers (GPT-2/tiktoken
  * lineage) train over. Every token trains — no script, case, or
  * punctuation is dropped — and multi-byte characters participate
  * bytewise, so merges can form within AND across character
  * boundaries. Hex-pair symbols keep the whole pipeline in the
  * engine-portable string domain: char-splitting a hex string is the
  * same trivial `(..)` regex everywhere (no grapheme edge cases
  * between Java regex and DuckDB's RE2), and merged symbols
  * concatenate to longer hex strings that [[symbolText]] decodes
  * back to UTF-8 for display.
  */
object Bpe {

  final case class Merge(round: Int, left: String, right: String,
                         pairCount: Long)

  /** A token column rendered as its byte-level symbol string:
    * lowercase hex pairs of the UTF-8 bytes, double-space-delimited,
    * space-wrapped (" 6c  6f  77 "). */
  def byteSymstr(w: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.concat(F.lit(" "),
      F.trim(F.regexp_replace(
        F.lower(F.hex(F.encode(w, "UTF-8"))), "(..)", "$1  ")),
      F.lit(" "))

  /** Decode a (possibly merged) hex symbol back to its UTF-8 text —
    * display/debug only; may be a partial character for symbols that
    * split a multi-byte sequence. */
  def symbolText(sym: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    F.decode(F.unhex(sym), "UTF-8")

  /** The (symstr, freq) word table the merge loop starts from. */
  def wordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(F.explode(Text.tokens(F.col(textCol))).as("w"))
      .filter(F.col("w") =!= "")
      .groupBy("w").agg(F.count(F.lit(1)).as("freq"))
      .select(byteSymstr(F.col("w")).as("symstr"), F.col("freq"))

  /** Adjacent-pair frequency table of a word frame — one grouped sum,
    * pairs exploded map-side. Words of a single symbol contribute no
    * pairs (the size guard also keeps `sequence` ascending — Spark's
    * sequence(0, -1) would yield a DESCENDING range, not an empty
    * one). */
  def pairCounts(words: DataFrame): DataFrame =
    words.select(F.col("freq"),
        F.split(F.trim(F.col("symstr")), "  ").as("syms"))
      .filter(F.size(F.col("syms")) >= 2)
      .select(F.col("freq"), F.explode(F.expr(
        "transform(sequence(0, size(syms)-2), " +
          "i -> struct(syms[i] AS l, syms[i+1] AS r))")).as("p"))
      .groupBy(F.col("p.l").as("l"), F.col("p.r").as("r"))
      .agg(F.sum("freq").as("cnt"))

  /** Run `nMerges` rounds; returns the merge sequence and the final
    * word frame (symstr rewritten through every merge). Stops early
    * if the corpus runs out of adjacent pairs. */
  def train(docs: DataFrame, textCol: String,
            nMerges: Int): (Seq[Merge], DataFrame) = {
    var words = wordTable(docs, textCol).localCheckpoint(eager = true)
    val merges = ArrayBuffer.empty[Merge]
    var round = 1
    var exhausted = false
    while (round <= nMerges && !exhausted) {
      val top = pairCounts(words)
        .orderBy(F.col("cnt").desc, F.col("l").asc, F.col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (top(0).getString(0), top(0).getString(1),
          top(0).getLong(2))
        merges += Merge(round, l, r, cnt)
        // previous rounds' checkpoint blocks are reclaimed by the
        // ContextCleaner once unreferenced (see dupComponents)
        words = words.select(
            F.replace(F.col("symstr"),
              F.lit(s" $l  $r "), F.lit(s" $l$r ")).as("symstr"),
            F.col("freq"))
          .localCheckpoint(eager = true)
        round += 1
      }
    }
    (merges.toSeq, words)
  }

  /** ENCODE with a trained merge list: apply the merges in training
    * order to a word frame and return (symstr, freq) with every word
    * segmented into final subwords. Pure column work — `merges` is a
    * driver-side list (the tokenizer model, kilobytes), each merge is
    * one string replace, and the 12-deep replace chain stays inside
    * whole-stage codegen; the corpus-scale frame is never collected.
    * Applying to the SAME corpus that trained reproduces train's
    * final word frame exactly (BpeSpec pins it). */
  def encodeWords(words: DataFrame, merges: Seq[Merge]): DataFrame =
    merges.foldLeft(words) { (df, m) =>
      df.withColumn("symstr",
        F.replace(F.col("symstr"),
          F.lit(s" ${m.left}  ${m.right} "),
          F.lit(s" ${m.left}${m.right} ")))
    }

  /** Per-document subword counts under a trained merge list — the
    * encode step's corpus-level product (sequence-length planning,
    * token-budget accounting). Each DISTINCT word is segmented once
    * (the word table is the unit of work, as in training); documents
    * then join their words to the per-word subword count — the join
    * key is the word string, the corpus never re-segments. */
  def encodeCounts(docs: DataFrame, idCol: String, textCol: String,
                   merges: Seq[Merge]): DataFrame = {
    // ONE corpus scan: the (doc, word) multiplicity frame is pinned
    // and feeds both the distinct-word segmentation and the per-doc
    // rollup — without the pin the tokenize/explode lineage would
    // execute once per consumer (the single-scan discipline bm25
    // enforces the same way)
    val wc = docs
      .select(F.col(idCol), F.explode(Text.tokens(F.col(textCol))).as("w"))
      .filter(F.col("w") =!= "")
      .groupBy(idCol, "w").agg(F.count(F.lit(1)).as("n"))
      .localCheckpoint(eager = true)
    val segmented = encodeWords(
      wc.groupBy("w").agg(F.sum("n").as("freq"))
        .select(byteSymstr(F.col("w")).as("symstr"),
          F.col("w"), F.col("freq")),
      merges)
      .select(F.col("w"),
        F.size(F.split(F.trim(F.col("symstr")), "  ")).cast("long")
          .as("n_subwords"))
    wc.join(segmented, "w")
      .groupBy(idCol)
      .agg(F.sum("n").as("n_words"),
        F.sum(F.col("n") * F.col("n_subwords")).as("n_subwords"))
  }

  /** Per-occurrence symbol frequencies of a word frame — the final
    * vocabulary report. */
  def vocab(words: DataFrame): DataFrame =
    words.select(F.col("freq"),
        F.explode(F.split(F.trim(F.col("symstr")), "  ")).as("sym"))
      .groupBy("sym").agg(F.sum("freq").as("n"))

  /** Graded shape: merge rows (kind='merge', seq=round, a=left,
    * b=right, n=pair count) followed by the final vocabulary
    * (kind='vocab', seq=0, a=symbol, b=NULL, n=total frequency). */
  def trainReport(docs: DataFrame, textCol: String,
                  nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    val (merges, words) = train(docs, textCol, nMerges)
    val schema = StructType(Seq(
      StructField("kind", StringType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("a", StringType, nullable = true),
      StructField("b", StringType, nullable = true),
      StructField("n", LongType, nullable = false)))
    // LocalRelation, not parallelize: driver-local merge rows embed in
    // the plan (no RDD closure to clean, no extra single-task stage)
    val mergeRows = spark.createDataFrame(
      java.util.Arrays.asList(merges.map(m =>
        Row("merge", m.round.toLong, m.left, m.right, m.pairCount)): _*),
      schema)
    mergeRows.unionByName(vocab(words).select(
      F.lit("vocab").as("kind"), F.lit(0L).as("seq"),
      F.col("sym").as("a"), F.lit(null).cast("string").as("b"),
      F.col("n")))
  }
}
