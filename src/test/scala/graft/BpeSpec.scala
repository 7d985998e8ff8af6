package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Bpe
import graft.sources.Tables

/** BPE training semantics: greedy merge order, deterministic
  * tie-breaks, partition-independence. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("greedy merge: left-to-right non-overlapping, like the reference algorithm") {
    // byte-level symbols: a=61 b=62. 'aaa' with merge (61,61) ->
    // [6161, 61]; 'abab' -> [6162, 6162]
    val docs = Seq("aaa aaa abab").toDF("text")
    val (merges, words) = Bpe.train(docs, "text", 2)
    assert(merges.head.left == "61" && merges.head.right == "61")
    val syms = words.select(F.trim(F.col("symstr"))).as[String].collect()
      .map(_.split("  ").toSeq).toSet
    // after merge 1 (61,61): aaa -> [6161, 61]; abab -> [61, 62, 61,
    // 62] (no aa) — merge 2 then picks (61,62) from abab's two pairs
    assert(merges(1).left == "61" && merges(1).right == "62", merges(1))
    assert(syms.contains(Seq("6161", "61")), syms)
    assert(syms.contains(Seq("6162", "6162")), syms)
  }

  test("tie-break is (count desc, pair lexicographic asc)") {
    // 'ba'(62,61) and 'ac'(61,63) both have count 2; hex symbols
    // preserve byte order, so (61,63) < (62,61) lexicographically
    val docs = Seq("ba ba ac ac").toDF("text")
    val (merges, _) = Bpe.train(docs, "text", 1)
    assert(merges.head.left == "61" && merges.head.right == "63", merges.head)
  }

  test("byte-level alphabet: multi-byte characters split bytewise and merge back; nothing is dropped") {
    // é = c3 a9 (2 bytes), 世 = e4 b8 96 (3 bytes), '9!' mixes digit
    // and punctuation — none of these trained at all under the old
    // ^[a-z]+$ alphabet
    val docs = Seq("éé éé 世 9!").toDF("text")
    val (merges, words) = Bpe.train(docs, "text", 1)
    // most frequent pair is é's own byte pair — the merge reassembles
    // the character across what a char-level split could not even see
    assert(merges.head.left == "c3" && merges.head.right == "a9",
      merges.head)
    val vocab = Bpe.vocab(words).select("sym").as[String].collect().toSet
    assert(vocab.contains("c3a9"), vocab)
    // the CJK char's three byte symbols survive un-merged
    assert(Set("e4", "b8", "96").subsetOf(vocab), vocab)
    // digits/punctuation train too (9='39', !='21')
    assert(Set("39", "21").subsetOf(vocab), vocab)
    // merged symbols decode back to text
    val decoded = Seq("c3a9").toDF("sym")
      .select(Bpe.symbolText(F.col("sym"))).as[String].head()
    assert(decoded == "é", decoded)
  }

  test("merge sequence is identical across partitionings") {
    val docs = Tables.scan(spark, sf, "documents").select("text")
    val base = Bpe.train(docs, "text", 6)._1
    for (p <- Seq(1, 7)) {
      val got = Bpe.train(docs.repartition(p), "text", 6)._1
      assert(got == base, s"partitions=$p: $got vs $base")
    }
    assert(base.size == 6)
    // counts are non-increasing only per-pair availability, but every
    // round must carry a positive support
    assert(base.forall(_.pairCount > 0))
  }

  test("encode over the training corpus reproduces training's final word frame") {
    val docs = Tables.scan(spark, sf, "documents").select("text")
    val (merges, trained) = Bpe.train(docs, "text", 6)
    val encoded = Bpe.encodeWords(Bpe.wordTable(docs, "text"), merges)
    assert(encoded.select("symstr", "freq").collect().map(_.toSeq).toSet ==
      trained.select("symstr", "freq").collect().map(_.toSeq).toSet)
  }

  test("vocabulary conserves the corpus: sum of symbol frequencies equals total chars") {
    val docs = Tables.scan(spark, sf, "documents").select("text")
    val (_, words) = Bpe.train(docs, "text", 5)
    val vocabChars = Bpe.vocab(words)
      .select(F.sum(F.length(F.col("sym")) * F.col("n"))).as[Long].head()
    val corpusChars = Bpe.wordTable(docs, "text")
      .select(F.sum(F.length(F.regexp_replace(F.trim(F.col("symstr")), " ", ""))
        * F.col("freq"))).as[Long].head()
    assert(vocabChars == corpusChars)
  }
}
