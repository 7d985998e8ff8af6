package graft

import org.apache.spark.sql.{functions => F}

import graft.operators.Bpe
import graft.sources.Tables

/** BPE training semantics: greedy merge order, deterministic
  * tie-breaks, partition-independence. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("greedy merge: left-to-right non-overlapping, like the reference algorithm") {
    // 'aaa' with merge (a,a) -> [aa, a]; 'abab' -> [ab, ab]
    val docs = Seq("aaa aaa abab").toDF("text")
    val (merges, words) = Bpe.train(docs, "text", 2)
    assert(merges.head.left == "a" && merges.head.right == "a")
    val syms = words.select(F.trim(F.col("symstr"))).as[String].collect()
      .map(_.split("  ").toSeq).toSet
    // after merge 1 (a,a): aaa -> [aa, a]; abab -> [a, b, a, b] (no aa)
    // merge 2 then picks (a,b) from abab's two pairs
    assert(merges(1).left == "a" && merges(1).right == "b", merges(1))
    assert(syms.contains(Seq("aa", "a")), syms)
    assert(syms.contains(Seq("ab", "ab")), syms)
  }

  test("tie-break is (count desc, pair lexicographic asc)") {
    // 'ba' and 'ac' both have count 2; (a,c) < (b,a) lexicographically
    val docs = Seq("ba ba ac ac").toDF("text")
    val (merges, _) = Bpe.train(docs, "text", 1)
    assert(merges.head.left == "a" && merges.head.right == "c", merges.head)
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
