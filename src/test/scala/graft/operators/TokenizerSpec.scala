package graft.operators

import graft.SparkSpec

class TokenizerSpec extends SparkSpec {

  test("bpeMerges: hand-computed merges on a toy corpus, rounds stop when no pairs remain") {
    import spark.implicits._
    // words: "aa" x3, "ab" x2
    val docs = Seq("aa ab aa", "ab aa").toDF("text")
    val out = Tokenizer.bpeMerges(spark, docs, rounds = 4).collect()
    // round 1: pair "a a" (weight 3) beats "a b" (2) -> merge "aa"
    // round 2: only "a b" remains -> merge "ab"
    // rounds 3/4: every word is a single symbol -> nothing to merge
    assert(out.length == 2)
    assert((out(0).getLong(0), out(0).getString(1), out(0).getString(2), out(0).getLong(3))
      == ((1L, "a a", "aa", 3L)))
    assert((out(1).getLong(0), out(1).getString(1), out(1).getString(2), out(1).getLong(3))
      == ((2L, "a b", "ab", 2L)))
  }

  test("bpeMerges tie-break is lexicographic on the pair") {
    import spark.implicits._
    // "ba" and "ab" both freq 1: pairs "b a" and "a b" tie at 1 -> "a b" wins
    val docs = Seq("ba ab").toDF("text")
    val out = Tokenizer.bpeMerges(spark, docs, rounds = 1).collect()
    assert(out.length == 1 && out(0).getString(1) == "a b")
  }

  test("merge application is leftmost non-overlapping (replace semantics)") {
    import spark.implicits._
    // word "aaaa" x2: round-1 pair "a a" counts 3 per word = 6.
    // replace(' a a ') consumes the shared sentinel space, so a run of
    // four merges only the FIRST pair per scan: ' a a a a ' ->
    // ' aa a a ' (the documented replace-semantics variant, identical
    // in both engines; classic greedy would merge twice).
    val docs = Seq("aaaa aaaa").toDF("text")
    val out = Tokenizer.bpeMerges(spark, docs, rounds = 3).collect()
    assert(out(0).getString(1) == "a a" && out(0).getLong(3) == 6L)
    // round 2: words are [aa, a, a]; 'a a' (2) ties 'aa a' (2),
    // lexicographic tie-break picks 'a a' -> ' aa aa '
    assert(out(1).getString(1) == "a a" && out(1).getLong(3) == 2L)
    // round 3: words are [aa, aa]
    assert(out(2).getString(1) == "aa aa" && out(2).getLong(3) == 2L)
  }

  test("bpe02: encoding counts replay the trained merges per document") {
    import spark.implicits._
    // training corpus: "aa" x3, "ab" x2 -> merges [a a -> aa, a b -> ab]
    // (first test's hand computation); after both merges every word is
    // ONE symbol, so n_bpe_tokens == n_tokens and fertility == 1.0
    val docs = Seq((1L, "aa ab aa"), (2L, "ab aa")).toDF("doc_id", "text")
    val out = Tokenizer.bpeEncode(spark, docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((3L, 3L, 1.0)))
    assert(out(2L) == ((2L, 2L, 1.0)))
    // untrained symbols stay split: with zero rounds, "aa" is 2 chars
    val raw = Tokenizer.bpeEncode(spark, docs, rounds = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(raw(1L) == 6L && raw(2L) == 4L) // every char its own symbol
  }
}
