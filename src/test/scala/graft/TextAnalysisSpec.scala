package graft

import graft.operators.TextAnalysis

/** Tokenization/lang-ID/fingerprint behavior, including the round-1
  * findings: \s+ unification and the repeated-adjacent-word count. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: newlines/tabs/runs of spaces are one separator") {
    val df = Seq("A  b\tc\nd ").toDF("text")
      .select(TextAnalysis.tokens($"text").as("t"))
    assert(df.first().getSeq[String](0) === Seq("a", "b", "c", "d"))
  }

  test("n_tokens and nWords agree on messy whitespace") {
    val df = Seq(("x", "one  two\tthree\nfour")).toDF("doc_id", "text")
    val stats = TextAnalysis.withTokenStats(df, "text").first()
    assert(stats.getAs[Int]("n_tokens") === 4)
    val q = TextAnalysis.withQuality(df, "text").first()
    // avg_word_len = chars/words with the same word count (4)
    assert(q.getAs[Double]("avg_word_len") === 19.0 / 4.0)
  }

  test("lang-ID counts repeated adjacent function words correctly") {
    // round-1 bug: remove-and-measure missed every second adjacent match
    val df = Seq((1L, "the the the le la et")).toDF("doc_id", "text")
    val out = TextAnalysis.withLangId(df, "text").first()
    // en score 3 (three 'the') beats fr score 3? 'le','la','et' = 3 too;
    // tie broken alphabetically: en before fr
    assert(out.getAs[String]("lang_pred") === "en")
  }

  test("lang-ID returns 'und' when no stopword matches") {
    val df = Seq((1L, "xyzzy plugh quux")).toDF("doc_id", "text")
    assert(TextAnalysis.withLangId(df, "text")
      .first().getAs[String]("lang_pred") === "und")
  }

  test("bpe tokens: space-attached words, digit runs, punct runs") {
    val df = Seq("Hello world, 42 times!").toDF("text")
      .select(TextAnalysis.bpeTokens($"text").as("t"))
    assert(df.first().getSeq[String](0) ===
      Seq("Hello", " world", ",", " 42", " times", "!"))
  }

  test("fingerprint is order-sensitive (documents, not vocabularies)") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"))
      .toDF("doc_id", "text")
    val fps = TextAnalysis.withFingerprint(df, "text")
      .orderBy("doc_id").select("fingerprint").as[Long].collect()
    assert(fps(0) !== fps(1))
  }

  test("NULL text flows through every text operator as NULL — no " +
    "crash, no fabricated zero stats (production corpora have nulls " +
    "even though the fixture doesn't)") {
    import graft.operators.Dedup
    val df = Seq((1L, Option("alpha beta gamma two three")),
      (2L, Option.empty[String])).toDF("doc_id", "text")
    val out = TextAnalysis.withFingerprint(
      TextAnalysis.withLangId(
        TextAnalysis.withRepetition(
          TextAnalysis.withQuality(
            TextAnalysis.withTokenStats(df, "text"), "text"), "text"),
        "text"), "text")
      .withColumn("mh", Dedup.minhashSignature($"text", 3, 8))
      .withColumn("sh", Dedup.simhash($"text"))
      .orderBy("doc_id").collect()
    val nullRow = out(1)
    for (c <- Seq("n_tokens", "quality_score", "dup_frac", "lang_pred",
      "fingerprint", "mh", "sh"))
      assert(nullRow.isNullAt(nullRow.fieldIndex(c)), c)
    val okRow = out(0)
    assert(!okRow.isNullAt(okRow.fieldIndex("n_tokens")))
    // redactPii: null text → null counts + null redacted
    val red = TextAnalysis.redactPii(df, "text").orderBy("doc_id").collect()
    assert(red(1).isNullAt(red(1).fieldIndex("n_emails")))
    assert(red(1).isNullAt(red(1).fieldIndex("redacted")))
    assert(!red(0).isNullAt(red(0).fieldIndex("n_emails")))
  }
}
