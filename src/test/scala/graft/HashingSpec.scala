package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** The native Md5Long60 expression must be bit-identical to its
  * built-in specification chain (which is also what the DuckDB oracle
  * recomputes). */
class HashingSpec extends SparkSpec {
  import spark.implicits._

  test("md5Long == conv(substring(md5, 1, 15), 16, 10) on varied inputs") {
    val samples = Seq("", "a", "hello world", "日本語テキスト",
      "with\nnewline\tand tab", "0", "ÿ" * 100,
      (1 to 500).map(i => s"w$i").mkString(" "))
    val df = samples.toDF("s").select(
      Hashing.md5Long($"s").as("native"),
      Hashing.md5LongBuiltin($"s").as("builtin"))
    df.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("md5Long: null in, null out; codegen'd projection works") {
    // file-backed scan so the optimizer cannot constant-fold the whole
    // projection into a LocalTableScan (which would bypass doGenCode)
    val dir = java.nio.file.Files.createTempDirectory("hash-parquet")
    dir.toFile.deleteOnExit()
    Seq(Some("x"), None).toDF("s").write.mode("overwrite")
      .parquet(dir.toString)
    val df = spark.read.parquet(dir.toString)
      .select(Hashing.md5Long($"s").as("h"))
    assert(df.queryExecution.executedPlan.toString.contains("md5long60"))
    val rows = df.orderBy($"h".asc_nulls_last).collect()
    assert(!rows(0).isNullAt(0))
    assert(rows(1).isNullAt(0))
  }

  test("SignLshBuckets == higher-order formulation, float and double") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val floatCmp = emb.select(
      Similarity.lshBuckets($"embedding", 64, 6, 16).as("native"),
      Similarity.lshBucketsHof($"embedding", 64, 6, 16).as("hof"))
    floatCmp.collect().foreach(r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    val dbl = emb.select(transform($"embedding",
      x => x.cast("double") * 1.5).as("v"))
    val doubleCmp = dbl.select(
      Similarity.lshBuckets($"v", 64, 8, 8).as("native"),
      Similarity.lshBucketsHof($"v", 64, 8, 8).as("hof"))
    doubleCmp.collect().foreach(r =>
      assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("CosineSim == higher-order formulation, float/double/mixed, bit-exact") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val pairs = emb.select($"embedding".as("a"),
      transform($"embedding", x => x.cast("double") * 1.5).as("b"))
    val cmp = pairs.select(
      Similarity.cosine($"a", $"a").as("n_ff"),
      Similarity.cosineHof($"a", $"a").as("h_ff"),
      Similarity.cosine($"a", $"b").as("n_fd"),
      Similarity.cosineHof($"a", $"b").as("h_fd"),
      Similarity.cosine($"b", $"b").as("n_dd"),
      Similarity.cosineHof($"b", $"b").as("h_dd"))
    cmp.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(5)))
    }
  }

  test("DotProd with hoisted norms == CosineSim, bit-exact (the q200 " +
    "all-pairs decomposition: dot/(norm_a·norm_b) reuses every fold)") {
    import graft.operators.Similarity
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val pairs = emb.select($"embedding".as("a"),
      transform($"embedding", x => x.cast("double") * 1.5).as("b"))
    val cmp = pairs.select(
      Similarity.cosine($"a", $"b").as("whole"),
      (Similarity.dotNative($"a", $"b") /
        (Similarity.norm($"a") * Similarity.norm($"b"))).as("split"))
    cmp.collect().foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // null element / length mismatch null out, matching CosineSim
    val edge = Seq(1).toDF("x").select(
      array(lit(1.0f), lit(null).cast("float")).as("withNull"),
      array(lit(1.0f), lit(2.0f)).as("clean"),
      array(lit(1.0f)).as("shorter"))
    val e = edge.select(
      Similarity.dotNative($"withNull", $"clean").as("n1"),
      Similarity.dotNative($"clean", $"shorter").as("n2"),
      Similarity.dotNative($"clean", $"clean").as("ok")).collect().head
    assert(e.isNullAt(0) && e.isNullAt(1) && e.getDouble(2) === 5.0)
  }

  test("MinHashSignature == higher-order formulation on fixture + edges") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").limit(200)
    val cmp = docs.select(
      Dedup.minhashSignature($"text", 3, 16).as("native"),
      Dedup.minhashSignatureHof($"text", 3, 16).as("hof"))
    cmp.collect().foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
    val edge = Seq("", "one two").toDF("text").select(
      Dedup.minhashSignature($"text", 3, 8).as("native"),
      Dedup.minhashSignatureHof($"text", 3, 8).as("hof"))
    edge.collect().foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("DotScores == higher-order formulation, float and double vectors") {
    import graft.operators.Similarity
    val cents = (0 until 16).map(i =>
      (0 until 64).map(j => Similarity.planeComponent(i, j)))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(100)
    val native = org.apache.spark.sql.GraftSql.column(
      graft.functions.DotScores(
        org.apache.spark.sql.GraftSql.expression($"embedding"), cents))
    val cmp = emb.select(native.as("n"),
      Similarity.scoreArrCentHof(cents)($"embedding").as("h"))
    cmp.collect().foreach { r =>
      val (n, h) = (r.getSeq[Double](0), r.getSeq[Double](1))
      n.zip(h).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a) ===
          java.lang.Double.doubleToLongBits(b))
      }
    }
  }

  test("SimHashBits == higher-order formulation on fixture documents") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text").limit(200)
    val cmp = docs.select(Dedup.simhash($"text").as("native"),
      Dedup.simhashHof($"text").as("hof"))
    cmp.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // edge: empty text (zero tokens after split) must agree too
    val edge = Seq("", "   ", "one").toDF("text")
      .select(Dedup.simhash($"text").as("native"),
        Dedup.simhashHof($"text").as("hof"))
    edge.collect().foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("ShingleHashes == transform(shingles, md5Mod) on fixture + edges") {
    import graft.operators.Dedup
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"text")
      .unionByName(Seq("one", "a b", "  padded  ", "Tab\there",
        "exactly three word doc").toDF("text"))
    for ((n, mod) <- Seq((3, true), (2, true), (1, true), (1, false))) {
      val hof =
        if (mod) transform(Dedup.shingles($"text", n),
          s => graft.functions.Hashing.md5Mod(s))
        else transform(Dedup.shingles($"text", n),
          s => graft.functions.Hashing.md5Long(s))
      val cmp = docs.select(
        Dedup.shingleHashes($"text", n, mod).as("native"), hof.as("spec"))
      cmp.collect().foreach(r =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1), s"n=$n mod=$mod"))
    }
  }

  test("GraftFunctions: the SQL surface (graft_md5long / graft_zorder " +
    "/ graft_cosine) resolves and matches the Scala API bit-for-bit") {
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_md5long('abc') AS h, graft_zorder(5, 9) AS z, " +
        "graft_cosine(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS c").head()
    val e = spark.range(1).select(
      Hashing.md5Long(lit("abc")).as("h"),
      graft.operators.Layout.zorder(lit(5), lit(9)).as("z")).head()
    assert(r.getLong(0) === e.getLong(0))
    assert(r.getLong(1) === e.getLong(1))
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-15)
  }

  test("CosineSim / DotScores: a NULL vector element nulls the fold, " +
    "matching the HOF spec (null product nulls the left fold)") {
    import graft.operators.Similarity
    val df = Seq(1).toDF("x").select(
      array(lit(1.0), lit(null).cast("double"), lit(3.0)).as("withNull"),
      array(lit(1.0), lit(2.0), lit(3.0)).as("clean"))
    val r = df.select(
      Similarity.cosine($"withNull", $"clean").as("n1"),
      Similarity.cosineHof($"withNull", $"clean").as("h1"),
      Similarity.cosine($"clean", $"withNull").as("n2"),
      Similarity.cosineHof($"clean", $"withNull").as("h2"),
      Similarity.cosine($"clean", $"clean").as("n3")).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
    assert(!r.isNullAt(4)) // the clean pair still scores
    val cents = Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val native = org.apache.spark.sql.GraftSql.column(
      graft.functions.DotScores(
        org.apache.spark.sql.GraftSql.expression($"withNull"), cents))
    val r2 = df.select(native.as("n"),
      Similarity.scoreArrCentHof(cents)($"withNull").as("h")).collect().head
    val (n, h) = (r2.getSeq[Any](0), r2.getSeq[Any](1))
    assert(n.length === cents.length && n === h)
    assert(n.forall(_ == null))
  }

  test("damerau_levenshtein: full-DL semantics pinned to the oracle engine") {
    import graft.functions.DamerauLevenshtein
    import org.apache.spark.unsafe.types.UTF8String
    // values produced by DuckDB damerau_levenshtein() (the q189 oracle);
    // 'CA'→'ABC'=2 is the full-DL-vs-OSA discriminator (OSA says 3)
    val pinned = Seq(
      ("CA", "ABC", 2), ("ab", "ba", 1), ("aX", "Xa", 1),
      ("abcdef", "abcfed", 2), ("kitten", "sitting", 3),
      ("", "abc", 3), ("abc", "", 3), ("same", "same", 0),
      ("Supplier#000000012", "Supplier#000000021", 1),
      ("Supplier#000000012", "Supplier#000000013", 1))
    for ((a, b, d) <- pinned) {
      assert(DamerauLevenshtein.compute(
        UTF8String.fromString(a), UTF8String.fromString(b)) === d,
        s"kernel($a, $b)")
      // symmetry — edit distance is a metric
      assert(DamerauLevenshtein.compute(
        UTF8String.fromString(b), UTF8String.fromString(a)) === d)
    }
    // the codegen'd column path agrees with the kernel (and with SQL
    // via the registered graft_damerau)
    graft.functions.GraftFunctions.register(spark)
    val df = pinned.toDF("a", "b", "want")
    val viaCol = df.selectExpr("graft_damerau(a, b) AS got", "want")
      .collect()
    assert(viaCol.forall(r => r.getInt(0) === r.getInt(1)))
  }

  test("jaro_winkler: semantics pinned BIT-EXACT to the oracle engine " +
    "(boost only above jaro 0.7, prefix cap 4, empty ⇒ 0)") {
    import graft.functions.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    // values probed from DuckDB jaro_winkler_similarity() (the q322
    // oracle); the kernel also matched it on all 249,785 blocked
    // part-name pairs at full double precision while being built
    val pinned = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("JELLYFISH", "SMELLYFISH", 0.8962962962962964),
      ("DwAyNE", "DuANE", 0.8400000000000001),
      ("CRATE", "TRACE", 0.7333333333333334), // jaro>0.7 but prefix 0
      ("aaaaaabc", "aaaaaabd", 0.95), // prefix capped at 4
      ("ab", "az", 0.6666666666666666), // jaro ≤ 0.7 ⇒ NO boost
      ("abcd", "abzz", 0.6666666666666666),
      // ODD disagreement counts (a 3-cycle of matched chars): rapidfuzz
      // — hence DuckDB — FLOORS the transposition half; t/2.0 diverged
      // exactly here (the r17 q322-at-sf0.001 inherited-bug fix)
      ("Customer#000000150", "Customer#000000015", 0.9888888888888889),
      ("abcde150", "abcde015", 0.975),
      ("acb", "bca", 0.5555555555555555),
      ("ab", "ba", 0.0), // window 0: no cross-position matches
      ("a", "b", 0.0), ("", "", 0.0), ("", "abc", 0.0),
      ("abc", "abc", 1.0))
    for ((a, b, want) <- pinned) {
      assert(JaroWinkler.compute(
        UTF8String.fromString(a), UTF8String.fromString(b)) === want,
        s"kernel($a, $b)")
      assert(JaroWinkler.compute(
        UTF8String.fromString(b), UTF8String.fromString(a)) === want,
        s"symmetry($a, $b)")
    }
    // the codegen'd column path agrees with the kernel and SQL
    graft.functions.GraftFunctions.register(spark)
    val df = pinned.toDF("a", "b", "want")
    val viaCol = df.selectExpr("graft_jaro_winkler(a, b) AS got", "want")
      .collect()
    assert(viaCol.forall(r => r.getDouble(0) === r.getDouble(1)))
  }

  test("md5Long values are non-negative 60-bit") {
    val hs = (1 to 1000).map(i => s"doc $i").toDF("s")
      .select(Hashing.md5Long($"s")).as[Long].collect()
    assert(hs.forall(h => h >= 0 && h < (1L << 60)))
    assert(hs.distinct.length === 1000) // no collisions on this sample
  }

  test("PqAdc == element_at chain, bit-exact (the r8 ADC-scan fusion: " +
    "every q293/q295 ADC sum must be unchanged)") {
    import graft.operators.Similarity
    // LUTs from the same DotScores path the real query uses; codes as
    // deterministic in-range ints derived from the id.
    val cents0 = (0 until 8).map(i =>
      (0 until 32).map(j => Similarity.planeComponent(i, j)))
    val cents1 = (0 until 8).map(i =>
      (0 until 32).map(j => Similarity.planeComponent(i + 8, j)))
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(200)
      .select($"vec_id",
        slice($"embedding", 1, 32).as("s0"),
        slice($"embedding", 33, 32).as("s1"))
    def scores(cents: Seq[Seq[Double]], c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.GraftSql.column(graft.functions.DotScores(
        org.apache.spark.sql.GraftSql.expression(c), cents))
    val withLuts = emb.select(
      scores(cents0, $"s0").as("lut0"), scores(cents1, $"s1").as("lut1"),
      pmod($"vec_id", lit(8)).cast("int").as("code0"),
      pmod($"vec_id" * 3 + 1, lit(8)).cast("int").as("code1"))
    val luts = Seq($"lut0", $"lut1"); val codes = Seq($"code0", $"code1")
    val cmp = withLuts.select(
      Similarity.adcNative(luts, codes).as("n"),
      Similarity.adcChain(luts, codes).as("c")).collect()
    assert(cmp.nonEmpty)
    cmp.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // null contract: null lut and null code null the sum like the
    // chain; an out-of-range code yields NULL (try_element_at
    // semantics — ANSI element_at would THROW there, but codes are
    // in-range by construction via cellOf, so the defensive null only
    // makes PqAdc strictly safer than the chain it replaces)
    val edge = Seq(1).toDF("x").select(
      array(lit(1.5), lit(2.5)).as("lut"),
      lit(null).cast("array<double>").as("nullLut"),
      lit(0).as("okCode"), lit(null).cast("int").as("nullCode"),
      lit(7).as("bigCode"))
    val e = edge.select(
      Similarity.adcNative(Seq($"nullLut"), Seq($"okCode")).as("a"),
      Similarity.adcNative(Seq($"lut"), Seq($"nullCode")).as("b"),
      Similarity.adcNative(Seq($"lut"), Seq($"bigCode")).as("c"),
      try_element_at($"lut", $"bigCode" + 1).as("cSpec"),
      Similarity.adcNative(Seq($"lut", $"lut"),
        Seq($"okCode", lit(1).as("one"))).as("ok")).collect().head
    assert(e.isNullAt(0) && e.isNullAt(1) && e.isNullAt(2) && e.isNullAt(3))
    assert(e.getDouble(4) === 4.0)
  }
}
