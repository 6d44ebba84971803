package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Profile, Repetition, Similarity, TextAnalysis}

/** Planted-duplicate verification for the hash-based operators the DuckDB
  * oracle can't mirror (xxhash64-based MinHash/SimHash/LSH), plus unit
  * behavior of the text-analysis expressions. */
class LlmOperatorsSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  // ---- text analysis ----

  test("tokenCount handles empties, runs of whitespace, single token") {
    val df = Seq("", "  ", "one", "a b  c", " pad ").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 0L, 1L, 3L, 1L))
  }

  test("fingerprint is whitespace-insensitive but content-sensitive") {
    val fps = Seq("a b c", "a  b   c", " a b c ", "a b d").toDF("t")
      .select(TextAnalysis.fingerprint(col("t")).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(0) != fps(3))
  }

  test("langId maps NULL and empty text to 'und', not NULL") {
    val df = Seq(Option.empty[String], Some(""), Some("   ")).toDF("t")
      .select(TextAnalysis.langId(col("t")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq == Seq("und", "und", "und"))
  }

  test("lshNearDupPairs and topK operators return empty results on empty input") {
    val empty = plantedVectors.filter(col("vec_id") < 0)
    assert(Similarity.lshNearDupPairs(empty, "vec_id", "embedding", 0.9).count() == 0)
    assert(Similarity.lshTopK(empty, "vec_id", "embedding", _ < 5, k = 3).count() == 0)
    assert(Similarity.ivfTopK(empty, "vec_id", "embedding", _ < 5, k = 3).count() == 0)
  }

  test("langId picks dominant marker language; CJK short-circuits to zh") {
    val df = Seq(
      ("the cat and the dog is here", "en"),
      ("el gato y la casa de madrid", "es"),
      ("der hund und die katze das haus", "de"),
      ("le chat et les maisons des amis", "fr"),
      ("没有 markers here", "zh"),
      ("nothing matching at all", "und")).toDF("t", "want")
    val got = df.select(TextAnalysis.langId(col("t")).as("got"), col("want")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
  }

  // ---- exact dedup ----

  test("exactDedupGroups collapses whitespace-variant copies") {
    val df = Seq((1L, "hello world"), (2L, "hello  world"), (3L, "other doc"))
      .toDF("id", "text")
    val groups = Dedup.exactDedupGroups(df, "id", "text").collect()
    assert(groups.length == 2)
    val dup = groups.find(_.getAs[Long]("n_copies") == 2L).get
    assert(dup.getAs[Long]("keep_id") == 1L)
  }

  test("ngram prefix filter: planted stop-shingle does not explode candidates") {
    // every doc shares one ubiquitous phrase (a "stop shingle" in every
    // inverted list); pairwise similarity is otherwise low. A naive
    // inverted-index join makes all C(40,2)=780 pairs candidates through
    // the hot key; the prefix filter indexes only each doc's rarest
    // shingles, so the ubiquitous ones never generate candidates.
    val rnd = new scala.util.Random(11)
    val stop = "the quick brown fox jumps over the lazy dog again and again"
    val docs = (0L until 40L).map { i =>
      val unique = Seq.fill(12)(rnd.alphanumeric.take(8).mkString).mkString(" ")
      (i, s"$stop $unique")
    }
    // plus one true near-dup pair sharing unique content (jaccard >= 0.5)
    val a = docs(5)._2
    val all = (docs :+ ((100L, a.dropRight(3) + "xyz"))).toDF("id", "text")

    val cands = Dedup.ngramCandidates(all, "id", "text", n = 5, threshold = 0.5)
    val nCands = cands.count()
    assert(nCands < 100, s"prefix filter must bound candidates, got $nCands of 820 pairs")

    // completeness: results equal brute-force exact Jaccard over all pairs
    val got = Dedup.ngramJaccardPairs(all, "id", "text", n = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val txt = all.select(col("id"), TextAnalysis.normText(col("text")).as("t"))
    val brute = txt.as("x").crossJoin(txt.as("y"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id"), col("y.id"),
        graft.functions.NgramJaccard.ngramJaccard(col("x.t"), col("y.t"), 5).as("j"))
      .filter(col("j") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"prefix filter lost pairs: ${brute.diff(got)}")
    assert(got.contains((5L, 100L)), "planted near-dup pair must be found")
  }

  test("stratified sampling: deterministic, partition-invariant, near-rate") {
    import graft.operators.Sampling
    val df = (1 to 2000).map(i =>
      (i.toLong, s"document number $i with some content", if (i % 2 == 0) "a" else "b"))
      .toDF("id", "text", "src")
    def ids(d: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(d, "src", col("text"), Map("a" -> 0.5), 0.1)
        .select("id").collect().map(_.getLong(0)).toSet
    val s1 = ids(df)
    assert(s1 == ids(df.repartition(7)), "sample must not depend on partitioning")
    val nA = s1.count(_ % 2 == 0); val nB = s1.size - nA
    assert(math.abs(nA - 500) < 100, s"stratum a kept $nA of 1000 at rate 0.5")
    assert(math.abs(nB - 100) < 60, s"stratum b kept $nB of 1000 at rate 0.1")
    // boundary rates: 1.0 keeps all, 0.0 keeps none
    assert(Sampling.stratifiedSample(df, "src", col("text"), Map.empty, 1.0).count() == 2000)
    assert(Sampling.stratifiedSample(df, "src", col("text"), Map.empty, 0.0).count() == 0)
  }

  test("train/val/test split: exhaustive, disjoint, near-fraction, invariant") {
    import graft.operators.Sampling
    val df = (1 to 2000).map(i => (i.toLong, s"document number $i body"))
      .toDF("id", "text")
    def splits(d: org.apache.spark.sql.DataFrame) =
      Sampling.trainValTestSplit(d, col("text"), 0.8, 0.1)
        .select("id", "split").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val s1 = splits(df)
    assert(s1.size == 2000, "every row gets exactly one split")
    assert(s1 == splits(df.repartition(7)), "split must not depend on partitioning")
    val bySplit = s1.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(bySplit("train") - 1600) < 100, s"train ${bySplit.get("train")}")
    assert(math.abs(bySplit.getOrElse("val", 0) - 200) < 80, s"val ${bySplit.get("val")}")
    assert(math.abs(bySplit.getOrElse("test", 0) - 200) < 80, s"test ${bySplit.get("test")}")
    intercept[IllegalArgumentException] {
      Sampling.trainValTestSplit(df, col("text"), 0.8, 0.3)
    }
  }

  test("capTokenBudget: greedy fill keeps the crossing row, is invariant") {
    import graft.operators.Sampling
    val df = (1 to 100).map(i =>
        (i.toLong, s"doc $i " + ("tok " * (i % 7 + 1)).trim,
          if (i % 2 == 0) "a" else "b"))
      .toDF("id", "text", "src")
    val tokens = graft.operators.TextAnalysis.tokenCount(col("text"))
    def kept(d: org.apache.spark.sql.DataFrame) =
      Sampling.capTokenBudget(d, "src", tokens, col("text"), col("id"),
          budgets = Map("a" -> 40L), defaultBudget = 25L)
        .select("id", "cum_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k1 = kept(df)
    assert(k1 == kept(df.repartition(13)), "fill must not depend on partitioning")
    // per-stratum totals: everything under budget kept, exactly one
    // crossing row allowed over the line, nothing after it
    val tok = df.select(col("id"), tokens.as("n"), col("src")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    for ((stratum, budget) <- Seq("a" -> 40L, "b" -> 25L)) {
      val rows = k1.filter { case (id, _) => tok(id)._2 == stratum }
      // toSeq before mapping to counts — keys is a Set and equal token
      // counts would otherwise collapse in the sum
      val total = rows.keys.toSeq.map(id => tok(id)._1).sum
      val maxTok = rows.keys.toSeq.map(id => tok(id)._1).max
      assert(total >= budget, s"stratum $stratum underfilled: $total < $budget")
      assert(total - maxTok < budget,
        s"stratum $stratum kept a row past the crossing one")
      assert(rows.values.max == total, "cum_tokens of last kept row = total")
    }
    // zero budget keeps nothing; negative budget rejected
    assert(Sampling.capTokenBudget(df, "src", tokens, col("text"), col("id"),
      Map.empty, 0L).count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.capTokenBudget(df, "src", tokens, col("text"), col("id"),
        Map("a" -> -1L), 10L)
    }
  }

  test("TextChunker: overlapping windows cover every token with the set stride") {
    import graft.operators.TextChunker
    val text = (1 to 100).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text), (2L, ""), (3L, "short doc")).toDF("doc_id", "text")
    val chunks = TextChunker.chunk(df, "doc_id", "text", chunkTokens = 64, overlapTokens = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val doc1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // 100 tokens, stride 48: ceil((100-16)/48) = 2 chunks
    assert(doc1.length == 2)
    assert(doc1(0)._3 == 64 && doc1(0)._4.startsWith("w1 ") && doc1(0)._4.endsWith(" w64"))
    assert(doc1(1)._3 == 52 && doc1(1)._4.startsWith("w49 ") && doc1(1)._4.endsWith(" w100"))
    // consecutive chunks share exactly the 16-token overlap
    val t0 = doc1(0)._4.split(" ").takeRight(16).toSeq
    val t1 = doc1(1)._4.split(" ").take(16).toSeq
    assert(t0 == t1)
    // empty + short docs emit exactly one chunk
    assert(chunks.count(_._1 == 2L) == 1)
    assert(chunks.filter(_._1 == 3L).toSeq.map(c => (c._2, c._3, c._4)) ==
      Seq((0L, 2L, "short doc")))
  }

  // ---- MinHash + LSH with planted near-dups ----

  private def corpusWithPlantedDups = {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "graft", "spark", "orc", "parquet")
    val base = (0L until 40L).map(i =>
      (i, Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
    // 3 near-dup copies: one word changed out of 60 (jaccard ~0.95+)
    val dups = Seq(100L -> base(3), 101L -> base(17), 102L -> base(29)).map {
      case (nid, (_, text)) =>
        val words = text.split(" ")
        words(30) = "CHANGED"
        (nid, words.mkString(" "))
    }
    (base ++ dups).toDF("id", "text")
  }

  test("MinHash LSH finds planted near-duplicates with high verified jaccard") {
    val pairs = Dedup.minhashVerifiedPairs(corpusWithPlantedDups, "id", "text",
        k = 16, shingleSize = 5, bands = 8, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(Set((3L, 100L), (17L, 101L), (29L, 102L)).subsetOf(pairs),
      s"missing planted pairs, got $pairs")
  }

  test("incrementalNearDup flags batch-vs-corpus planted dups only") {
    val all = corpusWithPlantedDups
    val batch = all.filter(col("id") >= 100L)   // the planted copies
    val corpus = all.filter(col("id") < 100L)
    val flagged = Dedup.incrementalNearDup(batch, corpus, "id", "text",
        k = 16, shingleSize = 5, bands = 8, threshold = 0.7)
      .collect().map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("corpus_id"))).toSet
    assert(Set((100L, 3L), (101L, 17L), (102L, 29L)).subsetOf(flagged),
      s"missing planted batch-vs-corpus pairs, got $flagged")
    // strictly cross-set: no batch-batch or corpus-corpus pairs possible
    assert(flagged.forall { case (b, c) => b >= 100L && c < 100L })
  }

  test("incrementalNearDup: a batch duplicating only ITSELF is not flagged") {
    val corpus = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("id", "text")
    val batch = Seq(
      (100L, "one unrelated document here entirely different words"),
      (101L, "one unrelated document here entirely different words"))
      .toDF("id", "text") // in-batch exact dup, nothing like the corpus
    assert(Dedup.incrementalNearDup(batch, corpus, "id", "text",
      k = 16, shingleSize = 5, bands = 8, threshold = 0.5).count() == 0)
  }

  test("leakFreeSplit: every near-dup pair shares a split; singletons " +
    "keep their own-hash assignment") {
    import graft.operators.Sampling
    val all = corpusWithPlantedDups
    val pairs = Dedup.minhashVerifiedPairs(all, "id", "text",
        k = 16, shingleSize = 5, bands = 8, threshold = 0.7)
      .select(col("a_id"), col("b_id"))
    val m = Sampling.leakFreeSplit(all, "id", pairs, 0.6, 0.2)
      .select(col("id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val prs = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(prs.nonEmpty)
    prs.foreach { case (a, b) =>
      assert(m(a) == m(b), s"near-dup pair ($a,$b) straddles splits") }
    // unpaired docs use their own id's hash — identical to the plain
    // per-doc split, so the leak-free variant changes ONLY cluster rows
    val pairedIds = prs.flatMap(p => Seq(p._1, p._2)).toSet
    val plain = Sampling.trainValTestSplit(all, col("id").cast("string"),
        0.6, 0.2)
      .select(col("id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    m.keys.filterNot(pairedIds).foreach { id =>
      assert(m(id) == plain(id), s"singleton $id moved") }
  }

  test("nearDupServe from the persistent index equals the direct " +
    "computation; appended batches are screened against") {
    val all = corpusWithPlantedDups
    val batch = all.filter(col("id") >= 100L)
    val corpus = all.filter(col("id") < 100L)
    Dedup.buildNearDupIndex(corpus, "id", "text", "graft_test_ndidx",
      k = 16, shingleSize = 5, bands = 8)
    val direct = Dedup.incrementalNearDup(batch, corpus, "id", "text",
        k = 16, shingleSize = 5, bands = 8, threshold = 0.7)
      .orderBy(col("batch_id"), col("corpus_id")).collect().toSeq
    val served = Dedup.nearDupServe(spark, "graft_test_ndidx", batch, corpus,
        "id", "text", k = 16, shingleSize = 5, bands = 8, threshold = 0.7)
      .orderBy(col("batch_id"), col("corpus_id")).collect().toSeq
    assert(served.nonEmpty && served == direct)
    // fold the accepted batch in: a re-crawl (same texts, new ids) is now
    // caught against the batch's own signatures, with no index rebuild
    Dedup.appendToNearDupIndex(batch, "id", "text", "graft_test_ndidx",
      k = 16, shingleSize = 5, bands = 8)
    val recrawl = batch.withColumn("id", col("id") + 1000L)
    val flagged = Dedup.nearDupServe(spark, "graft_test_ndidx", recrawl, all,
        "id", "text", k = 16, shingleSize = 5, bands = 8, threshold = 0.7)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == batch.collect().map(_.getLong(0) + 1000L).toSet)
  }

  test("paragraphDedup keeps the (id, pos)-first occurrence and rebuilds") {
    val df = Seq(
      (1L, "alpha\nbeta\nalpha"),
      (2L, "beta\ngamma"),
      (3L, "alpha")).toDF("id", "text")
    val out = Dedup.paragraphDedup(df, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(1L) == ((3L, 2L, "alpha\nbeta"))) // in-page dup cut
    assert(out(2L) == ((2L, 1L, "gamma")))       // cross-page dup cut
    assert(out(3L) == ((1L, 0L, "")))            // fully-duplicated page
  }

  test("bandingRecall pins the documented S-curve at the default dials") {
    // k=32, bands=8 (r=4): borderline pairs at j=0.6 are ~2/3 recall;
    // clear near-dups essentially never missed. Deep-band dials at the
    // same r buy near-1 recall at the threshold.
    assert(math.abs(Dedup.bandingRecall(0.6, 32, 8) - 0.6706) < 0.005)
    assert(math.abs(Dedup.bandingRecall(0.7, 32, 8) - 0.8888) < 0.005)
    assert(math.abs(Dedup.bandingRecall(0.8, 32, 8) - 0.9853) < 0.005)
    assert(Dedup.bandingRecall(0.9, 32, 8) > 0.999)
    assert(Dedup.bandingRecall(0.6, 128, 32) > 0.98)
    // monotone in j for fixed dials
    val curve = (1 to 9).map(i => Dedup.bandingRecall(i / 10.0, 32, 8))
    assert(curve == curve.sorted)
  }

  test("MinHash signature is deterministic across repartitioning") {
    val df = corpusWithPlantedDups
    val sig1 = df.repartition(1).select(col("id"),
      Dedup.minhashSignature(col("text"), 8, 5).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sig4 = df.repartition(4).select(col("id"),
      Dedup.minhashSignature(col("text"), 8, 5).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sig1 == sig4)
  }

  // ---- SimHash ----

  test("native SimHash64 is bit-identical to the functions._ formulation") {
    val texts = Seq("", " ", "one", "a b  c", " pad ", "tab\tand\nnewline",
      "unicode héllo wörld 你好", "the quick brown fox jumps over the lazy dog",
      "x " * 200)
    val df = texts.toDF("t")
    val rows = df.select(
      Dedup.simhash64(col("t")).as("native"),
      Dedup.simhash64Hof(col("t")).as("hof")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getLong(0) == r.getLong(1), s"mismatch for '$t'")
    }
  }

  test("SimHash: identical texts hamming 0; near-dup small; unrelated large") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "entirely different content about spark orc parquet columnar engines"))
      .toDF("id", "text")
    val sigs = df.select(col("id"), Dedup.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(ham(1L, 2L) == 0)
    assert(ham(1L, 3L) < 20, s"near-dup hamming ${ham(1L, 3L)}")
    assert(ham(1L, 4L) > ham(1L, 3L))
  }

  test("simhashPairs blocking finds identical + near-dup pairs") {
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
      (2L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
      (3L, "zz yy xx ww vv uu tt ss rr qq")).toDF("id", "text")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxDistance = 3)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("portable SimHash: single-token signature IS the MD5-low-64 token hash") {
    // With one token every bit votes exactly once, so the signature equals
    // the token hash itself. The pinned value is DuckDB's
    // CAST('0x' || substr(md5('hello'), 1, 16) AS UBIGINT) — the
    // cross-engine contract the portable mode exists for.
    val got = Seq("hello").toDF("t")
      .select(Dedup.simhash64(col("t"), portable = true)).head().getLong(0)
    assert(got == 0x5d41402abc4b2a76L, f"got 0x$got%016x")
    // empty text = one empty token = md5("") low 64 = 0xd41d8cd98f00b204
    val empty = Seq("").toDF("t")
      .select(Dedup.simhash64(col("t"), portable = true)).head().getLong(0)
    assert(empty == 0xd41d8cd98f00b204L, f"got 0x$empty%016x")
  }

  test("portable SimHash: near-dup structure matches default mode") {
    val df = Seq(
      (1L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
      (2L, "aa bb cc dd ee ff gg hh ii jj kk ll mm nn oo pp"),
      (3L, "zz yy xx ww vv uu tt ss rr qq")).toDF("id", "text")
    val pairs = Dedup.simhashPairs(df, "id", "text", maxDistance = 3,
        portable = true)
      .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("quantizeInt8: codes in 0..255, reconstruction within scale/2, constant vectors degenerate cleanly") {
    val df = Seq(
      (1L, Array(0.1f, -0.5f, 2.0f, 0.0f)),
      (2L, Array(7.0f, 7.0f, 7.0f, 7.0f)), // constant -> scale 0, codes 0
      (3L, Array(-3.0f, 3.0f, 1.5f, -1.5f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(df, "vec_id", "embedding")
    val joined = q.join(df.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v")), "vec_id")
      .select(col("vec_id"), col("codes"), col("q_min"), col("q_scale"),
        Similarity.dequantize(col("codes"), col("q_min"), col("q_scale")).as("dq"),
        col("v"))
      .collect().map(r => r.getLong(0) -> r).toMap
    joined.values.foreach { r =>
      val codes = r.getSeq[Int](1)
      assert(codes.forall(c => c >= 0 && c <= 255))
      val scale = r.getDouble(3)
      val err = r.getSeq[Double](4).zip(r.getSeq[Double](5)).map { case (a, b) => math.abs(a - b) }
      assert(err.forall(_ <= scale / 2 + 1e-12), s"vec ${r.getLong(0)}: $err vs $scale")
    }
    val const = joined(2L)
    assert(const.getDouble(3) == 0.0 && const.getSeq[Int](1).forall(_ == 0))
    assert(const.getSeq[Double](4).forall(_ == 7.0)) // exact reconstruction
  }

  test("recallGate: exact vs itself passes at k; crippled approx fails") {
    val brute = Similarity.bruteForceTopK(plantedVectors, "vec_id", "embedding",
      _ < 3, k = 3)
    val allOk = Similarity.recallGate(brute, brute, minHits = 3).collect()
    assert(allOk.length == 3 && allOk.forall(_.getBoolean(1)))
    // approx returning only rank-1 rows cannot meet minHits = 2
    val crippled = brute.filter(col("rank") === 1)
    val failed = Similarity.recallGate(crippled, brute, minHits = 2).collect()
    assert(failed.length == 3 && failed.forall(!_.getBoolean(1)))
    // eps slack counts near-top-k-quality neighbors
    val okWithEps = Similarity.recallGate(crippled, brute, minHits = 1, eps = 0.0)
      .collect()
    assert(okWithEps.forall(_.getBoolean(1)))
  }

  test("mmrRerank: picks the planted near-dup only once and prefers " +
    "diverse candidates over redundant higher-rel ones") {
    val emb = plantedVectors
    // candidates for query 0: its exact top-10 — includes the planted
    // ~0.999-cosine twin (100) and, implicitly, mutually-similar others
    val cand = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        _ < 3, k = 10)
      .select(col("query_id"), col("neighbor_id").as("doc_id"),
        col("score").as("rel"))
    val relOrder = cand.filter(col("query_id") === 0)
      .orderBy(col("rel").desc, col("doc_id"))
      .collect().map(_.getLong(1)).toSeq
    val mmr = Similarity.mmrRerank(cand, emb, "vec_id", "embedding",
        k = 5, lambda = 0.5)
      .filter(col("query_id") === 0).orderBy(col("rank"))
      .collect().map(_.getLong(1)).toSeq
    // rank-1 pick is pure relevance; each doc appears at most once
    assert(mmr.head == relOrder.head)
    assert(mmr.distinct.size == mmr.size && mmr.size == 5)
    assert(mmr.toSet.subsetOf(relOrder.toSet))
    // at lambda = 1 MMR degenerates to the relevance order exactly
    val pure = Similarity.mmrRerank(cand, emb, "vec_id", "embedding",
        k = 5, lambda = 1.0)
      .filter(col("query_id") === 0).orderBy(col("rank"))
      .collect().map(_.getLong(1)).toSeq
    assert(pure == relOrder.take(5))
  }

  test("randomProject: deterministic across partitionings, right dim, " +
    "and rpTopK finds planted near-dups") {
    val p1 = Similarity.randomProject(plantedVectors.repartition(1),
        "vec_id", "embedding", outDim = 16)
      .orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    val p8 = Similarity.randomProject(plantedVectors.repartition(8),
        "vec_id", "embedding", outDim = 16)
      .orderBy(col("vec_id")).collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    assert(p1.toSeq == p8.toSeq)
    assert(p1.head._2.length == 16)
    // the planted ~0.999-cosine duplicate of each query must survive the
    // projected shortlist and re-rank to the exact top
    val top = Similarity.rpTopK(plantedVectors, "vec_id", "embedding",
        _ < 3, k = 1, outDim = 16, shortlist = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert((0L until 3L).forall(q => top(q) == 100L + q), s"got $top")
  }

  // ---- similarity search ----

  private def plantedVectors = {
    val rnd = new scala.util.Random(11)
    val dim = 32
    def randVec() = Array.fill(dim)(rnd.nextGaussian().toFloat)
    val base = (0L until 50L).map(i => (i, randVec()))
    // planted: 100+i is a tiny perturbation of i (cosine ~0.999)
    val dups = (0L until 5L).map { i =>
      val v = base(i.toInt)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      (100L + i, v)
    }
    (base ++ dups).toDF("vec_id", "embedding")
  }

  test("ivfAssignmentDrift: ~0 on the training distribution, fires on a " +
      "planted subspace shift") {
    val vecs = plantedVectors
    val cents = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding",
      nCentroids = 4, lloydIters = 2)
    // same distribution both sides: confidences identical, KS exactly 0
    val same = Similarity.ivfAssignmentDrift(vecs, vecs, "vec_id",
      "embedding", cents).collect()(0).getDouble(0)
    assert(same == 0.0)
    // shifted: negate every vector — cosine to each centroid flips sign,
    // so the whole confidence distribution moves and KS is large
    val flipped = vecs.select(col("vec_id"),
      transform(col("embedding"), x => -x).as("embedding"))
    val moved = Similarity.ivfAssignmentDrift(vecs, flipped, "vec_id",
      "embedding", cents).collect()(0).getDouble(0)
    // isotropic Gaussians keep some confidence overlap after the flip
    // (measured ks_d 0.6 here); the monitor threshold is 0.5
    assert(moved >= 0.5, s"ks_d $moved")
  }

  test("reclusterIvfIndex: catalog re-routes under new centroids, rows " +
      "and vectors intact, serve equals a fresh build") {
    val vecs = plantedVectors
    val stale = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding",
      nCentroids = 2, lloydIters = 2)
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding",
      "graft_spec_reclu_old", stale, numBuckets = 4)
    val fresh = Similarity.trainIvfCentroids(vecs, "vec_id", "embedding",
      nCentroids = 4, lloydIters = 2)
    Similarity.reclusterIvfIndex(spark, "graft_spec_reclu_old",
      "graft_spec_reclu_new", fresh, numBuckets = 4)
    val n0 = spark.table("graft_spec_reclu_old").count()
    assert(spark.table("graft_spec_reclu_new").count() == n0)
    // reclustered serve == serve from an index built directly with the
    // fresh centroids (the blue/green cutover must be a pure re-route)
    Similarity.buildIvfIndex(vecs, "vec_id", "embedding",
      "graft_spec_reclu_direct", fresh, numBuckets = 4)
    def serve(tbl: String) =
      Similarity.ivfIndexServe(spark, tbl, vecs, "vec_id", "embedding",
          queryIds = _ < 5, k = 3, centroids = fresh, nProbe = 2)
        .collect().map(r => (r.getAs[Long]("query_id"),
          r.getAs[Long]("neighbor_id"), r.getAs[Long]("rank"))).toSet
    assert(serve("graft_spec_reclu_new") == serve("graft_spec_reclu_direct"))
  }

  test("bruteForceTopK: planted near-identical vector is rank-1 neighbor") {
    val top = Similarity.bruteForceTopK(plantedVectors, "vec_id", "embedding",
        queryIds = _ < 5, k = 3)
      .filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    (0L until 5L).foreach(q => assert(top(q) == 100L + q, s"query $q -> ${top(q)}"))
    val score1 = Similarity.bruteForceTopK(plantedVectors, "vec_id", "embedding",
        queryIds = _ === 0, k = 1).collect()(0).getAs[Double]("score")
    assert(score1 > 0.99)
  }

  test("lshTopK recalls the planted rank-1 neighbors (recall@1 >= 0.8)") {
    val got = Similarity.lshTopK(plantedVectors, "vec_id", "embedding",
        queryIds = _ < 5, k = 1, tables = 8, nBits = 4, seed = 42L)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val hits = (0L until 5L).count(q => got.get(q).contains(100L + q))
    assert(hits >= 4, s"recall@1 $hits/5")
  }

  test("ivfTopK recalls the planted rank-1 neighbors (recall@1 >= 0.8)") {
    val got = Similarity.ivfTopK(plantedVectors, "vec_id", "embedding",
        queryIds = _ < 5, k = 1, nCentroids = 8, nProbe = 3)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val hits = (0L until 5L).count(q => got.get(q).contains(100L + q))
    assert(hits >= 4, s"recall@1 $hits/5")
  }

  test("native Int8Quantize is bit-identical to the Column formulation") {
    val rnd = new scala.util.Random(7)
    val vecs: Seq[Seq[Double]] = Seq(
      Seq.fill(64)(rnd.nextGaussian()),
      Seq.fill(7)(rnd.nextDouble() * 1e-9),     // tiny spread
      Seq.fill(5)(3.25),                        // constant -> scale 0
      Seq(-2.5, 0.0, 2.5),                      // negatives
      Seq(1.0),                                 // single element
      Seq.empty[Double],                        // empty -> null min/scale
      Seq(-0.0, 0.0, 1.0))                      // array_min orders -0.0 < 0.0
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    // the old pure-Column affine formulation, verbatim
    val v = col("v")
    val mn = array_min(v)
    val sc = (array_max(v) - array_min(v)) / 255.0
    val legacy = df.select(col("id"),
      transform(v, x =>
        when(sc === 0.0, lit(0))
          .otherwise(round((x - mn) / sc, 0).cast("int"))).as("codes"),
      mn.as("q_min"), sc.as("q_scale"))
    val native = Similarity.quantizeInt8(df, "id", "v")
    // BIT-level double comparison: NaN must equal NaN and -0.0 must
    // differ from 0.0, which Scala's == gets wrong in both directions
    def bits(v: Any): Any = v match {
      case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
      case x => x
    }
    val l = legacy.collect().map(r => r.getLong(0) ->
      ((r.getSeq[Int](1), bits(r.get(2)), bits(r.get(3))))).toMap
    val n = native.collect().map(r => r.getLong(0) ->
      ((r.getSeq[Int](1), bits(r.get(2)), bits(r.get(3))))).toMap
    assert(l == n)
  }

  test("Int8Quantize is TOTAL on NaN/Inf vectors where the Column " +
      "formulation errors under ANSI") {
    // intentional divergence: a corrupt embedding must not kill a 100 TB
    // quantization job — NaN-poisoned scale yields code 0 per element,
    // infinite y saturates; the legacy cast raises CAST_OVERFLOW instead
    val df = Seq(
      (1L, Seq(1.0, Double.NaN, 2.0)),
      (2L, Seq(Double.NegativeInfinity, 0.0, 5.0))).toDF("id", "v")
    val got = Similarity.quantizeInt8(df, "id", "v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(got(1L) == Seq(0, 0, 0)) // sc = NaN poisons every element
    // mn = -Inf, sc = Inf: y = (x-(-Inf))/Inf = NaN for finite x
    assert(got(2L) == Seq(0, 0, 0))
  }

  test("ivfTopKInt8: exact re-rank reports float scores and recalls the " +
      "planted rank-1 neighbors") {
    val got = Similarity.ivfTopKInt8(plantedVectors, "vec_id", "embedding",
        queryIds = _ < 5, k = 3, nCentroids = 8, nProbe = 3)
      .collect()
    val top1 = got.filter(_.getAs[Long]("rank") == 1L)
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
    val hits = (0L until 5L).count(q => top1.get(q).contains(100L + q))
    assert(hits >= 4, s"recall@1 $hits/5")
    // scores are EXACT cosines (not quantized): every (query, neighbor)
    // the int8 path returns must carry the same score brute force reports
    val exact = Similarity.bruteForceTopK(plantedVectors, "vec_id", "embedding",
        queryIds = _ < 5, k = 20)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Double]("score")).toMap
    got.foreach { r =>
      val key = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      exact.get(key).foreach(s =>
        assert(s == r.getAs[Double]("score"), s"score drift at $key"))
    }
    // empty corpus stays safe, same as the float variants
    val empty = plantedVectors.filter(col("vec_id") < 0)
    assert(Similarity.ivfTopKInt8(empty, "vec_id", "embedding", _ < 5, k = 3).count() == 0)
  }

  test("frozen-centroid serve paths equal the train-per-call results") {
    val cents = Similarity.trainIvfCentroids(plantedVectors, "vec_id",
      "embedding", nCentroids = 8, lloydIters = 2)
    val perCall = Similarity.ivfTopK(plantedVectors, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 8, nProbe = 3).collect().toSet
    val served = Similarity.ivfTopKServe(plantedVectors, "vec_id", "embedding",
      _ < 5, k = 3, centroids = cents, nProbe = 3).collect().toSet
    assert(perCall == served)
    val perCall8 = Similarity.ivfTopKInt8(plantedVectors, "vec_id", "embedding",
      _ < 5, k = 3, nCentroids = 8, nProbe = 3).collect().toSet
    val served8 = Similarity.ivfTopKInt8Serve(plantedVectors, "vec_id",
      "embedding", _ < 5, k = 3, centroids = cents, nProbe = 3).collect().toSet
    assert(perCall8 == served8)
    // a second batch against the same frozen centroids (serve-many)
    val batch2 = Similarity.ivfTopKServe(plantedVectors, "vec_id", "embedding",
      c => c >= 5 && c < 10, k = 3, centroids = cents, nProbe = 3)
    assert(batch2.count() > 0)
  }

  test("Repetition.signals: hand-computed Gopher fractions") {
    val docs = Seq(
      (1L, "a b a b a b"),            // top2 "a b"x3; top3 tie -> 2*5/11
      (2L, "x y z w v x y z w v q"),  // dup 5-gram at 0 and 5 -> union 19/21
      (3L, "q"),                      // too short for every rule
      (4L, "a a a a a a a")           // overlapping dup 5-grams -> full cover
    ).toDF("doc_id", "text")
    val got = Repetition.signals(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def d(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: norm len 11
    assert(got(1L).getDouble(2) == d(3.0 * 3 / 11))   // top2
    assert(got(1L).getDouble(3) == d(2.0 * 5 / 11))   // top3 (tie -> "a b a")
    assert(got(1L).getDouble(4) == d(2.0 * 7 / 11))   // top4 (>1: overlap-blind)
    assert(got(1L).getLong(5) == 0L)                  // no dup 5-grams
    // doc 2: merged [0,10) covers 10 tokens + 9 spaces = 19 of 21 chars
    assert(got(2L).getLong(5) == 19L)
    assert(got(2L).getDouble(6) == d(19.0 / 21))
    assert(got(2L).getDouble(2) == d(2.0 * 3 / 21))
    // doc 3: no rule fires
    assert(got(3L).getLong(1) == 1L)
    (2 to 6).foreach(i => assert(got(3L).get(i) == (if (i == 5) 0L else 0.0)))
    // doc 4: three overlapping occurrences union to the whole doc
    assert(got(4L).getLong(5) == 13L && got(4L).getDouble(6) == 1.0)
  }

  test("semDedup drops planted near-identical vectors, keeps min-id rep") {
    val res = Similarity.semDedup(plantedVectors, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getLong(3))).toMap
    assert(res.size == 55)
    // every planted dup 100+i (cosine ~0.999 to base i) is dropped with
    // the base vector as its keeper; the base vector survives
    (0L until 5L).foreach { i =>
      assert(res(100L + i) == (false, i), s"dup ${100 + i}")
      assert(res(i)._1, s"base $i must be kept")
    }
    // nothing else is near-duplicate at 0.95 in a 32-dim gaussian cloud
    assert(res.count(!_._2._1) == 5)
  }

  test("semDedup gate verdicts all true; serve path matches train path") {
    val gate = Similarity.semDedupGate(plantedVectors, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 4).collect()
    assert(gate.length == 55 && gate.forall(_.getBoolean(1)))
    val cents = Similarity.trainIvfCentroids(plantedVectors, "vec_id",
      "embedding", nCentroids = 4, lloydIters = 2)
    val served = Similarity.semDedupServe(plantedVectors, "vec_id",
      "embedding", threshold = 0.95, centroids = cents).collect().toSet
    val trained = Similarity.semDedup(plantedVectors, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 4).collect().toSet
    assert(served == trained)
  }

  test("semDedup is a greedy MIS, not transitive closure: chain middle " +
      "drops, endpoint survives") {
    // a~b and b~c clear the threshold but a~c does not (35 deg steps,
    // threshold cos(40 deg)): the id-ordered sweep keeps a, drops b
    // against a, then KEEPS c (its only near-dup b was dropped).
    // Component labeling would wrongly drop c with keeper a.
    def rot(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    val df = Seq((0L, rot(0)), (1L, rot(35)), (2L, rot(70)))
      .toDF("vec_id", "embedding")
    val res = Similarity.semDedup(df, "vec_id", "embedding",
        threshold = math.cos(math.toRadians(40)), nCentroids = 1)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(2), r.getLong(3))).toMap
    assert(res(0L) == (true, 0L))
    assert(res(1L) == (false, 0L))
    assert(res(2L) == (true, 2L))
  }

  test("semDedup keeps null-vector rows and survives an empty corpus") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val withNull = plantedVectors.unionByName(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(999L, null), Row(998L, Seq.empty[Float]))), schema))
    val res = Similarity.semDedup(withNull, "vec_id", "embedding",
      threshold = 0.95, nCentroids = 4)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(res(999L) == (-1, true) && res(998L) == (-1, true))
    val empty = plantedVectors.filter(col("vec_id") < 0)
    assert(Similarity.semDedup(empty, "vec_id", "embedding", 0.95).count() == 0)
  }

  test("connectedComponents labels chains, cliques and bridges with the min id") {
    // chain 0-1-2-...-24 (diameter stress: label must travel 24 hops),
    // clique {100..104}, bridge pair {200,201}, plus an isolated pair
    val chain = (0L until 24L).map(i => (i, i + 1))
    val clique = (for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b))
    val pairs = (chain ++ clique ++ Seq((200L, 201L))).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 24L).forall(got(_) == 0L), s"chain must collapse to 0: $got")
    assert((100L to 104L).forall(got(_) == 100L))
    assert(got(200L) == 200L && got(201L) == 200L)
    assert(got.size == 25 + 5 + 2)

    // deterministic under any partitioning
    val got7 = Dedup.connectedComponents(pairs.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got7 == got)

    // the distributed large-star/small-star path (forced with
    // smallGraphEdges = 0) must agree with the driver union-find exactly
    val gotDist = Dedup.connectedComponents(pairs, smallGraphEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist == got, "distributed and union-find labels must agree")

    // pair order / direction must not matter
    val flipped = pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id"))
    val gotF = Dedup.connectedComponents(flipped).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotF == got)

    // empty input -> empty output, correct shape
    val empty = Dedup.connectedComponents(pairs.limit(0))
    assert(empty.columns.toSeq == Seq("id", "cluster_id") && empty.count() == 0)
  }

  test("VecMeanAgg matches the posexplode+decimal formulation bit for bit") {
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(11)
    val df = (0 until 500)
      .map(i => (i % 7, Array.fill(24)(rnd.nextGaussian())))
      .toDF("cell", "v")
    def viaAgg(d: org.apache.spark.sql.DataFrame): Map[Int, Seq[Double]] =
      d.groupBy(col("cell"))
        .agg(graft.functions.VecMeanAgg.vecMean(col("v")).as("mean"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toIndexedSeq).toMap
    val viaExplode = df
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(sum(col("x").cast(DecimalType(28, 12))).as("s"), count(lit(1)).as("cnt"))
      .collect()
      .groupBy(_.getInt(0))
      .map { case (c, rows) =>
        c -> rows.sortBy(_.getInt(1))
          .map(r => r.getAs[java.math.BigDecimal]("s").doubleValue() /
            r.getAs[Long]("cnt")).toIndexedSeq
      }
    val one = viaAgg(df)
    assert(one == viaExplode, "vec_mean must equal the exploded decimal means")
    // exact decimal buffers => identical result under any partitioning
    assert(one == viaAgg(df.repartition(13)), "vec_mean must be partition-invariant")
  }

  test("Lloyd refinement cuts IVF distortion, is partition-invariant, lifts recall") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(5)
    val dim = 16
    // 4 well-separated clusters; ids ordered so lowest-id init puts ALL
    // centroids inside cluster 0 (the worst case for the id-based init)
    def member(c: Int) =
      Array.tabulate(dim)(j => (if (j == c * 4) 10.0 else 0.0) + 0.3 * rnd.nextGaussian())
    val base = (0 until 100).map(i => (i.toLong, member(i / 25).map(_.toFloat)))
    val dups = (0 until 4).map(c =>
      (200L + c, base(c * 25)._2.map(x => x + 0.01f * rnd.nextGaussian().toFloat)))
    val df = (base ++ dups).toDF("vec_id", "embedding")
    val vecs = df.select(col("embedding").cast("array<double>").as("v"))

    val init = df.orderBy(col("vec_id")).limit(4)
      .select(col("embedding").cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq

    def distortion(cents: Seq[Seq[Double]]): Double = {
      val all = vecs.collect().map(_.getSeq[Double](0))
      all.map(v => cents.map(c =>
        c.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum).min).sum
    }
    val refined = Similarity.refineCentroids(vecs, "v", init, iters = 3)
    assert(distortion(refined) < distortion(init) * 0.5,
      s"Lloyd must cut distortion: ${distortion(init)} -> ${distortion(refined)}")

    // exact decimal means => identical centroids under any partitioning
    val refined7 = Similarity.refineCentroids(vecs.repartition(7), "v", init, iters = 3)
    assert(refined == refined7, "refinement must be partition-invariant")

    // recall at nProbe=1: the id-based init collapses cells into cluster 0;
    // refined centroids separate the clusters
    def recall(iters: Int): Int = {
      val got = Similarity.ivfTopK(df, "vec_id", "embedding",
          queryIds = c => c >= 200L, k = 1, nCentroids = 4, nProbe = 1, lloydIters = iters)
        .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("neighbor_id")).toMap
      (0 until 4).count(c => got.get(200L + c).contains(c * 25L))
    }
    assert(recall(2) >= recall(0), "refined recall must not regress")
    assert(recall(2) >= 3, s"refined recall ${recall(2)}/4")
  }

  test("lshNearDupPairs recalls planted near-dups; brute force is the oracle") {
    // planted (i, 100+i) pairs have cosine ~0.999; threshold 0.98 isolates
    // them. LSH output must be a subset of brute force (precision 1) and
    // recall the planted pairs.
    val brute = Similarity.cosineNearDupPairs(plantedVectors, "vec_id", "embedding",
        threshold = 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshNearDupPairs(plantedVectors, "vec_id", "embedding",
        threshold = 0.98, tables = 8, nBits = 4, seed = 42L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), s"false positives: ${lsh.diff(brute)}")
    val planted = (0L until 5L).map(i => (i, 100L + i)).toSet
    assert(planted.subsetOf(brute))
    val hits = planted.count(lsh.contains)
    assert(hits >= 4, s"recall $hits/5 on planted near-dups")
  }

  test("cosineNearDupPairs enforces its all-pairs input bound") {
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairs(plantedVectors, "vec_id", "embedding",
        threshold = 0.5, maxInputRows = 10)
    }
  }

  test("cosine self-similarity is exactly 1.0 for identical vectors") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    val c = df.select(Similarity.cosine(
      col("embedding").cast("array<double>"),
      col("embedding").cast("array<double>")).as("c")).collect()(0).getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  // ---- exact substring-span dedup ----

  test("spanPairs finds a planted shared span and counts distinct windows") {
    val run = (1 to 10).map(i => s"w$i").mkString(" ") // 10 shared tokens
    val docs = Seq(
      (1L, s"intro alpha $run tail one"),
      (2L, s"other beta start $run closing words two"),
      (3L, "completely different text with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val got = Dedup.spanPairs(docs, "doc_id", "text", spanTokens = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // a 10-token shared run has 3 distinct 8-token windows
    assert(got.toSeq == Seq((1L, 2L, 3L)))
  }

  test("SpanHashes matches a naive split-based reference on varied inputs") {
    def naive(s: String, span: Int): Set[Long] = {
      val toks = s.trim.split("\\s+").filter(_.nonEmpty)
      if (toks.length < span) Set.empty
      else toks.sliding(span).map { w =>
        val str = w.mkString(" ")
        var h = 0xcbf29ce484222325L
        str.foreach(c => h = (h ^ c) * 0x100000001b3L)
        var x = h
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
        x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
        x ^= x >>> 33
        x
      }.toSet
    }
    val cases = Seq("", "one", "a b", "a b c", "a b c d e f g h i j",
      "x y x y x y x y", ("tok " * 50).trim)
    for (s <- cases; span <- Seq(2, 3, 8)) {
      val norm = s.trim.replaceAll("\\s+", " ")
      val got = graft.functions.SpanHashes.compute(norm, span).toSet
      assert(got == naive(norm, span), s"mismatch for '$s' span=$span")
    }
  }

  test("spanContaminated flags corpus docs sharing a benchmark 8-gram") {
    val run = (1 to 9).map(i => s"q$i").mkString(" ") // 9 shared tokens
    val bench = Seq((100L, s"benchmark question $run answer")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"a training doc that contains $run verbatim inside"),
      (2L, "a clean training document with entirely original content here"),
      (3L, s"short $run"), // shares the run too
      (4L, "q1 q2 q3 q4 q5 q6 q7 only seven of the benchmark tokens")
    ).toDF("doc_id", "text")
    val got = Dedup.spanContaminated(corpus, bench, "doc_id", "text", spanTokens = 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 3L)) // 4 shares only a 7-token run: not flagged
  }

  test("semanticContamination flags argmax bench match with min-id ties") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)),  // aligned with both bench vectors
      (2L, Array(0.0f, 1.0f)),  // orthogonal to both
      (3L, Array(0.6f, 0.8f))   // partial overlap, below threshold 0.9
    ).toDF("id", "vec")
    val bench = Seq((10L, Array(2.0f, 0.0f)), (20L, Array(3.0f, 0.0f)))
      .toDF("id", "vec")
    val got = Similarity.semanticContamination(corpus, bench, "id", "vec", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // both bench vectors give cosine exactly 1.0 for doc 1: tie breaks
    // to the LOWEST bench id, and docs 2/3 stay unflagged
    assert(got.toSeq == Seq((1L, 10L, 1.0)))
    // the broadcast guard refuses an oversized benchmark side
    val big = spark.range(0, 50).select(col("id"), lit(Array(1.0f, 0.0f)).as("vec"))
    intercept[IllegalArgumentException] {
      Similarity.semanticContamination(corpus, big, "id", "vec", 0.9,
        maxBenchRows = 10)
    }
  }

  test("weightedSamplePerStratum draws k per stratum via WindowGroupLimit") {
    import graft.operators.Sampling
    val docs = ((1L to 50L).map(i => (i, "a", s"doc body $i")) ++
      (51L to 53L).map(i => (i, "b", s"doc body $i"))).toDF("id", "src", "txt")
    val hashOn = concat(col("id"), lit(":"), col("txt"))
    val got = Sampling.weightedSamplePerStratum(docs, "src", hashOn, lit(1.0),
      col("id"), k = 5)
    val bySrc = got.groupBy(col("src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("a" -> 5L, "b" -> 3L)) // k caps, small stratum whole
    // the rank filter must plan as WindowGroupLimit (map-side per-stratum
    // pruning before the exchange), not a full sort + filter
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(500))
    // partitioning invariance
    val again = Sampling.weightedSamplePerStratum(docs.repartition(9), "src",
      hashOn, lit(1.0), col("id"), 5).collect().map(_.getLong(0)).toSet
    assert(again == got.collect().map(_.getLong(0)).toSet)
  }

  test("keepBest keeps the highest-score cluster member, not the lowest id") {
    val docs = Seq(
      (1L, "short dup", 5.0), (2L, "short dup plus more detail", 9.0),
      (3L, "short dup v3", 6.0), (10L, "unrelated standalone doc", 1.0)
    ).toDF("id", "txt", "q")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("a_id", "b_id")
    val kept = Dedup.keepBest(docs, pairs, "id", col("q"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(2L, 10L)) // 2 wins its cluster on score; 10 untouched
    // ties break to the lowest id, matching the oracle's ORDER BY
    val tied = Dedup.keepBest(docs.withColumn("q", lit(1.0)), pairs, "id", col("q"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(tied == Seq(1L, 10L))
  }

  test("SnapshotDiff classifies added/removed/changed/unchanged incl. nulls") {
    import graft.operators.SnapshotDiff
    val before = Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
      (4L, None: Option[String])).toDF("id", "txt")
    val after = Seq((2L, Option("b")), (3L, Option("c2")),
      (4L, None: Option[String]), (5L, Option("e"))).toDF("id", "txt")
    val got = SnapshotDiff.diff(before, after, "id", Seq("txt"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "unchanged", 5L -> "added")) // null content is NOT "missing"
    val sum = SnapshotDiff.summary(before, after, "id", Seq("txt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("removed" -> 1L, "unchanged" -> 2L, "changed" -> 1L,
      "added" -> 1L))
  }

  test("sketched profile merges exactly on monoid fields across 3 shards") {
    // ids straddle 9/10 so a lexicographic merge of rendered numeric
    // bounds would return min "10": the typed bound fields must not
    val rows = (5L to 14L).map(i => (i, if (i % 3 == 0) null else s"v$i"))
    val df = rows.toDF("id", "s")
    val cols = Seq("id", "s")
    val parts = Seq(df.filter(col("id") % 3 === 0), df.filter(col("id") % 3 === 1),
      df.filter(col("id") % 3 === 2))
    val merged = Profile.finalizeSketched(
        Profile.mergeSketched(parts.map(Profile.sketched(_, cols))))
      .collect().map(r => r.getString(0) -> r).toMap
    val direct = Profile.finalizeSketched(Profile.sketched(df, cols))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- cols; f <- Seq(1, 2, 4, 5)) // n_rows, n_nulls, min_v, max_v
      assert(merged(c).get(f) == direct(c).get(f), s"col=$c field=$f")
    assert(merged("id").getString(4) == "5.0" && merged("id").getString(5) == "14.0")
    // small cardinalities sit far from the sketch mode boundary: the
    // estimates agree exactly here, and a single-part merge is identity
    for (c <- cols) assert(merged(c).getLong(3) == direct(c).getLong(3))
    val one = Profile.finalizeSketched(Profile.mergeSketched(Seq(Profile.sketched(df, cols))))
      .collect().map(r => r.getString(0) -> r).toMap
    for (c <- cols; f <- 1 to 5) assert(one(c).get(f) == direct(c).get(f))
  }

  test("termDivergence: zero for identical, ln2 for disjoint, bounded between") {
    val docs = Seq(
      (1L, "same", "apple banana cherry apple banana"),
      (2L, "copy", "apple banana cherry apple banana"),
      (3L, "other", "xylophone zeppelin quasar xylophone zeppelin"),
      (4L, "mixed", "apple banana xylophone zeppelin cherry")
    ).toDF("id", "src", "txt")
    val js = Profile.termDivergence(docs, "src", "txt", topTerms = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(js(("copy", "same")) == 0.0)
    val ln2 = math.log(2.0)
    assert(math.abs(js(("other", "same")) - ln2) < 1e-6) // disjoint vocab
    val mid = js(("mixed", "same"))
    assert(mid > 0.0 && mid < ln2)
    // partitioning invariance: bit-identical on a different layout
    val again = Profile.termDivergence(docs.repartition(7), "src", "txt", 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(again == js)
  }

  test("temperatureSample flattens source proportions and stays invariant") {
    import graft.operators.Sampling
    // 900-vs-100 imbalance; T=0.5 should lift the small source's share
    val docs = ((1L to 900L).map(i => (i, "big", s"big doc $i")) ++
      (901L to 1000L).map(i => (i, "small", s"small doc $i")))
      .toDF("id", "src", "txt")
    def shares(t: Double): Map[String, Long] =
      Sampling.temperatureSample(docs, "src", col("txt"), t, targetRows = 200L)
        .groupBy(col("src")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val flat = shares(0.5)
    val prop = shares(1.0)
    // proportional sampling keeps ~10% of the sample from 'small';
    // T=0.5 must raise small's share: 100^0.5/(900^0.5+100^0.5) = 25%
    val flatFrac = flat("small").toDouble / (flat("small") + flat("big"))
    val propFrac = prop("small").toDouble / (prop("small") + prop("big"))
    assert(flatFrac > propFrac + 0.05, s"flat=$flatFrac prop=$propFrac")
    // partitioning-invariant and rerun-deterministic
    val again = Sampling.temperatureSample(docs.repartition(11), "src", col("txt"), 0.5, 200L)
      .groupBy(col("src")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == flat)
  }

  test("weightedSample: deterministic, partitioning-invariant, weight-sensitive") {
    import graft.operators.Sampling
    val docs = (1L to 200L).map(i => (i, s"document body number $i")).toDF("id", "txt")
    val hashOn = concat(col("id"), lit(":"), col("txt"))
    def pick(df: org.apache.spark.sql.DataFrame, w: org.apache.spark.sql.Column) =
      Sampling.weightedSample(df, hashOn, w, col("id"), 20)
        .collect().map(_.getLong(0)).toSet
    val base = pick(docs, lit(1.0))
    // partitioning cannot change the draw
    assert(pick(docs.repartition(13), lit(1.0)) == base)
    // k >= n returns everything
    assert(Sampling.weightedSample(docs, hashOn, lit(1.0), col("id"), 500).count() == 200)
    // a huge weight forces selection: key ln(u)/w -> 0- as w grows
    val boosted = pick(docs, when(col("id") === 77L, lit(1e9)).otherwise(lit(1.0)))
    assert(boosted.contains(77L))
    // and the un-boosted draw is a pure content function: rerun identical
    assert(pick(docs, lit(1.0)) == base)
  }

  test("CountMin: one-sided error, unseen-term zero, relational merge") {
    import graft.operators.CountMin
    val a = Seq.fill(30)("alpha") ++ Seq.fill(12)("beta") ++ Seq.fill(5)("gamma")
    val b = Seq.fill(9)("beta") ++ Seq.fill(7)("delta")
    val dfA = a.toDF("term")
    val dfB = b.toDF("term")
    val exact = (a ++ b).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val queries = (exact.keys.toSeq :+ "never_seen").toDF("term")
    // narrow sketch (collisions likely) still never under-counts
    val skAll = CountMin.sketch((a ++ b).toDF("term"), "term", depth = 3, width = 8)
    val est = CountMin.estimate(skAll, queries, "term", depth = 3, width = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) => assert(est(t) >= n, s"under-count for $t") }
    // wide sketch: no collisions among 5 terms, estimates exact and
    // unseen terms answer zero
    val wide = CountMin.sketch((a ++ b).toDF("term"), "term", depth = 4, width = 4096)
    val wideEst = CountMin.estimate(wide, queries, "term", depth = 4, width = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, n) => assert(wideEst(t) == n) }
    assert(wideEst("never_seen") == 0L)
    // merge = union + re-sum: counter tables are element-wise additive
    val merged = CountMin.sketch(dfA, "term", 3, 8)
      .unionByName(CountMin.sketch(dfB, "term", 3, 8))
      .groupBy(col("row"), col("bucket")).agg(sum(col("n")).as("n"))
    val mergedRows = merged.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val allRows = skAll.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mergedRows == allRows)
  }

  test("spanContaminatedBloom equals exact spanContaminated") {
    val run = (1 to 9).map(i => s"q$i").mkString(" ")
    val bench = Seq((100L, s"benchmark question $run answer")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"a training doc that contains $run verbatim inside"),
      (2L, "a clean training document with entirely original content here"),
      (3L, s"short $run"),
      (4L, "q1 q2 q3 q4 q5 q6 q7 only seven of the benchmark tokens")
    ).toDF("doc_id", "text")
    val exact = Dedup.spanContaminated(corpus, bench, "doc_id", "text", 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    // an aggressive fpp stresses the exact-confirm stage: false bloom
    // positives must never survive to the output
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Dedup.spanContaminatedBloom(corpus, bench, "doc_id", "text", 8, fpp)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == exact, s"fpp=$fpp")
    }
  }

  test("SpanHashesPos agrees with SpanHashes on window identity") {
    // removal correctness depends on the positional and distinct-set
    // hashers computing the same hashes from the same boundaries
    val cases = Seq("", "one", "a b", "a b c d e f g h i j",
      "x y x y x y x y x y", ("tok " * 50).trim)
    for (s <- cases; span <- Seq(2, 8)) {
      val posArr = graft.functions.SpanHashesPos.evalUTF8(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), span)
      val posHashes = (0 until posArr.numElements())
        .map(i => posArr.getStruct(i, 2).getLong(0))
      assert(posHashes.toSet ==
        graft.functions.SpanHashes.compute(s, span).toSet, s"'$s' span=$span")
      // positions are 0..nWin-1 in order
      assert((0 until posArr.numElements())
        .forall(i => posArr.getStruct(i, 2).getInt(1) == i))
    }
  }

  test("removeDuplicateSpans cuts the duplicated run from non-keeper docs, " +
      "merging overlapping windows into one cut") {
    val run = (1 to 9).map(i => s"d$i").mkString(" ") // 9 tokens = 2 windows
    val docs = Seq(
      (1L, s"keeper doc holds $run and keeps it"),
      (2L, s"prefix words here $run suffix tail words"),
      (3L, "totally original content with no duplicated runs at all here")
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", spanTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // doc 1 is the keeper for both windows of the run: untouched
    assert(got(1L) == ((s"keeper doc holds $run and keeps it", 0L)))
    // doc 2 loses the 9 covered tokens as ONE merged cut (2 windows union)
    assert(got(2L) == (("prefix words here suffix tail words", 9L)))
    assert(got(3L)._2 == 0L)
  }

  test("removeDuplicateSpans: an exact duplicate doc is fully erased; " +
      "partition-invariant") {
    val body = (1 to 12).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (5L, body), (9L, body), // 9 duplicates 5 entirely
      (7L, "unrelated words forming a completely separate twelve token doc y1 y2")
    ).toDF("doc_id", "text")
    val a = Dedup.removeDuplicateSpans(docs, "doc_id", "text", spanTokens = 8)
    val got = a.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(5L) == ((body, 0L)))   // min id keeps
    assert(got(9L) == (("", 12L)))    // fully covered -> empty
    assert(got(7L)._2 == 0L)
    val b = Dedup.removeDuplicateSpans(docs.repartition(7), "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(b == got)
  }

  // ---- duplicateSubstrings (arbitrary-length suffix-array pass) ----

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("duplicateSubstrings extracts a planted 20-token run at its true " +
      "extent in both docs, not as fixed-n windows") {
    val run = (1 to 20).map(i => s"r$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $run tail one"),          // run at tokens 4..23
      (2L, s"$run completely different closing words"), // run at tokens 1..20
      (3L, "independent filler content with nothing shared across docs here")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSubstrings(docs, "doc_id", "text", minTokens = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got.toSet == Set(
      (1L, 4, 20L, md5Hex(run)),
      (2L, 1, 20L, md5Hex(run))))
  }

  test("duplicateSubstrings: nested shared prefixes report per-doc maximal " +
      "lengths (the arbitrary-length property)") {
    // doc 1 carries the 30-token sequence; docs 2/3 carry its first
    // 22/14 tokens. Every doc's duplicated extent is the longest prefix
    // it shares with SOME other doc: 22 for docs 1+2, 14 for doc 3.
    def pre(n: Int) = (1 to n).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"${pre(30)} doc one unique ending"),
      (2L, s"${pre(22)} second doc distinct tail"),
      (3L, s"${pre(14)} third doc other suffix")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSubstrings(docs, "doc_id", "text", minTokens = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3)))
    assert(got.toSet == Set(
      (1L, 1, 22L, md5Hex(pre(22))),
      (2L, 1, 22L, md5Hex(pre(22))),
      (3L, 1, 14L, md5Hex(pre(14)))))
  }

  test("duplicateSubstrings: two runs split by unique filler stay two " +
      "intervals; within-doc-only repetition is not duplication") {
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val b = (1 to 12).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$a wedge0 wedge1 wedge2 $b"),       // a: 1..10, b: 14..25
      (2L, s"$a other middle words entirely $b"),
      (3L, s"selfrep selfrep selfrep selfrep selfrep selfrep selfrep " +
        "selfrep selfrep selfrep selfrep selfrep only here")
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSubstrings(docs, "doc_id", "text", minTokens = 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1, 10L), (1L, 14, 12L),
      (2L, 1, 10L), (2L, 15, 12L)))
  }

  test("duplicateSubstrings: sub-threshold overlaps, short docs, and NULL " +
      "text produce no rows; partition-invariant") {
    val docs = Seq(
      (1L, Some("five shared toks here plus unique ending one")),
      (2L, Some("five shared toks here plus other closing words")), // 5 < 6
      (3L, Some("tiny")), (4L, None)
    ).toDF("doc_id", "text")
    assert(Dedup.duplicateSubstrings(docs, "doc_id", "text", 6).count() == 0)
    val run = (1 to 9).map(i => s"z$i").mkString(" ")
    val dup = Seq((1L, s"head $run"), (2L, s"$run tails"), (3L, "unrelated"))
      .toDF("doc_id", "text")
    val one = Dedup.duplicateSubstrings(dup, "doc_id", "text", 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val two = Dedup.duplicateSubstrings(dup.repartition(7), "doc_id", "text", 6)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(one == Set((1L, 2, 9L), (2L, 1, 9L)) && two == one)
  }

  test("removeDuplicateSpans: short and empty docs pass through untouched") {
    val docs = Seq((1L, "just three tokens"), (2L, "just three tokens"),
      (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", spanTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // all docs shorter than the span: no windows anywhere, nothing cut
    assert(got == Map(
      1L -> (("just three tokens", 0L)), 2L -> (("just three tokens", 0L)),
      3L -> (("", 0L)), 4L -> (("", 0L))))
  }

  test("spanContaminationReport: normalized mode catches the case-variant " +
      "near-miss exact mode skips, with the right overlap fractions") {
    val run = (1 to 9).map(i => s"w$i").mkString(" ") // 9 shared tokens
    val bench = Seq((100L, s"benchmark question $run answer")).toDF("doc_id", "text")
    val caseVariant = run.split(' ').map(_.capitalize).mkString(", ")
    val corpus = Seq(
      (1L, s"training doc containing $run verbatim"), // exact hit
      (2L, s"punctuated copy: $caseVariant!"),        // hit only after norm
      (3L, "clean original content with its own twelve completely fresh tokens here now")
    ).toDF("doc_id", "text")
    // exact mode: only doc 1 flagged (legacy spanContaminated behavior)
    val exact = Dedup.spanContaminated(corpus, bench, "doc_id", "text", 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(exact == Seq(1L))
    // normalized mode flags both; fractions are hits over distinct windows
    val rep = Dedup.spanContaminationReport(corpus, bench, "doc_id", "text",
        spanTokens = 8, minOverlapFrac = 0.2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(4)))).toMap
    // doc 1: "training doc containing w1..w9 verbatim" = 13 tokens -> 6
    // windows; the 2 windows inside w1..w9 hit
    assert(rep(1L) == ((6L, 2L, true)))
    // doc 2 normalized = "punctuated copy w1 ... w9" = 11 tokens -> 4
    // windows, the 2 all-inside-the-run windows hit
    assert(rep(2L) == ((4L, 2L, true)))
    assert(rep(3L)._2 == 0L && !rep(3L)._3)
    // exact mode via the report API agrees with spanContaminated
    val repExact = Dedup.spanContaminationReport(corpus, bench, "doc_id",
        "text", spanTokens = 8, minOverlapFrac = 0.2, normalize = false)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(repExact(1L) > 0L && repExact(2L) == 0L)
  }

  test("spanContaminationReport is partitioning-invariant and flags at " +
      "exactly the threshold") {
    val run = (1 to 8).map(i => s"t$i").mkString(" ")
    val bench = Seq((9L, s"the bench holds $run only")).toDF("doc_id", "text")
    val corpus = (1L to 12L).map { i =>
      (i, if (i % 3 == 0) s"doc $i has $run plus " + (1 to 20).map(j => s"f${i}_$j").mkString(" ")
          else s"doc $i entirely clean " + (1 to 26).map(j => s"c${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val a = Dedup.spanContaminationReport(corpus, bench, "doc_id", "text", 8, 0.02)
    val b = Dedup.spanContaminationReport(corpus.repartition(7),
      bench.repartition(2), "doc_id", "text", 8, 0.02)
    assert(a.collect().toSet == b.collect().toSet)
    val flagged = a.filter(col("contaminated")).collect().map(_.getLong(0)).sorted.toSeq
    assert(flagged == Seq(3L, 6L, 9L, 12L))
    // threshold is inclusive: a doc with frac exactly minOverlapFrac flags
    val f = a.filter(col("doc_id") === 3L).head()
    val frac = f.getLong(2).toDouble / f.getLong(1)
    assert(frac >= 0.02 && f.getBoolean(4))
  }

  test("spanContaminated is partitioning-invariant") {
    val run = (1 to 9).map(i => s"q$i").mkString(" ")
    val bench = Seq((100L, s"benchmark $run end")).toDF("doc_id", "text")
    val corpus = (1L to 20L).map { i =>
      (i, if (i % 4 == 0) s"doc $i contains $run inline" else s"doc $i clean original content words")
    }.toDF("doc_id", "text")
    val a = Dedup.spanContaminated(corpus, bench, "doc_id", "text", 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = Dedup.spanContaminated(corpus.repartition(7), bench.repartition(3),
        "doc_id", "text", 8)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b && a == Seq(4L, 8L, 12L, 16L, 20L))
  }

  test("spanPairs: docs shorter than the span yield no windows, no crash") {
    val docs = Seq((1L, "just three tokens"), (2L, "just three tokens"),
      (3L, ""), (4L, "   ")).toDF("doc_id", "text")
    assert(Dedup.spanPairs(docs, "doc_id", "text", spanTokens = 8).count() == 0)
  }

  test("spanPairs maxDf drops corpus-wide boilerplate spans") {
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")
    // every doc carries the boilerplate span; only 1 and 2 share real content
    val real = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = (1L to 6L).map { i =>
      val body = if (i <= 2) real else s"unique$i " + (1 to 7).map(j => s"u${i}_$j").mkString(" ")
      (i, s"$boiler $body")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.spanPairs(docs, "doc_id", "text", spanTokens = 8,
        maxDf = 0) // explicit opt-out (the default caps at 1000)
      .count()
    assert(uncapped == 15, "uncapped: all 6-choose-2 pairs via boilerplate")
    val capped = Dedup.spanPairs(docs, "doc_id", "text", spanTokens = 8, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq == Seq((1L, 2L)), "capped: only the real shared content")
  }

  // ---- cluster resolution -> canonical keep ----

  test("keepCanonical keeps min-id per cluster and passes untouched docs") {
    val docs = (1L to 6L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a_id", "b_id")
    val kept = Dedup.keepCanonical(docs, pairs, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // cluster {1,2,3} -> keep 1; {5,6} -> keep 5; 4 untouched
    assert(kept == Seq(1L, 4L, 5L))
  }

  // ---- incremental dedup ----

  test("incrementalDedup drops corpus-known and in-batch duplicate texts") {
    val corpus = Seq((1L, "known text"), (2L, "other known")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "known  text"),   // dup of corpus doc 1 modulo whitespace
      (11L, "fresh content"),
      (12L, "fresh content"), // in-batch dup, higher id loses
      (13L, "more new stuff")
    ).toDF("doc_id", "text")
    val kept = Dedup.incrementalDedup(batch, corpus, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(11L, 13L))
  }

  // ---- table profile ----

  test("Profile.exact computes per-column null/distinct/bounds in one scan") {
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, None, 10),
      (3L, Some("c"), 30)
    ).toDF("id", "s", "v")
    val p = Profile.exact(df, Seq("id", "s", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq.sortBy(_._1)
    assert(p == Seq(
      ("id", 3L, 0L, 3L, "1", "3"),
      ("s", 3L, 1L, 2L, "a", "c"),
      ("v", 3L, 0L, 2L, "10", "30")))
    // one-pass contract: a single scan of the input feeds the profile
    val scans = Profile.exact(df, Seq("id", "s", "v"))
      .queryExecution.executedPlan.collectLeaves().size
    assert(scans == 1, s"profile must read the table once, saw $scans scans")
  }

  test("Profile.approx matches exact on a small table (HLL exact regime)") {
    val df = Seq((1L, "x"), (2L, "y"), (3L, "y")).toDF("id", "s")
    val ex = Profile.exact(df, Seq("id", "s")).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    val ap = Profile.approx(df, Seq("id", "s")).collect()
      .map(r => (r.getString(0), r.getLong(3))).toMap
    assert(ex == ap)
  }

  // ---- product quantization (IVF-PQ ANN) ----

  test("PqEncode matches a driver-side reference bit-exactly") {
    import graft.functions.PqEncode
    val rnd = new scala.util.Random(7)
    val m = 4; val ksub = 5; val sub = 3
    val books: Seq[Seq[Seq[Double]]] =
      Seq.fill(m)(Seq.fill(ksub)(Seq.fill(sub)(rnd.nextGaussian())))
    val vecs = (0L until 40L).map(i => (i, Seq.fill(m * sub)(rnd.nextGaussian())))
    val got = vecs.toDF("id", "v")
      .select(col("id"), PqEncode.pqEncode(col("v"), books).as("pq"))
      .select(col("id"), col("pq.codes"), col("pq.recon_norm"))
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Int](1).toSeq, r.getDouble(2))).toMap
    for ((id, v) <- vecs) {
      val codes = (0 until m).map { j =>
        val slice = v.slice(j * sub, (j + 1) * sub)
        (0 until ksub).minBy { c =>
          val cent = books(j)(c)
          var n2 = 0.0; var d = 0.0
          for (t <- 0 until sub) { n2 += cent(t) * cent(t); d += slice(t) * cent(t) }
          n2 - 2.0 * d
        }
      }
      val norm = math.sqrt((0 until m).map { j =>
        books(j)(codes(j)).map(x => x * x).sum
      }.sum)
      assert(got(id)._1 == codes, s"codes differ for vec $id")
      assert(got(id)._2 == norm, s"recon_norm differs for vec $id")
    }
  }

  test("PqAdcDot equals the dot against the materialized reconstruction") {
    import graft.functions.{PqAdcDot, PqEncode}
    val rnd = new scala.util.Random(13)
    val m = 8; val ksub = 16; val sub = 4
    val books: Seq[Seq[Seq[Double]]] =
      Seq.fill(m)(Seq.fill(ksub)(Seq.fill(sub)(rnd.nextGaussian())))
    val q = Seq.fill(m * sub)(rnd.nextGaussian())
    val vecs = (0L until 20L).map(i => (i, Seq.fill(m * sub)(rnd.nextGaussian())))
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        PqAdcDot.pqAdcDot(
          typedLit(q), PqEncode.pqEncode(col("v"), books).getField("codes"),
          books).as("adc"),
        PqEncode.pqEncode(col("v"), books).getField("codes").as("codes"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Int](2).toSeq))
    for ((id, adc, codes) <- got) {
      // reference: per-subspace sequential dots, accumulated in j order —
      // the identical float op sequence, so equality is exact
      var ref = 0.0
      for (j <- 0 until m; t <- 0 until sub)
        ref += q(j * sub + t) * books(j)(codes(j))(t)
      assert(adc == ref, s"ADC dot differs for vec $id")
    }
  }

  test("trainPqCodebooks: deterministic, partition-invariant, dim-checked") {
    val b1 = Similarity.trainPqCodebooks(plantedVectors, "vec_id", "embedding",
      m = 4, ksub = 8, lloydIters = 2)
    val b2 = Similarity.trainPqCodebooks(plantedVectors.repartition(7),
      "vec_id", "embedding", m = 4, ksub = 8, lloydIters = 2)
    assert(b1 == b2, "codebooks must not depend on partitioning")
    assert(b1.length == 4 && b1.forall(_.length == 8)
      && b1.forall(_.forall(_.length == 8)))
    // dim 32 does not split into 5 subspaces
    intercept[IllegalArgumentException] {
      Similarity.trainPqCodebooks(plantedVectors, "vec_id", "embedding",
        m = 5, ksub = 4)
    }
    // empty corpus -> empty codebooks; serve path returns empty frame
    val empty = plantedVectors.filter(col("vec_id") < 0)
    assert(Similarity.trainPqCodebooks(empty, "vec_id", "embedding").isEmpty)
    assert(Similarity.ivfTopKPq(empty, "vec_id", "embedding", _ < 5, k = 3)
      .count() == 0)
  }

  test("ivfTopKPq finds planted near-dups; serve equals per-call training") {
    val top = Similarity.ivfTopKPq(plantedVectors, "vec_id", "embedding",
        queryIds = _ < 5, k = 3, nCentroids = 4, nProbe = 2,
        m = 4, ksub = 8, shortlist = 20)
      .filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- 0L until 5L)
      assert(top(i) == 100L + i, s"query $i: expected planted dup, got ${top(i)}")
    val coarse = Similarity.trainIvfCentroids(plantedVectors, "vec_id",
      "embedding", nCentroids = 4, lloydIters = 2)
    val books = Similarity.trainPqCodebooks(plantedVectors, "vec_id",
      "embedding", m = 4, ksub = 8, lloydIters = 2)
    val served = Similarity.ivfTopKPqServe(plantedVectors, "vec_id",
        "embedding", queryIds = _ < 5, k = 3, coarse, books,
        nProbe = 2, shortlist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val trainedPerCall = Similarity.ivfTopKPq(plantedVectors, "vec_id",
        "embedding", queryIds = _ < 5, k = 3, nCentroids = 4, nProbe = 2,
        m = 4, ksub = 8, shortlist = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(served == trainedPerCall,
      "frozen-codebook serving must equal per-call training")
  }

  test("PQ Lloyd refinement does not worsen quantization distortion") {
    import graft.functions.PqEncode
    def distortion(iters: Int): Double = {
      val books = Similarity.trainPqCodebooks(plantedVectors, "vec_id",
        "embedding", m = 4, ksub = 8, lloydIters = iters)
      val sub = 8
      plantedVectors
        .select(col("embedding").cast("array<double>").as("v"),
          PqEncode.pqEncode(col("embedding").cast("array<double>"), books)
            .getField("codes").as("codes"))
        .collect().map { r =>
          val v = r.getSeq[Double](0); val codes = r.getSeq[Int](1)
          (0 until 4).map { j =>
            val cent = books(j)(codes(j))
            (0 until sub).map(t => math.pow(v(j * sub + t) - cent(t), 2)).sum
          }.sum
        }.sum
    }
    assert(distortion(2) <= distortion(0) + 1e-9,
      "Lloyd iterations must not increase total squared error")
  }

  // ---- quality classifier (NB log-odds) ----

  test("QualityClassifier matches hand-computed log-odds on a fixture") {
    import graft.operators.QualityClassifier
    // positive seed: docs 1,2; negative: 3,4. Vocabulary {good, bad, meh}.
    val docs = Seq(
      (1L, "good good meh", true),
      (2L, "good", true),
      (3L, "bad bad meh", false),
      (4L, "bad", false)).toDF("doc_id", "text", "seed")
    val table = QualityClassifier
      .tokenLogOdds(docs, "doc_id", "text", col("seed"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // totals: pos=4 tokens, neg=4 tokens, vocab=3
    def lo(p: Long, n: Long): Double =
      BigDecimal(math.log((p + 1.0) / 7.0) - math.log((n + 1.0) / 7.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(table("good") == ((3L, 0L, lo(3, 0))))
    assert(table("bad") == ((0L, 3L, lo(0, 3))))
    assert(table("meh") == ((1L, 1L, 0.0)))
    val scores = QualityClassifier
      .score(docs, "doc_id", "text", col("seed"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // doc 1: (2*lo(good) + 1*0.0) / 3 ; doc 4: lo(bad) < 0 => dropped
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(scores(1L) == ((3L, r4(2 * lo(3, 0) / 3), true)))
    assert(scores(2L) == ((1L, r4(lo(3, 0)), true)))
    assert(scores(4L) == ((1L, r4(lo(0, 3)), false)))
    // adding a negative meh-only doc RETRAINS the table (meh becomes
    // negative evidence: cf 1 vs 2, totals 4 vs 5) — the score must
    // reflect the new corpus, not a stale table
    val neutral = Seq((9L, "meh", false)).toDF("doc_id", "text", "seed")
    val all = docs.unionByName(neutral)
    val s9 = QualityClassifier.score(all, "doc_id", "text", col("seed"))
      .filter(col("doc_id") === 9L).collect().head
    val mehRetrained = BigDecimal(
        math.log(2.0 / 7.0) - math.log(3.0 / 8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s9.getDouble(2) == r4(mehRetrained) && !s9.getBoolean(3))
  }

  test("QualityClassifier drops empty docs and broadcasts the token table") {
    import graft.operators.QualityClassifier
    val docs = Seq(
      (1L, "alpha beta", true),
      (2L, "", false),
      (3L, "   ", false),
      (4L, "alpha", false)).toDF("doc_id", "text", "seed")
    val out = QualityClassifier.score(docs, "doc_id", "text", col("seed"))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    // scoring join must broadcast the vocabulary-sized table, never
    // shuffle the corpus side
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
