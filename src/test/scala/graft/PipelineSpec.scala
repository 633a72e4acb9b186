package graft

import graft.operators.Pipeline

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val english =
    "the cat and the dog are in the house with all of it " * 3

  test("sampleSplit assigns deterministic hash buckets and splits") {
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Pipeline.sampleSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // deterministic: recompute expected buckets directly
    out.foreach { case (id, bucket, split) =>
      val expected = java.lang.Math.floorMod(id * 2654435761L, 100L)
      assert(bucket === expected)
      val expSplit = if (bucket < 80) "train" else if (bucket < 90) "val" else "test"
      assert(split === expSplit)
    }
    // roughly 80/10/10 (hash spread, not exact)
    val counts = out.groupBy(_._3).view.mapValues(_.length).toMap
    assert(counts("train") > 140 && counts("test") > 5 && counts("val") > 5)
    // stability: a second run over a superset never reassigns old ids
    val more = (0L until 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val again = Pipeline.sampleSplit(more).collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    out.foreach { case (id, _, split) => assert(again(id) === split) }
  }

  test("docPack cuts shard-local batches at the token budget") {
    val docs = Seq(
      (0L, "a b c"),       // 3 tokens
      (32L, "d e f g"),    // same shard as 0 (hash is mod-32 of id*const; 0 and 32 share id%32... verify via output)
      (1L, "h i j k l"))
      .toDF("doc_id", "text")
    val out = Pipeline.docPack(docs, budget = 5, shards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // every row: cum is a within-shard running sum in doc_id order;
    // pack boundary at every 5 cumulative tokens
    val byShard = out.groupBy(_._2)
    byShard.values.foreach { rows =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, c, p) =>
        cum += n
        assert(c === cum)
        assert(p === (math.max(cum, 1) - 1) / 5)
      }
    }
    // zero-token doc lands in a valid batch (no -1)
    val zo = Pipeline.docPack(Seq((7L, "   ")).toDF("doc_id", "text"), budget = 5).collect()(0)
    assert(zo.getAs[Long]("n_tokens") === 0L)
    assert(zo.getAs[Long]("pack_id") === 0L)
  }

  test("corpusFilter keeps high-quality english survivors, min-id per duplicate") {
    val docs = Seq(
      (1L, english),                 // keeper (duplicate group, min id)
      (2L, english),                 // exact dup of 1 → dropped
      (3L, "zzz qqq"),               // lang 'und' → dropped
      (4L, "el perro y la casa de los gatos para que " * 5), // spanish → dropped
      (5L, english + " extra tail")) // distinct english keeper
      .toDF("doc_id", "text")
    val out = Pipeline.corpusFilter(docs, minQuality = 0.1, lang = "en")
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(1L, 5L))
  }

  test("piiRedact scrubs planted emails, IPs and phone numbers with counts") {
    val docs = Seq(
      (1L, "contact alice@example.com or bob.smith+x@mail.co today"),
      (2L, "server at 192.168.1.254 and 10.0.0.1 responded"),
      (3L, "call 555-867-5309 or 555 123 4567 now"),
      (4L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = Pipeline.piiRedact(docs).collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Long]("n_emails") === 2L)
    assert(out(0).getAs[String]("redacted") === "contact <EMAIL> or <EMAIL> today")
    assert(out(1).getAs[Long]("n_ips") === 2L)
    assert(out(1).getAs[String]("redacted") === "server at <IP> and <IP> responded")
    assert(out(2).getAs[Long]("n_phones") === 2L)
    assert(out(2).getAs[String]("redacted") === "call <PHONE> or <PHONE> now")
    assert(out(3).getAs[String]("redacted") === "no pii here at all")
    assert(out(3).getAs[Long]("n_emails") + out(3).getAs[Long]("n_ips") +
      out(3).getAs[Long]("n_phones") === 0L)
  }

  test("stratifiedSample is deterministic, per-lang rated, and rerun-stable") {
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val out = Pipeline.stratifiedSample(docs).collect()
    // membership replays the hash rule exactly
    out.foreach { r =>
      val (id, lang, bucket) = (r.getLong(0), r.getString(1), r.getLong(2))
      assert(bucket === math.floorMod(id * 2654435761L, 1000L))
      assert(bucket < (if (lang == "en") 500 else 200))
    }
    // rates land near the target per stratum (hash-uniform)
    val en = out.count(_.getString(1) == "en").toDouble / 500
    val de = out.count(_.getString(1) == "de").toDouble / 500
    assert(math.abs(en - 0.5) < 0.1, s"en rate $en")
    assert(math.abs(de - 0.2) < 0.1, s"de rate $de")
    // adding documents never reassigns existing ones
    val again = Pipeline.stratifiedSample(docs.limit(100)).collect().map(_.getLong(0)).toSet
    assert(again.subsetOf(out.map(_.getLong(0)).toSet ++ (100L until 1000L)))
  }

  test("lengthHistogram buckets cover every doc with consistent bounds") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Pipeline.lengthHistogram(docs).collect()
    assert(out.map(_.getAs[Long]("n_docs")).sum === docs.count())
    out.foreach { r =>
      val (b, lo, hi) = (r.getAs[Long]("bucket"), r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens"))
      assert(lo >= b * 16 && hi < (b + 1) * 16 && lo <= hi)
    }
  }

  test("repetitionScore flags repeated bigrams, nulls docs without bigrams") {
    val docs = Seq(
      (1L, "a b a b a b"),      // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "all distinct words here"),
      (3L, "solo"))             // no bigrams
      .toDF("doc_id", "text")
    val out = Pipeline.repetitionScore(docs).collect()
    val d1 = out(0)
    assert(d1.getAs[Long]("n_bigrams") === 5L && d1.getAs[Long]("n_distinct") === 2L)
    assert(math.abs(d1.getAs[Double]("rep_ratio") - 0.6) < 1e-9)
    assert(out(1).getAs[Double]("rep_ratio") === 0.0)
    assert(out(2).isNullAt(out(2).fieldIndex("rep_ratio")))
  }

  test("tokenDfQuality: unique vocabulary scores mean_df 1, shared boilerplate higher") {
    val docs = Seq(
      (1L, "aardvark bungalow cataclysm"),   // tokens unique to doc 1
      (2L, "common words here"),
      (3L, "common words there"))
      .toDF("doc_id", "text")
    val out = Pipeline.tokenDfQuality(docs).collect().sortBy(_.getLong(0))
    assert(out(0).getAs[Double]("mean_df") === 1.0)
    assert(out(0).getAs[Long]("n_distinct_tokens") === 3L)
    // docs 2/3 share "common"+"words" (df 2) plus one unique token (df 1) → (2+2+1)/3
    assert(math.abs(out(1).getAs[Double]("mean_df") - 5.0 / 3) < 1e-6)
    assert(math.abs(out(2).getAs[Double]("mean_df") - 5.0 / 3) < 1e-6)
  }

  test("tfidfTopK ranks rare high-tf terms above shared boilerplate") {
    val docs = Seq(
      (1L, "zebra zebra zebra the the"),  // zebra: tf 3 df 1; the: tf 2 df 3
      (2L, "the quick fox"),
      (3L, "the slow fox"))
      .toDF("doc_id", "text")
    val out = Pipeline.tfidfTopK(docs, 2).collect()
    val d1 = out.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    // n_docs=3: zebra score 3·(3_000_000 div 1)=9_000_000;
    // the score 2·(3_000_000 div 3)=2_000_000
    assert(d1(0).getAs[String]("tok") === "zebra")
    assert(d1(0).getAs[Long]("score") === 9000000L)
    assert(d1(1).getAs[String]("tok") === "the")
    assert(d1(1).getAs[Long]("score") === 2000000L)
    // doc 2: quick/fox both tf 1; fox df 2 (1_500_000) > quick? quick df 1
    // → quick 3_000_000 first, fox 1_500_000 second
    val d2 = out.filter(_.getLong(0) == 2L).sortBy(_.getLong(1))
    assert(d2(0).getAs[String]("tok") === "quick")
    assert(d2(1).getAs[String]("tok") === "fox")
    // k bounds output per doc
    assert(out.groupBy(_.getLong(0)).values.forall(_.length <= 2))
  }

  test("hashEmbed matches the reference hashing-trick computation") {
    val docs = Seq((1L, "alpha beta alpha"), (2L, "Gamma  gamma"), (3L, ""))
      .toDF("doc_id", "text")
    val out = Pipeline.hashEmbed(docs, dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    def strHash(s: String): Long =
      s.foldLeft(0L)((h, c) => (h * 31 + c) % 2147483647L)
    def expected(tokens: Seq[String], dim: Int): Map[Long, Long] =
      tokens.map(strHash).groupBy(_ % dim)
        .map { case (d, hs) => d -> hs.map(h => if ((h / dim) % 2 == 0) 1L else -1L).sum }
        .filter(_._2 != 0)

    val got1 = out.filter(_._1 == 1L).map(r => r._2 -> r._3).toMap
    assert(got1 === expected(Seq("alpha", "beta", "alpha"), 8))

    // lowercasing folds Gamma/gamma together: one dim, weight ±2
    val got2 = out.filter(_._1 == 2L).map(r => r._2 -> r._3).toMap
    assert(got2 === Map(strHash("gamma") % 8 -> (if ((strHash("gamma") / 8) % 2 == 0) 2L else -2L)))

    // empty doc contributes nothing
    assert(!out.exists(_._1 == 3L))
  }

  test("source_stats counts docs/tokens and corpus-wide duplicate fractions per source") {
    val docs = Seq(
      (1L, "same text", "en", "web"),
      (2L, "same text", "en", "books"),   // cross-source exact dup
      (3L, "unique alpha beta", "en", "web"),
      (4L, "otro texto", "es", "web"))
      .toDF("doc_id", "text", "lang", "source")
    val out = graft.operators.Pipeline.sourceStats(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out === Map(
      ("books", "en") -> ((1L, 2L, 1L, 1.0)),
      ("web", "en") -> ((2L, 5L, 1L, 0.5)),
      ("web", "es") -> ((1L, 2L, 0L, 0.0))))
  }

  test("bm25_topk ranks by overlap with saturation, excludes self and no-overlap docs") {
    val docs = Seq(
      (0L, "apple banana cherry"),
      (1L, "apple banana cherry"),          // identical to the query
      (2L, "apple banana"),                 // 2 of 3 terms
      (3L, "apple xyz qqq www uvw rst"),    // 1 term, longer doc (length-normalized down)
      (4L, "zzz yyy"))                      // no overlap
      .toDF("doc_id", "text")
    val out = graft.operators.Pipeline.bm25TopK(docs, Seq(0L), k = 10)
      .collect().map(r => (r.getLong(2), r.getLong(1), r.getLong(3)))
    val ranked = out.map(_._1).toSeq
    assert(ranked === Seq(1L, 2L, 3L))      // self (0) and no-overlap (4) absent
    // scores strictly ordered, all positive integers
    val scores = out.map(_._3).toSeq
    assert(scores === scores.sorted.reverse && scores.forall(_ > 0))
  }

  test("chunkDedup drops later copies of a repeated chunk, keeps the first") {
    // chunkTokens=2: doc0 chunks ["a b","c d"], doc1 ["a b","x y"],
    // doc2 ["c d"] — doc1's "a b" and doc2's "c d" are later copies.
    val docs = Seq(
      (0L, "a b c d"),
      (1L, "a b x y"),
      (2L, "c d"))
      .toDF("doc_id", "text")
    val out = Pipeline.chunkDedup(docs, chunkTokens = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (0L, 2L, 2L, "a b c d"),
      (1L, 2L, 1L, "x y"),
      (2L, 1L, 0L, "")))
  }

  test("chunkDedup: a trailing partial chunk is its own unit") {
    val docs = Seq((7L, "p q r")).toDF("doc_id", "text")
    val out = Pipeline.chunkDedup(docs, chunkTokens = 2).collect()(0)
    assert(out.getLong(1) === 2L && out.getString(3) === "p q r")
  }

  test("invertedIndex builds sorted df-capped postings") {
    val docs = Seq(
      (3L, "apple banana"),
      (1L, "apple apple cherry"), // repeated token counts once per doc
      (2L, "apple"))
      .toDF("doc_id", "text")
    val out = Pipeline.invertedIndex(docs, maxDf = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // apple df=3 exceeds the cap and is dropped; postings sorted by id
    assert(out.toSeq === Seq(("banana", 1L, "3"), ("cherry", 1L, "1")))
    val uncapped = Pipeline.invertedIndex(docs, maxDf = 10).collect()
      .map(r => (r.getString(0), r.getString(2))).toMap
    assert(uncapped("apple") === "1,2,3")
  }

  test("pmiBigrams ranks tight collocations above chance pairings") {
    // "hong kong" always adjacent; "the x" pairs dilute across partners
    val docs = (0L until 10L).map(i =>
      (i, s"hong kong the a$i the b$i hong kong")).toDF("doc_id", "text")
    val out = Pipeline.pmiBigrams(docs, minCount = 5L, k = 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.nonEmpty)
    // top pair is the exclusive collocation, with both occurrences counted
    assert((out(0)._2, out(0)._3) === ("hong", "kong") && out(0)._4 === 20L)
    // single-token and sub-minCount pairs never appear
    assert(out.forall(_._4 >= 5L))
  }

  test("lmScore averages integer bigram conditional-probability ppms") {
    val docs = Seq((0L, "a b"), (1L, "a b"), (2L, "a c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val out = Pipeline.lmScore(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // unigrams a:3 b:2 c:1; bigram (a,b):2 (a,c):1
    // p(b|a) = 2e6 div 3 = 666666 ppm; p(c|a) = 1e6 div 3 = 333333 ppm
    assert(out.toSeq === Seq((0L, 1L, 666666L), (1L, 1L, 666666L), (2L, 1L, 333333L)))
    // single-token doc has no bigram and drops out (absent, not null)
  }

  test("mixtureSample hits per-mille targets via deterministic hash thresholds") {
    val docs = (0L until 3000L).map(i =>
      (i, s"text $i", "en", s"src${i % 3}")).toDF("doc_id", "text", "lang", "source")
    // src0: 100‰ of 3000 = 300 wanted of 1000 avail → rate 300000 ppm
    // src2: 600‰ = 1800 wanted of 1000 avail → capped at keep-all
    val out = Pipeline.mixtureSample(docs, Map("src0" -> 100, "src2" -> 600)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4)))
    assert(out.forall(t => t._2 != "src1"))          // unlisted source dropped
    val bySrc = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc("src2") === 1000)                   // cap = keep everything
    assert(math.abs(bySrc("src0") - 300) < 60)       // hash spread around target
    // membership is a pure function of doc_id: recompute the threshold
    out.filter(_._2 == "src0").foreach { case (id, _, bucket, rate) =>
      assert(bucket === java.lang.Math.floorMod(id * 2654435761L, 1000000L))
      assert(rate === 300000L && bucket < rate)
    }
  }

  test("globalShuffle: a permutation, reproducible per seed, re-dealt across seeds") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val e1 = Pipeline.globalShuffle(docs, nShards = 8, seed = 1L).collect()
    // every doc appears once; within a shard, positions are 1..count
    assert(e1.map(_.getLong(0)).toSet === (0L until 200L).toSet)
    e1.groupBy(_.getAs[Long]("shard")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // same seed → identical deal; different seed → a different one
    val e1b = Pipeline.globalShuffle(docs, nShards = 8, seed = 1L).collect()
    assert(e1.map(_.toSeq).toSeq === e1b.map(_.toSeq).toSeq)
    val e2 = Pipeline.globalShuffle(docs, nShards = 8, seed = 2L).collect()
    assert(e1.map(r => r.getLong(0) -> r.getAs[Long]("skey")).toMap !==
      e2.map(r => r.getLong(0) -> r.getAs[Long]("skey")).toMap)
  }

  test("qualitySignals: five signals in one scan, gate composes them") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over a lazy dog while the bright sun " +
        "rises and the wind blows gently across this quiet field as morning " +
        "light spreads to every corner of that peaceful town in early spring"), // en, clean
      (2L, "spam spam spam spam spam spam"),                               // repetitive, und
      (3L, "")                                                             // empty
    ).toDF("doc_id", "text")
    val out = Pipeline.qualitySignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("lang_guess") === "en")
    assert(out(1L).getAs[Boolean]("pass_gate"))
    assert(out(2L).getAs[Double]("rep_ratio") > 0.5)   // 4 of 5 bigrams repeat
    assert(!out(2L).getAs[Boolean]("pass_gate"))
    assert(out(3L).getAs[Long]("n_ws_tokens") === 0L)
    assert(!out(3L).getAs[Boolean]("pass_gate"))
    // the whole table is one scan + project: only the presentation
    // sort may exchange — the signals themselves shuffle nothing
    val plan = Pipeline.qualitySignals(docs).queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.trim.startsWith("+- Exchange")) <= 1, plan)
  }

  test("ks_drift: identical samples score D=0, disjoint samples score D=1") {
    val same = (1 to 40).map { i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", 100L + (i % 5))
    }.toDF("doc_id", "source", "n_chars")
    val r0 = Pipeline.ksDrift(same, "a", "b").collect()(0)
    assert(r0.getAs[Double]("d_stat") === 0.0)
    assert(!r0.getAs[Boolean]("drift"))

    val apart = ((1 to 20).map(i => (i.toLong, "a", 100L + i)) ++
      (21 to 40).map(i => (i.toLong, "b", 1000L + i)))
      .toDF("doc_id", "source", "n_chars")
    val r1 = Pipeline.ksDrift(apart, "a", "b").collect()(0)
    assert(r1.getAs[Double]("d_stat") === 1.0)   // fully separated ECDFs
    assert(r1.getAs[Long]("n1") === 20L && r1.getAs[Long]("n2") === 20L)
    assert(r1.getAs[Boolean]("drift"))
  }

  test("weighted_sample: deterministic top-k per source, ordered by key") {
    val docs = (1 to 60).map { i =>
      (i.toLong, s"src${i % 2}", 50L + i * 7 % 400)
    }.toDF("doc_id", "source", "n_chars")
    val a = Pipeline.weightedSample(docs, k = 5).collect()
    val b = Pipeline.weightedSample(docs, k = 5).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq) // replayable
    assert(a.length === 10)
    Seq("src0", "src1").foreach { s =>
      val rows = a.filter(_.getAs[String]("source") == s)
      assert(rows.map(_.getAs[Long]("rk")).toSeq === (1L to 5L))
      val keys = rows.map(_.getAs[Double]("skey")).toSeq
      assert(keys === keys.sorted.reverse) // rank follows the E-S key
    }
  }

  test("weighted_sample: a vastly heavier doc beats a uniform field") {
    // One 10^6-char doc among 1-char docs: its key ln(u)/w is ~0 (the
    // maximum possible); any 1-char doc needs u > e^{-1e-6·|ln u_h|} —
    // effectively u ≈ 1 — to beat it. With this fixed hash none does.
    val docs = ((1 to 30).map(i => (i.toLong, "s", 1L)) :+ (31L, "s", 1000000L))
      .toDF("doc_id", "source", "n_chars")
    val top = Pipeline.weightedSample(docs.toDF("doc_id", "source", "n_chars"), k = 1).collect()
    assert(top.length === 1)
    assert(top(0).getAs[Long]("doc_id") === 31L)
  }
}
