package graft

import org.apache.spark.sql.functions._
import graft.curate.{Curation, UrlCanon}

/** Curation operators: stratified sampling, sequence packing, token top-k. */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("URL canonicalization collapses every spelling variant to one normal form") {
    val cases = Seq(
      // case, www., default port, fragment, trailing slash, utm params, param order
      "HTTPS://WWW.Site.Example.COM:443/a/b/?utm_source=x&ref=1&b=2#frag"
        -> "https://site.example.com/a/b?b=2&ref=1",
      "https://site.example.com/a/b?b=2&ref=1"
        -> "https://site.example.com/a/b?b=2&ref=1",
      "http://host.io:80/p" -> "http://host.io/p",
      // non-default port survives; fbclid/gclid dropped; empty query -> no '?'
      "https://h.io:8443/x?fbclid=abc&gclid=z" -> "https://h.io:8443/x",
      "https://h.io" -> "https://h.io")
    val got = cases.map(_._1).toDF("url")
      .select(col("url"), UrlCanon.canonicalize(col("url")).as("canon"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (raw, want) =>
      assert(got(raw) === want, s"canon($raw)")
    }
  }

  test("chunk plan covers every token exactly and never emits a redundant tail") {
    import graft.text.Chunker
    // n = 10 (<= window), 32 (== window), 33, 56, 80, 81 tokens
    val cases = Seq(10, 32, 33, 56, 80, 81).zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"t$t").mkString(" "))
    }
    val plan = Chunker.chunkPlan(cases.toDF("doc_id", "text"), "text", "doc_id", 32, 24)
      .collect().groupBy(_.getLong(0))
    val wantChunks = Map(0L -> 1, 1L -> 1, 2L -> 2, 3L -> 2, 4L -> 3, 5L -> 4)
    cases.foreach { case (id, text) =>
      val n = text.split(" ").length
      val rows = plan(id).sortBy(_.getAs[Long]("tok_start"))
      assert(rows.length === wantChunks(id), s"doc $id (n=$n) chunk count")
      // starts are multiples of stride; last chunk reaches exactly n
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("tok_start") === 24L * i)
        assert(r.getAs[Long]("chunk_idx") === i.toLong)
      }
      val last = rows.last
      assert(last.getAs[Long]("tok_start") + last.getAs[Long]("chunk_len") === n.toLong)
      assert(rows.forall(_.getAs[Long]("chunk_len") <= 32L))
    }
  }

  test("snapshot diff classifies added/removed/changed and drops unchanged") {
    import graft.stats.SnapshotDiff
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "payload")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("id", "payload")
    val got = SnapshotDiff.diff(old, neu, "id", Seq("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("sampleBucket is deterministic, uniform-ish, and overflow-safe at huge ids") {
    val ids = Seq(0L, 1L, 999999999999L, Long.MaxValue / 2).toDF("id")
    val a = ids.select(Curation.sampleBucket(col("id")).as("b")).collect().map(_.getLong(0))
    val b = ids.select(Curation.sampleBucket(col("id")).as("b")).collect().map(_.getLong(0))
    assert(a.sameElements(b))
    assert(a.forall(x => x >= 0 && x < 1000))
    // uniformity: over a dense id range, each decile gets 8–12%
    val n = 10000L
    val buckets = spark.range(n)
      .select((Curation.sampleBucket(col("id")) / 100).cast("int").as("d"))
      .groupBy("d").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    (0 until 10).foreach { d =>
      val c = buckets.getOrElse(d, 0L)
      assert(c > n / 10 * 8 / 10 && c < n / 10 * 12 / 10, s"decile $d count $c")
    }
  }

  test("sampleStratified applies per-key rates and the default for absent keys") {
    val rates = Seq(("en", 0L), ("zh", 1000L)).toDF("key", "permille")
    val out = Curation.sampleStratified(docs, "doc_id", "lang", rates)
    val langs = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!langs.contains("en")) // rate 0 → all dropped
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(langs("zh") == total("zh")) // rate 1000 → all kept
    // absent keys default to 1000 (all kept)
    total.keys.filterNot(Set("en", "zh")).foreach(l => assert(langs(l) == total(l)))
  }

  test("packSequences: bins are budget-quantized exclusive prefix sums per shard") {
    val df = Seq(
      ("s", 0L, 1L, 50L), ("s", 0L, 2L, 50L), ("s", 0L, 3L, 50L), // prev: 0,50,100
      ("s", 1L, 4L, 200L), ("s", 1L, 5L, 10L)                     // prev: 0,200
    ).toDF("source", "shard", "doc_id", "tok")
    val out = Curation.packSequences(df, "doc_id", "tok",
        Seq(col("source"), col("shard")), 100L)
      .select("doc_id", "bin_id", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 0L, 0L), (2L, 0L, 50L), (3L, 1L, 0L),
      (4L, 0L, 0L), (5L, 2L, 0L)))
  }

  test("packSequences matches a single-stream hand fold on real docs") {
    val in = docs.select(col("doc_id"), lit("all").as("g"),
      graft.text.TextAnalysis.bpeTokenCount(col("text")).as("tok"))
    val rows = in.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    var acc = 0L
    val expect = rows.map { case (id, tok) =>
      val bin = acc / 128; val off = acc % 128; acc += tok; (id, bin, off)
    }.toSet
    val got = Curation.packSequences(in, "doc_id", "tok", Seq(col("g")), 128L)
      .select("doc_id", "bin_id", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect)
  }

  test("tokenTopK agrees with a driver-side wordcount and breaks ties by token") {
    val counts = docs.select(col("text")).collect()
      .flatMap(_.getString(0).trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val expect = counts.sortBy { case (t, c) => (-c, t) }.take(5)
    val got = Curation.tokenTopK(docs, "text", 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("tokenTopK plans TakeOrdered, not a global sort") {
    val plan = Curation.tokenTopK(docs, "text", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("contaminationHits counts distinct shared n-grams; clean docs absent") {
    val train = Seq(
      (1L, "a b c d e"),     // shares "a b c", "b c d", "c d e" with eval
      (2L, "x y z w q"),     // clean
      (3L, "c d e c d e f")  // "c d e" occurs twice but counts once (distinct grams)
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d z z c d e")).toDF("doc_id", "text")
    val got = Curation.contaminationHits(train, eval, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 3L -> 1L)) // doc 2 clean → absent
  }

  test("contaminationHits broadcasts the eval side") {
    val d = docs
    val plan = Curation.contaminationHits(
      d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
      "text", "doc_id").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("contaminationHitsBloom ≡ contaminationHits on the real corpus (exact verify absorbs fpp)") {
    val d = docs
    val train = d.filter(col("doc_id") % 97 =!= 0)
    val eval = d.filter(col("doc_id") % 97 === 0)
    val exact = Curation.contaminationHits(train, eval, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // a deliberately terrible fpp (0.5) floods the verify join with false
    // positives — the result must STILL be exactly the exact-set answer
    val screened = Curation.contaminationHitsBloom(train, eval, "text", "doc_id",
        fpp = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture must plant contamination")
    assert(screened === exact)
  }

  test("bloom_might_contain is one-sided: every inserted key probes true") {
    import graft.functions.hashExprs.bloom_might_contain
    val keys = (1L to 500L).map(_ * 2654435761L)
    val df = keys.toDF("h")
    val bloom = df.stat.bloomFilter("h", keys.length.toLong, 0.03)
    val bcast = spark.sparkContext.broadcast(bloom)
    // no false negatives ever (the screen may not drop a true hit) …
    val misses = df.filter(!bloom_might_contain(col("h"), bcast)).count()
    assert(misses === 0L)
    // … and the filter is informative: most absent keys probe false
    val absent = (1L to 500L).map(k => k * 2654435761L + 1L).toDF("h")
    val fp = absent.filter(bloom_might_contain(col("h"), bcast)).count()
    assert(fp < 100L, s"false-positive count $fp way above the 3% design point")
  }

  test("split_safe: no dup group straddles splits; planted near-dups follow their original") {
    val rows = Queries.splitSafe(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // (1) leakage safety: every group maps to exactly one split
    val perGroup = rows.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    perGroup.foreach { case (g, splits) =>
      assert(splits.size === 1, s"group $g straddles splits: $splits")
    }
    // (2) the planted near-dup (id + 100000) always lands with its original
    val byId = rows.map(r => r._1 -> r._3).toMap
    val planted = rows.filter(_._1 >= 100000L)
    assert(planted.nonEmpty, "fixture must plant near-dups")
    planted.foreach { case (id, _, sp) =>
      assert(byId(id - 100000L) === sp, s"planted $id split from its original")
    }
    // (3) the 80/10/10 hash actually spreads mass across all three splits
    val counts = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(counts.keySet === Set("train", "val", "test"), counts.toString)
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
  }

  test("repetitionScores: hand-checked duplicate-n-gram fractions and flag") {
    val df = Seq(
      (1L, "a b a b a"),   // g2: [a b, b a, a b, b a] → dup2 = 1 - 2/4 = 0.5
      (2L, "a b c d e"),   // all distinct → 0.0
      (3L, "x")            // below n → 0.0, 0.0
    ).toDF("doc_id", "text")
    val got = Curation.repetitionScores(df, "text", "doc_id")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((0.5, 0.333333, true))) // g3: 3 grams, 2 distinct
    assert(got(2L) == ((0.0, 0.0, false)))
    assert(got(3L) == ((0.0, 0.0, false)))
  }

  test("repetitionScores is shuffle-free (single codegen stage)") {
    val plan = Curation.repetitionScores(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }

  test("gate verdict: each failure mode flips keep, clean doc passes") {
    val train = Seq(
      // 25 distinct words, has stopword, no repetition → quality 1, keep
      (1L, (1 to 25).map(i => s"w$i").mkString("the ", " ", "")),
      // heavy bigram repetition → repetitive, drop
      (2L, Seq.fill(30)("spam ham").mkString(" ")),
      // too short → quality 0, drop
      (3L, "tiny doc only"),
      // contains the eval 3-gram → contaminated, drop
      (4L, (1 to 25).map(i => s"q$i").mkString("the ", " ", "") + " leak gram here")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "benchmark answer leak gram here")).toDF("doc_id", "text")
    val got = Curation.gate(train, eval, "text", "doc_id", Seq("the", "a", "of"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getBoolean(4), r.getBoolean(5), r.getBoolean(6))).toMap
    assert(got(1L)._4, s"clean doc must keep: ${got(1L)}")
    assert(!got(2L)._4 && got(2L)._2, "repetitive doc must drop via the repetition flag")
    assert(!got(3L)._4 && got(3L)._1 === 0L, "short doc must drop via quality")
    assert(!got(4L)._4 && got(4L)._3, "eval-overlapping doc must drop via contamination")
  }

  test("gate scans the train corpus ONCE (scores and decon grams share the scan)") {
    // r3's gate called contaminationHits on train separately — a second
    // full corpus pass at 100 TB (VERDICT r3 #4). Now the only train-side
    // FileScan is the shared projection; the second scan is the eval set.
    val train = docs.filter(pmod(col("doc_id"), lit(97L)) =!= 0L)
    val eval = docs.filter(pmod(col("doc_id"), lit(97L)) === 0L)
    val plan = Curation.gate(train, eval, "text", "doc_id", Seq("the", "a"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 2, s"expected 1 train + 1 eval scan, got $scans:\n${plan.take(1200)}")
  }

  test("redact masks digit runs globally and counts occurrences; non-matching rows pass through") {
    val df = Seq(
      (1L, "call 123456789 or 555123456 now"),
      (2L, "no digits here"),
      (3L, "short 12345 stays")
    ).toDF("doc_id", "text")
    val got = Curation.redact(df, "text", "doc_id", "[0-9]{6,}", "<NUM>")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got(1L) === (("call <NUM> or <NUM> now", 2L)))
    assert(got(2L) === (("no digits here", 0L)))
    assert(got(3L) === (("short 12345 stays", 0L))) // below the run length
  }

  test("oovScore counts OOV OCCURRENCES (no dedup) and zero-fills in-vocab docs") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1, 1, 1, 2)),      // tokens 1,2 dominate → in vocab(2)
      (2L, Seq(1, 2, 2, 1)),
      (3L, Seq(9, 9, 9, 1))       // 9 is rare → OOV; repeated = counted 3×
    ).toDF("doc_id", "tokens")
    val vocab = Curation.tokenVocab(corpus, "tokens", 2)
    assert(vocab.select("tok").collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
    val got = Curation.oovScore(corpus, "doc_id", "tokens", vocab)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) === ((4L, 0L, 0L)))
    assert(got(2L) === ((4L, 0L, 0L)))
    assert(got(3L) === ((4L, 3L, 750L))) // 3 OOV occurrences of ONE distinct token
  }

  test("oovScore keeps empty-token docs: n_tok 0, n_oov 0, NULL rate — not a dropped row") {
    import spark.implicits._
    val corpus = Seq((1L, Seq(1, 2)), (2L, Seq.empty[Int])).toDF("doc_id", "tokens")
    val vocab = Curation.tokenVocab(corpus, "tokens", 2)
    val got = Curation.oovScore(corpus, "doc_id", "tokens", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), if (r.isNullAt(3)) -1L else r.getLong(3)))).toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(2L) === ((0L, 0L, -1L)))
  }

  test("tokenVocab boundary tie breaks by token id, deterministically") {
    import spark.implicits._
    // tokens 5 and 7 tie at count 2; k=1 must pick 5 (smaller id)
    val corpus = Seq((1L, Seq(5, 7)), (2L, Seq(7, 5))).toDF("doc_id", "tokens")
    assert(Curation.tokenVocab(corpus, "tokens", 1)
      .select("tok").collect().map(_.getInt(0)).toSeq == Seq(5))
  }

  test("temperatureMixRates: sqrt weights, half-corpus budget, cap at 1000") {
    // keys a:100, b:4 → w_q 10e6 / 2e6, q_sum 12e6, N=104, budget=52.
    // permille_a = floor(1000*52*10e6 / (12e6*100)) = 433
    // permille_b = floor(1000*52*2e6 / (12e6*4)) = 2166 → capped 1000
    val df = (Seq.fill(100)("a") ++ Seq.fill(4)("b")).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }.toDF("id", "k")
    val got = Curation.temperatureMixRates(df, "k")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("a") === ((100L, 10000000L, 433L)))
    assert(got("b") === ((4L, 2000000L, 1000L)))
  }

  test("temperatureMixRates invariants: rate bounds, half-corpus budget conservation, inverse-size monotonicity (seeded trials)") {
    val rnd = new scala.util.Random(4242L)
    (1 to 3).foreach { trial =>
      val k = 2 + rnd.nextInt(6)
      val base = 50 + rnd.nextInt(2000)
      // counts within 2x of each other → the 1000-permille cap cannot bind,
      // so the floor-only budget bound below is tight
      val counts = (0 until k).map(i => s"k$i" -> (base + rnd.nextInt(base)).toLong)
      val df = counts.flatMap { case (key, n) => (0L until n).map(i => (i, key)) }
        .toDF("id", "k")
      val rates = Curation.temperatureMixRates(df, "k")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      val nTotal = counts.map(_._2).sum
      val budget = nTotal / 2
      rates.values.foreach { case (_, p) => assert(p >= 0L && p <= 1000L) }
      // exact-rational expected kept is B; each floor loses < n_s/1000
      val keptExpected = rates.values.map { case (n, p) => n * p }.sum / 1000.0
      assert(keptExpected <= budget + k, s"trial $trial: $keptExpected > $budget")
      assert(keptExpected > budget - nTotal / 1000.0 - k,
        s"trial $trial: $keptExpected vs $budget (floor slack exceeded)")
      // temperature < 1 upsamples smaller keys: rate is monotone in 1/size
      val bySize = counts.sortBy(_._2).map { case (key, _) => rates(key)._2 }
      assert(bySize.zip(bySize.tail).forall { case (a, b) => a >= b },
        s"trial $trial: permille not non-increasing in key size: $counts -> $rates")
    }
  }

  test("temperatureMixReport kept counts equal a driver-side recount of the hash filter") {
    val out = Curation.temperatureMixReport(docs, "doc_id", "lang")
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val d = docs.select(col("doc_id"), col("lang"),
        Curation.sampleBucket(col("doc_id")).as("b"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    out.foreach { case (lang, (permille, nKept, idSum)) =>
      val kept = d.filter(x => x._2 == lang && x._3 < permille)
      assert(kept.size.toLong === nKept, s"lang $lang")
      assert(kept.map(_._1).sum === idSum, s"lang $lang")
    }
  }

  test("tfidfTopTerms: hand-checked rational-idf scores, rank and term tie-break") {
    val df = Seq((1L, "a a b"), (2L, "b c"), (3L, "c c c d")).toDF("doc_id", "text")
    // N=3; df: a 1, b 2, c 2, d 1; ctf: a 2, b 2, c 4, d 1.
    // score = floor(N/df * tf * 1000)
    val got = Curation.tfidfTopTerms(df, "text", "doc_id", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got((1L, 1L)) === (("a", 2L, 1L, 2L, 6000L)))
    assert(got((1L, 2L)) === (("b", 1L, 2L, 2L, 1500L)))
    // doc 2: b and c tie at 1500 → term order breaks the tie
    assert(got((2L, 1L)) === (("b", 1L, 2L, 2L, 1500L)))
    assert(got((2L, 2L)) === (("c", 1L, 2L, 4L, 1500L)))
    assert(got((3L, 1L)) === (("c", 3L, 2L, 4L, 4500L)))
    assert(got((3L, 2L)) === (("d", 1L, 1L, 1L, 3000L)))
  }

  test("tfidfTopTerms top-k per doc plans WindowGroupLimit (partial per-partition limit)") {
    val plan = Curation.tfidfTopTerms(docs, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("tfidfTopTerms scans the corpus once for tf+df (ReusedExchange) plus once for N") {
    // tf and df share one exploded (doc, term) aggregate subtree; the
    // planner must dedup its exchange (ReusedExchange), not re-scan and
    // re-explode the corpus. The only other scan is the 1-row corpus
    // count feeding the idf weight. Asserted with AQE off because the
    // static plan shows the reuse node directly; under AQE the same dedup
    // happens at runtime via query-stage reuse (canonicalized-plan cache).
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Curation.tfidfTopTerms(docs, "text", "doc_id", 3)
        .queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans === 2, s"expected tf/df shared scan + count scan, got $scans:\n${plan.take(1200)}")
      assert(plan.contains("ReusedExchange"), plan.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("lengthBuckets: exact quartiles on a dense domain and on a degenerate one") {
    val dense = (1L to 8L).toDF("tok")
    val g1 = Curation.lengthBuckets(dense, "tok").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // thresholds ceil(k*8/4) = 2,4,6 → boundaries 2,4,6
    assert(g1(0L) === ((2L, 1L, 2L, 3L)))
    assert(g1(1L) === ((2L, 3L, 4L, 7L)))
    assert(g1(2L) === ((2L, 5L, 6L, 11L)))
    assert(g1(3L) === ((2L, 7L, 8L, 15L)))
    // heavy duplication: all three boundaries collapse onto the mode
    val degen = Seq(5L, 5L, 5L, 9L).toDF("tok")
    val g2 = Curation.lengthBuckets(degen, "tok").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 === Map(0L -> 3L, 3L -> 1L)) // buckets 1/2 empty → absent
  }

  test("lengthBuckets plans TWO corpus scans (histogram reused for N, then assignment)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Curation.lengthBuckets(
        docs.select(graft.text.TextAnalysis.bpeTokenCount(col("text")).as("tok")), "tok")
        .queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans === 2, s"expected histogram + assignment scans only, got $scans:\n${plan.take(1200)}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("temperatureMixReport: stats + apply = two corpus scans, broadcast-join apply") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = Curation.temperatureMixReport(docs, "doc_id", "lang")
      val plan = q.queryExecution.executedPlan.toString
      val scans = "Scan parquet".r.findAllIn(plan).size
      assert(scans === 2, s"expected count + apply scans only, got $scans:\n${plan.take(1200)}")
      assert(plan.contains("BroadcastHashJoin"), plan.take(1200))
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("capPerKey: hash-order quota per key, deterministic, WindowGroupLimit-planned") {
    val df = (1L to 6L).map(id => (id, if (id <= 4) "a" else "b")).toDF("id", "k")
    def ord(id: Long) = ((id % 999983L) * 1103515245L + 54321L) % 1000000007L
    val expect = (1L to 6L).map(id => (if (id <= 4) "a" else "b", id))
      .groupBy(_._1).flatMap { case (key, rows) =>
        rows.map(_._2).sortBy(id => (ord(id), id)).take(2).zipWithIndex
          .map { case (id, i) => (id, key, i + 1L) }
      }.toSet
    val got = Curation.capPerKey(df, "id", "k", 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expect)
    val plan = Curation.capPerKey(docs.select(col("doc_id"), col("lang")),
        "doc_id", "lang", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(800))
  }

  test("shardPlan: balanced shards, full coverage, and an order-certifying checksum") {
    val df = (0L until 100L).toDF("doc_id")
    val got = Curation.shardPlan(df, "doc_id", 4).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.values.map(_._1).sum === 100L)
    assert(got.values.map(_._2).sum === (0L until 100L).sum)
    // recompute the exact plan driver-side (same hashes, same ordering)
    val expect = (0L until 100L)
      .map(id => (((id % 1000003L) * 2654435761L + 40503L) % 4,
                  ((id % 999983L) * 1103515245L + 54321L) % 1000000007L, id))
      .groupBy(_._1).map { case (sh, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        val orderSum = sorted.zipWithIndex
          .map { case ((_, _, id), i) => (i + 1L) * (id % 1000003L) }.sum
        sh -> ((rows.size.toLong, rows.map(_._3).sum, sorted.head._3, orderSum))
      }
    assert(got === expect)
  }

  test("effective size: a cross-source dup group is kept once, in the anchor's source") {
    import spark.implicits._
    // docs 1 (srcA) and 2 (srcB) are near-identical -> one group anchored
    // at 1; doc 3 (srcB) is distinct. Raw counts both sides; kept counts
    // only anchors: srcA keeps doc 1 (5 words), srcB keeps only doc 3.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon", "srcA"),
      (2L, "alpha beta gamma delta zeta", "srcB"),
      (3L, "one two three four five six", "srcB")
    ).toDF("doc_id", "text", "source")
    val groups = graft.dedup.Dedup.duplicateGroups(
      graft.dedup.Dedup.minhashLshPairs(corpus, "text", "doc_id", 0.3),
      "doc_a", "doc_b").select(col("doc_id"), col("group_id"))
    val asg = corpus.join(broadcast(groups), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        graft.text.TextAnalysis.wordCount(col("text")).as("w"),
        coalesce(col("group_id"), col("doc_id")).as("group_id"))
    val rep = asg.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") === col("group_id"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("w")).as("words_raw"),
        sum(when(col("doc_id") === col("group_id"), col("w")).otherwise(0L)).as("words_kept"))
      .orderBy("source").collect()
    assert(rep(0).getString(0) === "srcA" && rep(0).getLong(2) === 1L &&
      rep(0).getLong(3) === 5L && rep(0).getLong(4) === 5L)
    assert(rep(1).getString(0) === "srcB" && rep(1).getLong(1) === 2L &&
      rep(1).getLong(2) === 1L && rep(1).getLong(4) === 6L)
  }

  test("split leak audit: a near-dup pair straddling train/val is reported; same-split pairs are not") {
    // sampleBucket(1)=106 (train), sampleBucket(2)=867 (val): docs 1 and 2
    // are near-identical -> one straddling leak. Docs 5 and 9 both hash to
    // train (428, 750): near-identical but NOT a leak.
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon eta"),
      (5L, "one two three four five six seven"),
      (9L, "one two three four five six eight")
    ).toDF("doc_id", "text")
    def splitOf(c: org.apache.spark.sql.Column) = {
      val b = Curation.sampleBucket(c)
      when(b < 800, lit("train")).when(b < 900, lit("val")).otherwise(lit("test"))
    }
    val leaks = graft.dedup.Dedup.minhashLshPairs(corpus, "text", "doc_id", 0.3)
      .withColumn("split_a", splitOf(col("doc_a")))
      .withColumn("split_b", splitOf(col("doc_b")))
      .filter(col("split_a") =!= col("split_b"))
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(leaks === Set((1L, 2L)))
  }

  test("vocab coverage: query is monotone in k, ends at full coverage, deterministic") {
    val a = Queries.vocabCoverage(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty)
    val perm = a.map(_.getLong(2))
    assert(perm.sameElements(perm.sorted), "coverage must be nondecreasing in k")
    // near-uniform synthetic counts: top-16 of ~32k tokens floors to 0
    // permille (correct), but half the vocab must cover roughly half the
    // corpus, and never more than all of it
    assert(perm.last >= 400L && perm.last <= 1000L)
    val cums = a.map(_.getLong(1))
    assert(cums.distinct.length === cums.length &&
      cums.sameElements(cums.sorted), "cumulative counts strictly increase")
    val b = Queries.vocabCoverage(spark, "/root/testdata/sf0.001").collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("drift EMD: hand-computed value, integer-exact numerator, shift sensitivity") {
    import spark.implicits._
    // epoch 0: 4 rows in bucket 0; epoch 1: 2 in bucket 0, 2 in bucket 1.
    // F0 = (1, 1), F1 = (0.5, 1) → EMD = 0.5 * width(=10) = 5.0 = 5_000_000 ppm.
    // Numerator: |cum0*n1 - cum1*n0| = |4*4 - 2*4| + |4*4 - 4*4| = 8.
    val hist = Seq((0, 0, 4L), (1, 0, 2L), (1, 1, 2L)).toDF("epoch", "bucket", "cnt")
    val r = graft.drift.DriftCheck.emd(hist, bucketWidth = 10L).collect().head
    assert(r.getDecimal(0).longValueExact() == 8L)
    assert(r.getLong(1) == 4L && r.getLong(2) == 4L)
    assert(r.getLong(3) == 5000000L)
    // identical distributions → EMD exactly 0
    val same = Seq((0, 0, 3L), (0, 1, 3L), (1, 0, 3L), (1, 1, 3L))
      .toDF("epoch", "bucket", "cnt")
    assert(graft.drift.DriftCheck.emd(same, 10L).collect().head.getLong(3) == 0L)
  }
}
