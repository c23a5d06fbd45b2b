package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.{EmbAudit, Knn}
import graft.multimodal.MediaPipeline

/** Training-data pipeline operators: dedup recall, kNN correctness,
  * multimodal plumbing.
  */
class OpsSpec extends SparkTestBase {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("exact dedup finds planted copies and nothing from distinct texts") {
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") < 5)
        .select((col("doc_id") + 1000L).as("doc_id"), col("text")))
    val groups = Dedup.exact(corpus, "text", "doc_id")
    assert(groups.count() >= 5)
    assert(groups.filter(col("cnt") < 2).count() === 0)
  }

  test("minhash-LSH finds planted near-dups (suffix-mutated copies)") {
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000L).as("doc_id"),
          concat(col("text"), lit(" tiny suffix")).as("text")))
    val pairs = Dedup.minhashLshPairs(corpus, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // every planted pair must be found (high-jaccard near-dups)
    val planted = (0L until 10L).map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(pairs), s"missing: ${planted -- pairs}")
  }

  test("normalized dedup collapses case/punctuation/whitespace variants, keeps distinct texts apart") {
    val variants = Seq(
      (1L, "Hello,  World! This is FINE."),
      (2L, "hello world this is fine"),
      (3L, "HELLO WORLD — this is fine!!"),
      (4L, "hello world this is not fine"))
    val groups = Dedup.exactNormalized(variants.toDF("doc_id", "text"), "text", "doc_id")
      .collect()
    assert(groups.length === 1)
    assert(groups.head.getAs[Long]("cnt") === 3L)
    assert(groups.head.getAs[Long]("exemplar") === 1L)
  }

  test("bipartite LSH screen flags batch near-dups of history, not fresh docs") {
    val hist = docs.select(col("doc_id"), col("text"))
    val nearDups = docs.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000L).as("doc_id"),
        concat(col("text"), lit(" tiny suffix")).as("text"))
    val fresh = docs.filter(col("doc_id") < 5)
      .select((col("doc_id") + 2000L).as("doc_id"),
        concat(lit("totally novel payload "), col("doc_id")).as("text"))
    val pairs = Dedup.minhashLshPairsAgainst(
        hist, nearDups.unionByName(fresh), "text", "doc_id", 0.5)
      .select("doc_hist", "doc_new").as[(Long, Long)].collect().toSet
    val planted = (0L until 10L).map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(pairs), s"missing: ${planted -- pairs}")
    // no pair may name a fresh doc, and no history×history pair may appear
    assert(pairs.forall { case (h, n) => h < 1000L && n >= 1000L && n < 2000L },
      s"bad side assignment: ${pairs.filterNot { case (h, n) => h < 1000L && n >= 1000L && n < 2000L }}")
  }

  test("shared-boilerplate prefix cannot blow up candidate generation (skew safety)") {
    // 200 docs share a 15-word header but have unique 60-word tails
    // (pairwise jaccard ~0.15 < threshold): the r1 prefix-hash blocking put
    // ALL of them in one block (19,900 verify pairs); MinHash banding must
    // keep candidates near the planted set, not near n^2/2.
    val header = (1 to 15).map(i => s"boiler$i").mkString(" ")
    val base = (0 until 200).map { d =>
      (d.toLong, header + " " + (0 until 60).map(w => s"tail${d}w$w").mkString(" "))
    }
    val planted = (0 until 5).map { d =>
      (1000L + d, base(d)._2 + " mutated")
    }
    val corpus = (base ++ planted).toDF("doc_id", "text")
    // candidate pairs = the banding self-join BEFORE verification
    val t = corpus.select(col("doc_id"),
      Dedup.shinglesOfWords(graft.text.TextAnalysis.words(col("text"))).as("sh"))
    val bucketed = t.select(col("doc_id"), explode(
        Dedup.bandBuckets(Dedup.minhashSignature(col("sh"), 32), 16, 2)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bucket"))
    val cands = bucketed.as("a").join(bucketed.as("b"), Seq("band", "bucket"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct().count()
    assert(cands < 200L, s"candidate blow-up: $cands pairs from 205 docs")
    // and the planted near-dups are still all found
    val pairs = Dedup.ngramJaccardPairs(corpus, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val want = (0 until 5).map(d => (d.toLong, 1000L + d)).toSet
    assert(want.subsetOf(pairs), s"missing planted: ${want -- pairs}")
  }

  test("containment: planted snippet-in-doc pairs found at cont=1.0; " +
    "symmetric Jaccard pipeline misses them") {
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") < 8)
        .select((col("doc_id") + 2000L).as("doc_id"),
          array_join(slice(split(trim(col("text")), "\\s+"), 1, 12), " ").as("text")))
    val pairs = Dedup.containmentPairs(corpus, "text", "doc_id", 0.9)
      .select("doc_a", "doc_b", "cont").as[(Long, Long, Double)].collect()
    val found = pairs.map(p => (p._1, p._2)).toSet
    val planted = (0L until 8L).map(i => (i, i + 2000L)).toSet
    assert(planted.subsetOf(found), s"missing: ${planted -- found}")
    // a full-prefix excerpt is wholly contained in its source
    assert(pairs.filter(p => planted((p._1, p._2))).forall(_._3 === 1.0))
    // the same pairs are invisible to the symmetric Jaccard pipeline at
    // any threshold above the snippet/doc shingle ratio
    val sym = Dedup.minhashLshPairs(corpus, "text", "doc_id", 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(planted.intersect(sym).isEmpty)
  }

  test("containment df cap drops boilerplate-only evidence (skew safety) and is mirrored recall") {
    // 30 docs sharing ONE boilerplate sentence (plus unique tails): with
    // dfCap=10 the shared shingles' posting lists are dropped, so no
    // candidate pairs survive — the quadratic hot-key bomb is defused.
    val boiler = "terms of service apply to all content on this site"
    val rows = (0 until 30).map(i => (i.toLong, s"$boiler unique tail $i payload $i"))
    val df = rows.toDF("doc_id", "text")
    val capped = Dedup.containmentPairs(df, "text", "doc_id", 0.5, dfCap = 10)
    assert(capped.count() === 0)
    // with the cap above the group size the same pairs ARE evidence
    val uncapped = Dedup.containmentPairs(df, "text", "doc_id", 0.5, dfCap = 100)
    assert(uncapped.count() > 0)
  }

  test("simhash pairs find planted near-dups with small hamming") {
    val corpus = docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") < 10)
        .select((col("doc_id") + 1000L).as("doc_id"),
          concat(col("text"), lit(" x")).as("text")))
    // exact copies differ by one appended word → hamming stays small; 6 is
    // the production gate (dedup_simhash query), not the pigeonhole-3 bound
    val pairs = Dedup.simhashPairs(corpus, "text", "doc_id", 6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 10L).map(i => (i, i + 1000L)).toSet
    assert(planted.subsetOf(pairs), s"missing: ${planted -- pairs}")
    // identical texts must land at hamming 0 in every band
    val exactTwin = Dedup.simhashPairs(
      docs.select(col("doc_id"), col("text")).unionByName(
        docs.filter(col("doc_id") < 5)
          .select((col("doc_id") + 2000L).as("doc_id"), col("text"))),
      "text", "doc_id", 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert((0L until 5L).map(i => (i, i + 2000L)).toSet.subsetOf(exactTwin))
  }

  test("duplicateGroups: transitive closure over pairs, exemplar per component") {
    // chain 1-2-3-4 (never all-pairs connected), separate pair 10-11,
    // plus a longer 20..40 chain to exercise path halving over depth
    val chain = (20L until 40L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)) ++ chain)
      .toDF("doc_a", "doc_b")
    val g = Dedup.duplicateGroups(pairs, "doc_a", "doc_b")
      .as[(Long, Long, Boolean)].collect().toSet
    val expected =
      Seq(1L, 2L, 3L, 4L).map(d => (1L, d, d == 1L)).toSet ++
      Seq(10L, 11L).map(d => (10L, d, d == 10L)).toSet ++
      (20L to 40L).map(d => (20L, d, d == 20L)).toSet
    assert(g === expected)
  }

  test("duplicateGroups is empty on empty pairs and total on all inputs' ids") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.duplicateGroups(empty, "doc_a", "doc_b").count() === 0)
  }

  test("duplicateGroups driver union-find and distributed label propagation " +
       "produce identical group tables") {
    // driverPairCap = 0 forces the iterative path on the same input; the
    // r6 under-cap path must be row-identical (group_id = component min,
    // keep = exemplar flag) including on chains that exercise path halving
    val chain = (20L until 40L).map(i => (i, i + 1))
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 10L)) ++ chain)
      .toDF("doc_a", "doc_b")
    val fast = Dedup.duplicateGroups(pairs, "doc_a", "doc_b")
      .as[(Long, Long, Boolean)].collect().toSet
    val slow = Dedup.duplicateGroups(pairs, "doc_a", "doc_b",
        maxIter = 50, driverPairCap = 0L)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(fast === slow)
    assert(fast.nonEmpty)
  }

  test("embedding dedup: dense cluster stays bounded under the bucket cap " +
       "and reassembles into one group via chain edges") {
    // 400 identical embeddings — the adversarial dense cluster: every band
    // puts all of them in ONE bucket (geometry can't be split by more
    // planes), so uncapped candidate generation is O(n²)
    val n = 400
    val cluster = spark.range(n).select(col("id").as("vec_id"),
      array((0 until 8).map(i => lit((i + 1) * 0.1f)): _*).as("embedding"))
    val capped = Dedup.embeddingPairs(cluster, "vec_id", "embedding", 0.99,
      nbits = 8, bands = 2, maxBucket = 10)
    val pairs = capped.select("doc_a", "doc_b").as[(Long, Long)].collect()
    // chain, not clique: n-1 spanning edges per band, identical across
    // bands (same bucket membership), deduped to exactly n-1
    assert(pairs.length === n - 1, s"got ${pairs.length} candidate pairs")
    // transitive closure over the chain restores the single group
    val g = Dedup.duplicateGroups(capped, "doc_a", "doc_b")
    assert(g.select(countDistinct(col("group_id"))).head().getLong(0) === 1L)
    assert(g.count() === n.toLong)
    // uncapped control on a smaller slice: all-pairs
    val small = cluster.filter(col("vec_id") < 20)
    assert(Dedup.embeddingPairs(small, "vec_id", "embedding", 0.99,
      nbits = 8, bands = 2).count() === 20L * 19 / 2)
  }

  test("multi-band embedding dedup recalls at least the single-band pairs") {
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def pairSet(bands: Int) =
      Dedup.embeddingPairs(e, "vec_id", "embedding", 0.5, bands = bands)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val one = pairSet(1)
    val two = pairSet(2)
    assert(one.subsetOf(two), s"band-0 pairs lost: ${one -- two}")
  }

  test("brute-force kNN: rank-1 neighbor of a duplicated vector is its twin") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    // plant an exact copy of vec 0 with id 9999
    val corpus = emb.unionByName(
      emb.filter(col("vec_id") === 0).select(lit(9999L).as("vec_id"),
        col("embedding"), col("label")))
    val top = Knn.cosineTopK(corpus, corpus.filter(col("vec_id") === 0), "vec_id", "embedding", 3)
    val rank1 = top.filter(col("rank") === 1).head().getLong(2)
    assert(rank1 === 9999L)
  }

  test("LSH ANN results are a subset of brute-force ordering (same bucket ⊆ corpus)") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 3)
    val ann = Knn.lshTopK(emb, q, "vec_id", "embedding", 5)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val all = emb.count().toInt
    val brute = Knn.cosineTopK(emb, q, "vec_id", "embedding", all)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    assert(ann.nonEmpty)
    assert(ann.subsetOf(brute)) // every ANN hit is a real corpus neighbor
    // and ANN's rank-1 for each query is that query's best bucket-mate:
    // it must appear in the brute-force order (sanity, non-vacuous)
    val annTop = Knn.lshTopK(emb, q, "vec_id", "embedding", 1)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    assert(annTop.subsetOf(brute))
  }

  test("IVF: assignment is argmax-cosine over the codebook; exact copy is found via its list") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // two orthogonal centroids; vectors near each
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val rows = Seq(
      Row(0L, Seq(1f, 0f)), Row(1L, Seq(0f, 1f)),          // codebook
      Row(10L, Seq(0.9f, 0.1f)), Row(11L, Seq(0.1f, 0.9f)), // one per list
      Row(12L, Seq(0.89f, 0.11f))                           // near 10
    )
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val cents = Seq(0L -> Array(1f, 0f), 1L -> Array(0f, 1f))
    val assigned = df.select(col("vec_id"),
        Knn.ivfAssign(col("embedding"), cents).as("cid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(0L -> 0L, 1L -> 1L, 10L -> 0L, 11L -> 1L, 12L -> 0L))
    // nprobe=1: vec 10's top neighbor within its own list is 12
    val top = Knn.ivfTopK(df, df.filter(col("vec_id") === 10), "vec_id",
      "embedding", 1, cents, nprobe = 1)
    assert(top.head().getLong(2) === 12L)
  }

  test("IVF ANN results are a subset of brute-force ordering") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 8).select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
    val q = emb.filter(col("vec_id") < 3)
    val ann = Knn.ivfTopK(emb, q, "vec_id", "embedding", 5, cents)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val brute = Knn.cosineTopK(emb, q, "vec_id", "embedding", emb.count().toInt)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    assert(ann.nonEmpty)
    assert(ann.subsetOf(brute))
  }

  test("CentroidNearest matches the interpreted HOF formulation bit-for-bit") {
    // the expression replaced array_sort(struct(-cosine, cid)) (VERDICT r3
    // #3) under a bit-compatibility contract — hold it to the original
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val cents = emb.filter(col("vec_id") < 8).select(col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq.sortBy(_._1)
    def hofProbes(e: org.apache.spark.sql.Column, nprobe: Int) =
      transform(slice(array_sort(array(cents.map { case (cid, ce) =>
        struct((-Knn.cosine(e, typedlit(ce))).as("negcos"), lit(cid).as("cid"))
      }: _*)), 1, nprobe), s => s.getField("cid"))
    val diff = emb.select(
        Knn.ivfProbes(col("embedding"), cents, 3).as("fast"),
        hofProbes(col("embedding"), 3).as("hof"))
      .filter(col("fast") =!= col("hof"))
    assert(diff.count() === 0L)
  }

  test("k-means fit recovers planted clusters and is partition-invariant") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // two planted clusters around (1, eps) and (eps, 1); ids interleave so
    // the id-order init starts with one seed per cluster
    val rows = (0L until 100L).map { i =>
      val e = (i % 13).toFloat / 100f
      if (i % 2 == 0) Row(i, Seq(1f, e)) else Row(i, Seq(e, 1f))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 7), schema)
    val fitted = Knn.fitCodebook(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(fitted.size === 2)
    // every row lands in its own cluster's list
    val assigned = df.select(col("vec_id"),
        Knn.ivfAssign(col("embedding"), fitted).as("cid"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(assigned.forall { case (id, cid) => cid === id % 2 })
    // quantized-integer reduction ⇒ the codebook is bit-identical under a
    // different partitioning (the N vs 4N executor invariance at scale)
    val fitted2 = Knn.fitCodebook(df.repartition(2), "vec_id", "embedding", 2, 3)
    assert(fitted.map { case (c, v) => (c, v.toSeq) } ===
      fitted2.map { case (c, v) => (c, v.toSeq) })
  }

  test("IVF with a FITTED codebook still returns only real corpus neighbors") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val fitted = Knn.fitCodebook(emb.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", k = 4, iters = 2)
    val q = emb.filter(col("vec_id") < 3)
    val ann = Knn.ivfTopK(emb, q, "vec_id", "embedding", 5, fitted)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    val brute = Knn.cosineTopK(emb, q, "vec_id", "embedding", emb.count().toInt)
      .select("qid", "neighbor").as[(Long, Long)].collect().toSet
    assert(ann.nonEmpty)
    assert(ann.subsetOf(brute))
  }

  test("int8 quantization: reconstruction error bounded by half a step per dim; params exact") {
    import graft.sim.Quantize
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (mins, scales) = Quantize.fitMinMax(e, "embedding")
    assert(mins.length === 64 && scales.length === 64)
    // dequantize and compare: |v − (q/scale + min)| ≤ (1/scale)/2 + eps
    import graft.functions.hashExprs.quantize_int8
    val rows = e.select(col("embedding"),
        quantize_int8(col("embedding"), mins, scales).as("q"))
      .collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val q = r.getSeq[Int](1)
      assert(q.length === v.length)
      v.indices.foreach { i =>
        assert(q(i) >= 0 && q(i) <= 255)
        if (scales(i) > 0) {
          val step = 1.0 / scales(i)
          val back = q(i) * step + mins(i)
          assert(math.abs(v(i) - back) <= step / 2 + 1e-9,
            s"dim $i: v=${v(i)} q=${q(i)} back=$back step=$step")
        }
      }
    }
  }

  test("QuantizeInt8 matches the interpreted HOF formulation bit-for-bit") {
    import graft.functions.hashExprs.quantize_int8
    import graft.sim.Quantize
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (mins, scales) = Quantize.fitMinMax(e, "embedding")
    val minsLit = typedLit(mins)
    val scalesLit = typedLit(scales)
    // HOF twin: same subtract → multiply → +0.5 → floor → clamp sequence
    val hof = transform(col("embedding"), (v, i) =>
      greatest(lit(0), least(lit(255),
        floor((v.cast("double") - element_at(minsLit, (i + 1).cast("int"))) *
          element_at(scalesLit, (i + 1).cast("int")) + 0.5).cast("int"))))
    val diff = e.select(
        quantize_int8(col("embedding"), mins, scales).as("a"), hof.as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff === 0L)
  }

  test("quantized top-k: k rows per query, never the query itself, integer scores agree with a replay") {
    import graft.sim.{Knn, Quantize}
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val (mins, scales) = Quantize.fitMinMax(e, "embedding")
    val got = Knn.quantizedTopK(e, e.filter(col("vec_id") < 3), "vec_id",
        "embedding", 5, mins, scales)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 1L, 2L))
    byQ.foreach { case (q, rows) =>
      assert(rows.length === 5, s"query $q")
      assert(rows.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L, 5L))
      assert(!rows.exists(_._3 == q), s"query $q returned itself")
    }
    // determinism: a second run returns the identical ranking
    val again = Knn.quantizedTopK(e, e.filter(col("vec_id") < 3), "vec_id",
        "embedding", 5, mins, scales)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.sortBy(x => (x._1, x._2)).toSeq === got.sortBy(x => (x._1, x._2)).toSeq)
  }

  test("fd_audit: conflicting payloads under one key reported; agreeing dups are not") {
    import graft.stats.FdAudit
    val df = Seq(
      ("k1", "a"), ("k1", "a"),          // dup key, AGREEING payload → clean
      ("k2", "a"), ("k2", "b"), ("k2", "c"), // conflict: 3 variants
      ("k3", "x")                        // singleton → clean
    ).toDF("k", "v")
    val got = FdAudit.violations(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getString(3)))
    assert(got.toSeq === Seq(("k2", 3L, "a", "c")))
  }

  test("embedding decontamination: planted eval leaks flagged at cos 1; orthogonal train vectors are not") {
    import spark.implicits._
    // 8-dim unit basis vectors: e0/e1 are eval; train holds an exact copy
    // of e0 (the leak), plus e2/e3 (orthogonal to both eval points)
    def basis(i: Int): Array[Float] =
      Array.tabulate(8)(j => if (j == i) 1.0f else 0.0f)
    val evalSet = Seq((0L, basis(0)), (1L, basis(1))).toDF("vec_id", "embedding")
    val train = Seq((100L, basis(0)), (101L, basis(2)), (102L, basis(3)))
      .toDF("vec_id", "embedding")
    val hits = graft.dedup.Dedup
      .embeddingPairsAgainst(train, evalSet, "vec_id", "embedding", 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(hits.toSeq === Seq((100L, 0L, 1.0)))
  }

  test("multimodal: mapPartitions stub decode agrees with the column twin") {
    val viaBatch = MediaPipeline.decodeMeta(MediaPipeline.fromDocuments(docs))
      .select(col("media_id").as("doc_id"), col("n_bytes"), col("width"),
        col("height"))
    val viaCols = MediaPipeline.metaColumns(docs)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"))
    assert(viaBatch.exceptAll(viaCols).count() === 0L)
    assert(viaCols.exceptAll(viaBatch).count() === 0L)
  }

  test("embedding audit classifies null/empty/nullelem/NaN/Inf/zero/valid rows exactly once each") {
    // the null-ELEMENT row is the ADVICE r4 case: under three-valued logic
    // an ungated exists() returns NULL for it and the row lands in NO
    // class — the explicit n_nullelem class keeps the partition exhaustive
    val rows: Seq[Option[Seq[java.lang.Float]]] = Seq(
      None,                                  // null
      Some(Seq.empty[java.lang.Float]),      // empty
      Some(Seq[java.lang.Float](1f, null)),  // null element
      Some(Seq[java.lang.Float](null, Float.NaN)), // null elem wins over NaN
      Some(Seq[java.lang.Float](Float.NaN, 1f)),   // non-finite (NaN)
      Some(Seq[java.lang.Float](Float.PositiveInfinity)), // non-finite, dim 1
      Some(Seq[java.lang.Float](0f, 0f)),    // zero vector
      Some(Seq[java.lang.Float](1f, 2f)),    // valid
      Some(Seq[java.lang.Float](0f, 3f)))    // valid (partial zeros are fine)
    val df = rows.toDF("embedding")
    val r = EmbAudit.summary(df, "embedding").head()
    assert(r.getAs[Long]("n_total") === 9L)
    assert(r.getAs[Long]("n_null") === 1L)
    assert(r.getAs[Long]("n_empty") === 1L)
    assert(r.getAs[Long]("n_nullelem") === 2L)
    assert(r.getAs[Long]("n_nonfinite") === 2L)
    assert(r.getAs[Long]("n_zero") === 1L)
    assert(r.getAs[Long]("n_valid") === 2L)
    assert(r.getAs[Long]("dim_min") === 1L)
    assert(r.getAs[Long]("dim_max") === 2L)
    // the partition is exhaustive: every row lands in exactly one class
    assert(r.getAs[Long]("n_null") + r.getAs[Long]("n_empty") +
      r.getAs[Long]("n_nullelem") + r.getAs[Long]("n_nonfinite") +
      r.getAs[Long]("n_zero") + r.getAs[Long]("n_valid") ===
      r.getAs[Long]("n_total"))
  }
}
