package graft

import org.apache.spark.sql.functions._
import graft.functions.{exprs, hashExprs}
import graft.gen.SyntheticTokens

/** Custom codegen expressions ≡ their higher-order-function formulations. */
class ExpressionsSpec extends SparkTestBase {

  import SyntheticTokens._

  test("TokenArrayGen matches transform(sequence) formula element-for-element") {
    val df = spark.range(0L, 2000L, 1L, 4)
      .select(col("id"),
        (lit(1L) + pmod(col("id") * NA + NB, lit(NTokMod))).cast("int").as("n"))
      .select(col("id"), col("n"),
        exprs.token_array_gen(col("id"), col("n"), TokA, TokB, TokC, Vocab).as("fast"),
        transform(sequence(lit(0L), col("n").cast("long") - 1L),
          i => pmod(col("id") * TokA + i * TokB + TokC, lit(Vocab)).cast("int")).as("slow"))
    assert(df.filter(!(col("fast") <=> col("slow"))).count() === 0L)
    // spot-check first element of doc 0: (0*A + 0*B + 7) % 32768 = 7
    val first = df.filter(col("id") === 0L)
      .select(element_at(col("fast"), 1)).head().getInt(0)
    assert(first === 7)
  }

  test("ArrayIntBounds matches exists(t -> t IS NULL OR out-of-range)") {
    val data = Seq(
      (1L, Seq[Integer](1, 2, 3)),
      (2L, Seq[Integer](0, 32767)),
      (3L, Seq[Integer](-1, 5)),
      (4L, Seq[Integer](32768)),
      (5L, Seq[Integer](1, null, 2)),
      (6L, Seq.empty[Integer]))
    import scala.jdk.CollectionConverters._
    val rows = data.map { case (id, a) =>
      org.apache.spark.sql.Row(id, a.map(x => if (x == null) null else x.intValue()))
    }.asJava
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("arr",
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.IntegerType, true))))
    val df = spark.createDataFrame(rows, schema)
      .select(col("id"),
        exprs.array_int_bounds_violated(col("arr"), 0, 32767).as("fast"),
        exists(col("arr"), t => t.isNull || !t.between(0, 32767)).as("slow"))
    assert(df.filter(!(col("fast") <=> col("slow"))).count() === 0L)
    val bad = df.filter(col("fast")).select(col("id")).collect().map(_.getLong(0)).sorted
    assert(bad.toSeq === Seq(3L, 4L, 5L))
  }

  test("VarStepTokenGen matches the transform(sequence) variable-step formula element-for-element") {
    val s = 13L
    val df = spark.range(0L, 2000L, 1L, 4)
      .select(col("id"),
        (lit(1L) + pmod(col("id") * NA + NB, lit(NTokMod))).cast("int").as("n"))
      .select(col("id"), col("n"),
        exprs.var_step_token_gen(col("id"), col("n"), TokA, TokB, s, TokC, Vocab).as("fast"),
        transform(sequence(lit(0L), col("n").cast("long") - 1L),
          i => pmod(col("id") * TokA + i * (lit(TokB) + lit(s) * col("id")) + TokC,
            lit(Vocab)).cast("int")).as("slow"))
    assert(df.filter(!(col("fast") <=> col("slow"))).count() === 0L)
  }

  test("TokenGramHash: length n-k+1, equal slices hash equal, equality matches the string grams") {
    val df = spark.range(0L, 500L, 1L, 4)
      .select(col("id"),
        (lit(1L) + pmod(col("id") * NA + NB, lit(NTokMod))).cast("int").as("n"))
      .select(col("id"),
        exprs.token_array_gen(col("id"), col("n"), TokA, TokB, TokC, Vocab).as("toks"))
      .select(col("id"), col("toks"),
        hashExprs.token_gram_hash(col("toks"), 8).as("gh"),
        expr("transform(slice(toks, 1, greatest(size(toks) - 7, 0)), " +
          "(x, i) -> array_join(transform(slice(toks, i + 1, 8), " +
          "t -> CAST(t AS STRING)), ' '))").as("gs"))
    // per-row length law (docs shorter than k yield empty arrays)
    assert(df.filter(size(col("gh")) =!=
      greatest(size(col("toks")) - 7, lit(0))).count() === 0L)
    // hash equality must coincide with string-gram equality across a
    // cross-section of (gram, gram) pairs: explode both and compare group
    // cardinalities — |distinct hashes| == |distinct strings| catches both
    // a false merge (collision) and a false split (non-determinism)
    val dh = df.select(explode(col("gh")).as("g")).distinct().count()
    val ds = df.select(explode(col("gs")).as("g")).distinct().count()
    assert(dh === ds, s"distinct hashed $dh != distinct string $ds")
  }

  test("MinHashSignature: deterministic, set-identical inputs agree, similar sets mostly agree") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a b c", "b c d", "c d e")),
      (2L, Seq("c d e", "a b c", "b c d")), // same set, different order
      (3L, Seq("a b c", "b c d", "x y z"))
    ).toDF("id", "sh")
      .select(col("id"), hashExprs.minhash_signature(col("sh"), 32).as("sig"))
    val rows = df.orderBy("id").collect().map(_.getSeq[Long](1))
    assert(rows(0) === rows(1)) // order-insensitive
    val agree = rows(0).zip(rows(2)).count { case (a, b) => a == b }
    // 2 of 4 distinct shingles shared → expected agreement ≈ J*32 = 16,
    // binomial spread — just assert "some but not all"
    assert(agree >= 4 && agree < 32)
  }

  test("HashedWordShingles equals transform(word_shingles, xxhash64) element-for-element, " +
      "and MinHashFromHashes over it equals MinHashSignature over the strings") {
    // bit-identity is the contract: the r6 dedup pipelines bucket and
    // verify from ONE HashedWordShingles pass, and the oracle hash rows
    // (dedup_* / lsh_screen / split_safe family) depend on the signatures
    // and hashed shingle sets being exactly the r5 values
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), graft.text.TextAnalysis.words(col("text")).as("ws"))
    val both = d.select(col("doc_id"),
      hashExprs.hashed_word_shingles(col("ws"), 3).as("fused"),
      transform(hashExprs.word_shingles(col("ws"), 3), x => xxhash64(x)).as("twoStep"),
      hashExprs.minhash_from_hashes(
        transform(hashExprs.word_shingles(col("ws"), 3), x => xxhash64(x)), 32).as("sigH"),
      hashExprs.minhash_signature(hashExprs.word_shingles(col("ws"), 3), 32).as("sigS"))
    assert(both.filter(col("fused") =!= col("twoStep")).count() === 0L)
    assert(both.filter(col("sigH") =!= col("sigS")).count() === 0L)
    // empty-input edge: <n words ⇒ empty hash array, signature all zeros
    import spark.implicits._
    val short = Seq((1L, Seq("only", "two"))).toDF("id", "ws").select(
      hashExprs.hashed_word_shingles(col("ws"), 3).as("h"),
      hashExprs.minhash_from_hashes(hashExprs.hashed_word_shingles(col("ws"), 3), 4).as("sig"))
      .head()
    assert(short.getSeq[Long](0).isEmpty)
    assert(short.getSeq[Long](1) === Seq(0L, 0L, 0L, 0L))
  }

  test("ArrayLongIntersectCount equals size(array_intersect) on hashed shingle sets " +
      "and on adversarial duplicate/empty arrays") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        hashExprs.hashed_word_shingles(
          graft.text.TextAnalysis.words(col("text")), 3).as("sh"))
    val a = d.select(col("doc_id").as("ia"), col("sh").as("sa"))
    val b = d.select(col("doc_id").as("ib"), col("sh").as("sb"))
    val pairs = a.crossJoin(b).filter(col("ia") < col("ib") && pmod(col("ia") + col("ib"), lit(7L)) === 0L)
    assert(pairs.filter(
      hashExprs.array_long_intersect_count(col("sa"), col("sb")) =!=
        size(array_intersect(col("sa"), col("sb")))).count() === 0L)
    // duplicates inside an operand, empty operands, disjoint sets
    import spark.implicits._
    val edge = Seq(
      (Seq(1L, 2L, 2L, 3L), Seq(2L, 2L, 4L)),
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(5L, 6L), Seq(7L, 8L)),
      (Seq(1L, 1L, 1L), Seq(1L))
    ).toDF("x", "y")
    assert(edge.filter(
      hashExprs.array_long_intersect_count(col("x"), col("y")) =!=
        size(array_intersect(col("x"), col("y")))).count() === 0L)
  }

  test("ArrayLongOrderedPairs emits the exact pair multiset of the " +
      "explode-explode screen, incl duplicate/null/empty lists") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val lists: Seq[(Long, Seq[java.lang.Long])] = (0L until 80L).map { i =>
      val n = rnd.nextInt(9)
      i -> Seq.fill(n)(if (rnd.nextInt(10) == 0) null
        else java.lang.Long.valueOf(rnd.nextInt(6).toLong))
    } :+ (100L -> Seq.empty[java.lang.Long])
    val df = lists.toDF("lid", "ids")
    // reference: the containment screen's original formulation
    val ref = df.select(col("lid"), explode(col("ids")).as("a"), col("ids"))
      .select(col("lid"), col("a"), explode(col("ids")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy("lid", "a", "b").count()
    val fast = df.select(col("lid"),
        explode(hashExprs.array_long_ordered_pairs(col("ids"))).as("p"))
      .select(col("lid"), col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("lid", "a", "b").count()
    assert(ref.count() === fast.count())
    assert(ref.unionByName(fast).distinct().count() === ref.count())
    // sanity: some duplicates actually occurred so the dup edge is covered
    assert(ref.filter(col("count") > 1).count() > 0L)
  }

  test("SimHash63: deterministic, near-identical docs have small hamming distance") {
    import spark.implicits._
    val words = (1 to 60).map(i => s"word$i")
    val df = Seq(
      (1L, words),
      (2L, words.updated(5, "CHANGED")),
      (3L, (1 to 60).map(i => s"other$i"))
    ).toDF("id", "ws").select(col("id"), hashExprs.simhash63(col("ws")).as("h"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(m(1L), m(2L)) < ham(m(1L), m(3L)))
    assert(ham(m(1L), m(2L)) <= 10)
  }

  test("CosineSim is BIT-identical to the HOF aggregate(zip_with) cosine " +
      "on all testdata embedding pairs, and mirrors HOF null semantics") {
    // bit-identity (not approx) is the contract: round(cos, 6) feeds
    // hash-compared oracle rows in dedup_embedding / decontam_emb
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    // 500×50 pairs — bounded, covers every corpus vector on both sides
    val pairs = a.join(b.filter(col("ib") % 10 === 0), col("ia") =!= col("ib"))
      .select(
        hashExprs.cosine_sim(col("ea"), col("eb")).as("fast"),
        graft.sim.Knn.cosineHof(col("ea"), col("eb")).as("slow"))
    assert(pairs.filter(!(col("fast") <=> col("slow"))).count() === 0L)
    assert(pairs.count() === 500L * 50L - 50L)
    // null semantics match the HOF: null array, length mismatch, null elem
    val edge = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(NULL AS array<float>), array(1.0f, 2.0f)),
        |  (array(1.0f, 2.0f, 3.0f),    array(1.0f, 2.0f)),
        |  (array(1.0f, CAST(NULL AS float)), array(1.0f, 2.0f))
        |AS t(x, y)""".stripMargin)
      .select(hashExprs.cosine_sim(col("x"), col("y")).as("fast"),
        graft.sim.Knn.cosineHof(col("x"), col("y")).as("slow"))
      .collect()
    edge.foreach { r =>
      assert(r.isNullAt(0) === r.isNullAt(1))
      assert(r.isNullAt(0), s"expected null, got $r")
    }
  }
}
