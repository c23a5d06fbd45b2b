package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.compile.ConstraintCompiler
import graft.constraint._
import graft.schema._
import graft.unique.SaltedUniqueness

/** Property-based invariants (SURVEY §5.3) using plain ScalaCheck
  * generators with fixed seeds (deterministic CI), batched: each trial
  * generates a whole table and runs ONE Spark job.
  */
class PropertySpec extends SparkTestBase {

  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val schema = RecordSchema("P", Seq(
    FieldSpec("k", TextT, required = true),
    FieldSpec("e", EnumT(Seq("a", "b", "c"))),
    FieldSpec("n", IntT(4), min = Some(0L), max = Some(1000L)),
    FieldSpec("xs", ListT(IntT(4), elemMin = Some(0L), elemMax = Some(99L)))),
    autoRegister = false)

  private val validRow: Gen[(String, String, Int, Seq[Int])] = for {
    k <- Gen.identifier.map(s => if (s.isEmpty) "k" else s.take(12))
    e <- Gen.oneOf("a", "b", "c")
    n <- Gen.choose(0, 1000)
    xs <- Gen.listOf(Gen.choose(0, 99))
  } yield (k, e, n, xs)

  test("valid-by-construction rows produce zero violations (3 seeded trials)") {
    (1 to 3).foreach { t =>
      val rows = sample(Gen.listOfN(200, validRow), 42L + t)
      val df = rows.toDF("k", "e", "n", "xs")
        .select(col("k"), col("e"), col("n").cast("int"), col("xs").cast("array<int>"))
      assert(ConstraintCompiler.violations(df, schema.rowConstraints, Seq("k")).count() === 0L)
    }
  }

  test("one injected mutation yields exactly the matching constraint id") {
    val mutations: Seq[(String, ((String, String, Int, Seq[Int])) => (String, String, Int, Seq[Int]))] = Seq(
      "required_k" -> { case (_, e, n, xs) => (null, e, n, xs) },
      "enum_e" -> { case (k, _, n, xs) => (k, "ZZZ", n, xs) },
      "range_n" -> { case (k, e, _, xs) => (k, e, -7, xs) },
      "array_elem_xs" -> { case (k, e, n, xs) => (k, e, n, xs :+ 100) })
    // one batched job: each generated valid row gets one mutation class
    val rows = sample(Gen.listOfN(100, validRow), 4242L).zipWithIndex.map {
      case (r, i) =>
        val (expected, f) = mutations(i % mutations.size)
        val (k, e, n, xs) = f(r)
        (i.toLong, expected, k, e, n, xs)
    }
    val df = rows.toDF("id", "expected", "k", "e", "n", "xs")
      .select(col("id"), col("expected"), col("k"), col("e"),
        col("n").cast("int"), col("xs").cast("array<int>"))
    val got = ConstraintCompiler
      .violations(df, schema.rowConstraints, Seq("id", "expected"))
      .groupBy("id").agg(count(lit(1)).as("c"),
        min(col("constraint_id")).as("got"), min(col("expected")).as("exp"))
    assert(got.count() === 100L)                       // every row violated
    assert(got.filter(col("c") =!= 1).count() === 0L)  // exactly once
    assert(got.filter(col("got") =!= col("exp")).count() === 0L) // the right id
  }

  test("salted and naive uniqueness agree on arbitrary key multisets") {
    (1 to 3).foreach { t =>
      val ks = sample(Gen.listOfN(500, Gen.frequency(
        3 -> Gen.const("HOT"),
        5 -> Gen.identifier.map(s => (s + "x").take(4)),
        1 -> Gen.const(null: String))), 7L * t)
      val df = ks.toDF("k").repartition(7)
      val a = SaltedUniqueness.duplicates(df, "k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val b = SaltedUniqueness.naiveDuplicates(df, "k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val c = SaltedUniqueness.duplicatesHashCompacted(df, "k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val d = SaltedUniqueness.duplicatesExplicitSalt(df, "k")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(a === b)
      assert(c === b) // hash compaction is exact: collisions re-verified on the key
      assert(d === b) // explicit two-stage salt is the same multiset count
      assert(a.exists(_._1 == "HOT")) // the generator plants a hot key
    }
  }

  test("containment dominates Jaccard: every symmetric near-dup pair is a containment pair") {
    // C(A,B) = |∩|/min ≥ |∩|/|∪| = J(A,B), and with dfCap ≥ ndocs the
    // inverted-index candidates are a superset of any pair sharing one
    // shingle — so at equal thresholds the containment pass must emit a
    // SUPERSET of the exact-Jaccard pipeline's pairs on any corpus.
    (1 to 2).foreach { t =>
      val words = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
      val texts = sample(Gen.listOfN(40, Gen.listOfN(12, words).map(_.mkString(" "))), 31L * t)
      val df = texts.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "text")
      val jac = graft.dedup.Dedup.ngramJaccardPairs(df, "text", "doc_id", 0.4)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      val cont = graft.dedup.Dedup.containmentPairs(df, "text", "doc_id", 0.4, dfCap = 1000)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(jac.subsetOf(cont), s"jaccard pairs missing from containment: ${jac -- cont}")
    }
  }

  test("stats pass is permutation- and partitioning-invariant") {
    val ns = sample(Gen.listOfN(300, Gen.choose(0, 5000)), 99L)
    def stats(xs: Seq[Int], parts: Int) =
      xs.toDF("n").repartition(parts).agg(
        count(col("n")), min(col("n")), max(col("n")),
        sum(col("n").cast("long")), percentile(col("n"), lit(0.5))).head()
    val shuffled = new scala.util.Random(5).shuffle(ns)
    assert(stats(ns, 13) === stats(shuffled, 3))
  }

  test("URL canonicalization is idempotent and variant-invariant over generated URLs") {
    // structured URL generator: every messy degree of freedom the
    // canonicalizer claims to erase, composed randomly (hosts avoid a
    // literal 'www' label — stripping ONE leading www is by design)
    val urlGen: Gen[(String, String)] = for {
      scheme <- Gen.oneOf("http", "https")
      schemeCase <- Gen.oneOf(true, false)
      www <- Gen.oneOf("", "www.")
      label <- Gen.oneOf("alpha", "beta", "cdn7", "site")
      hostCase <- Gen.oneOf(true, false)
      port <- Gen.oneOf("", if (scheme == "https") ":443" else ":80")
      path <- Gen.listOf(Gen.oneOf("a", "B", "c9")).map(_.take(3))
      slash <- Gen.oneOf("", "/")
      keep <- Gen.someOf(Seq("ref=1", "b=2", "Z=3"))
      track <- Gen.someOf(Seq("utm_source=x", "utm_c=y", "fbclid=f", "gclid=g"))
      frag <- Gen.oneOf("", "#frag")
    } yield {
      val host = s"$www$label.example.com"
      val q = new scala.util.Random(keep.size * 7 + track.size).shuffle((keep ++ track).toList)
      val url = (if (schemeCase) scheme.toUpperCase else scheme) + "://" +
        (if (hostCase) host.toUpperCase else host) + port +
        (if (path.isEmpty) "" else path.mkString("/", "/", "")) + slash +
        (if (q.isEmpty) "" else q.mkString("?", "&", "")) + frag
      // the canonical form this should collapse to
      val canon = s"$scheme://$label.example.com" +
        (if (path.isEmpty) "" else path.mkString("/", "/", "")) +
        (if (keep.isEmpty) "" else keep.sorted.mkString("?", "&", ""))
      (url, canon)
    }
    val cases = sample(Gen.listOfN(120, urlGen), 1234L)
    val got = cases.map(_._1).toDF("url")
      .select(col("url"),
        graft.curate.UrlCanon.canonicalize(col("url")).as("c1"))
      .select(col("url"), col("c1"),
        graft.curate.UrlCanon.canonicalize(col("c1")).as("c2"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    cases.foreach { case (url, want) =>
      val (c1, c2) = got(url)
      assert(c1 === want, s"canon($url)")
      assert(c2 === c1, s"not idempotent: $url -> $c1 -> $c2")
    }
  }

  test("chunk plan: coverage, overlap, and count laws over random lengths") {
    val ns = sample(Gen.listOfN(150, Gen.choose(1, 500)), 777L)
    val docs = ns.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"w$t").mkString(" "))
    }
    val plan = graft.text.Chunker.chunkPlan(
        docs.toDF("doc_id", "text"), "text", "doc_id", 32, 24)
      .collect().groupBy(_.getLong(0))
    docs.foreach { case (id, text) =>
      val n = text.split(" ").length.toLong
      val rows = plan(id).sortBy(_.getAs[Long]("tok_start"))
      val wantCount = if (n <= 32) 1L else 1L + (n - 32 + 23) / 24
      assert(rows.length.toLong === wantCount, s"doc $id n=$n")
      val last = rows.last
      assert(last.getAs[Long]("tok_start") + last.getAs[Long]("chunk_len") === n)
      rows.foreach { r =>
        val len = r.getAs[Long]("chunk_len")
        assert(len > 0 && len <= 32)
      }
    }
  }

  test("vocab drift TV: symmetric under epoch swap, invariant under token relabeling, monotone plant") {
    import graft.drift.VocabDrift
    val gen = Gen.listOfN(60,
      Gen.zip(Gen.oneOf(0, 1), Gen.listOfN(24, Gen.choose(0, 80))))
    (1 to 3).foreach { trial =>
      val rows = sample(gen, 9100L + trial)
      val df = rows.toDF("epoch", "tokens")
        .withColumn("tokens", col("tokens").cast("array<int>"))
      def tv(d: org.apache.spark.sql.DataFrame): Long =
        VocabDrift.tvSummary(d, "tokens", "epoch").head()
          .getAs[Long]("tv_permille")
      val base = tv(df)
      // epoch swap: |p0 - p1| is symmetric
      val swapped = df.withColumn("epoch", lit(1) - col("epoch"))
      assert(tv(swapped) === base, "TV must be symmetric under epoch swap")
      // bijective token relabeling (x -> 7919 - x on [0,80] stays injective)
      val relabeled = df.withColumn("tokens",
        expr("transform(tokens, x -> CAST(7919 - x AS INT))"))
      assert(tv(relabeled) === base, "TV must be invariant under relabeling")
      // planting a disjoint-vocab block into epoch 1 never lowers TV
      val planted = df.unionByName(
        Seq((1, Seq.fill(24)(9999))).toDF("epoch", "tokens")
          .withColumn("tokens", col("tokens").cast("array<int>")))
      assert(tv(planted) >= base, "disjoint-mass plant must not lower TV")
    }
  }
}
