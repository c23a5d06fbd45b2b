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

  test("stats pass is permutation- and partitioning-invariant") {
    val ns = sample(Gen.listOfN(300, Gen.choose(0, 5000)), 99L)
    def stats(xs: Seq[Int], parts: Int) =
      xs.toDF("n").repartition(parts).agg(
        count(col("n")), min(col("n")), max(col("n")),
        sum(col("n").cast("long")), percentile(col("n"), lit(0.5))).head()
    val shuffled = new scala.util.Random(5).shuffle(ns)
    assert(stats(ns, 13) === stats(shuffled, 3))
  }
}
