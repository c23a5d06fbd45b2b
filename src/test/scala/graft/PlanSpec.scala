package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import graft.io.TableIO
import graft.gen.SyntheticTokens
import graft.compile.ConstraintCompiler

/** Plan-shape evidence for the scale claims: partition pruning, filter
  * pushdown, column pruning, broadcast join strategy, whole-stage codegen.
  * These assert on the PHYSICAL PLAN, because "would still work at 100 TB"
  * is a property of the plan, not of the 500-row output.
  */
class PlanSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val io = TableIO(spark)

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    val s = new java.io.ByteArrayOutputStream()
    Console.withOut(s) { df.explain("formatted") }
    s.toString
  }

  test("partitionBy write + key filter → partition pruning at the scan") {
    val path = java.nio.file.Files.createTempDirectory("graft_prune").toString
    val seqs = SyntheticTokens.cleanFrom(spark, dir).drop("orig")
    io.write(seqs, path, partitionBy = Seq("source"))
    val plan = planString(io.read(path).filter(col("source") === "src3"))
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("src3"))
    // pruned read touches exactly one of 20 partitions
    val pruned = io.read(path).filter(col("source") === "src3")
    assert(pruned.select(input_file_name()).distinct().count() <=
      io.read(path).select(input_file_name()).distinct().count() / 10)
  }

  test("predicate + column pruning reach the parquet scan") {
    val path = java.nio.file.Files.createTempDirectory("graft_push").toString
    io.write(SyntheticTokens.cleanFrom(spark, dir).drop("orig"), path)
    val q = io.read(path).filter(col("n_tok") > 100).select(col("doc_id"))
    val plan = planString(q)
    assert(plan.contains("PushedFilters: [IsNotNull(n_tok), GreaterThan(n_tok,100)]"), plan)
    // ReadSchema must not include tokens (column pruning)
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("tokens"), readSchema)
  }

  test("referential check: small dim compiles to an InSet scan predicate, " +
      "big dim to a broadcast join — never a shuffle of the fact side") {
    val docs = SyntheticTokens.readDocuments(spark, dir)
    // small dim (20 sources): plan-literal InSet — no join operator at all
    // (r5: a 20-entry STRING HashedRelation probe anti-scales at 32
    // threads; the literal set rides whole-stage codegen task-locally)
    val small = planString(graft.ref.ReferentialCheck.orphans(
      SyntheticTokens.clean(docs), "source", SyntheticTokens.sourcesDim(docs), "source"))
    assert(!small.contains("Join"), small)
    assert(small.contains("Filter"), small)
    // dim above the InSet gate: the broadcast anti-join shape, fact side
    // never shuffled
    import spark.implicits._
    val bigDim = spark.range(0L, graft.ref.ReferentialCheck.MaxInSetKeys + 10L, 1L, 2)
      .select(concat(lit("src"), col("id").cast("string")).as("source"))
    val big = planString(graft.ref.ReferentialCheck.orphans(
      SyntheticTokens.clean(docs), "source", bigDim, "source"))
    assert(big.contains("BroadcastHashJoin") || big.contains("BroadcastNestedLoopJoin"), big)
    assert(!big.contains("SortMergeJoin"), big)
  }

  test("row-validation pass stays inside whole-stage codegen (no lambda fallback)") {
    val seqs = SyntheticTokens.cleanFrom(spark, dir)
    val counted = ConstraintCompiler.withCounts(seqs, TokenSchema.sequences.rowConstraints)
      .filter(col(ConstraintCompiler.VCountCol) > 0)
    val plan = planString(counted)
    // the Filter and Project around _vcount must carry a codegen id
    val offenders = plan.linesIterator.filter(l =>
      (l.contains("Filter (") || l.contains("Project (")) && !l.contains("* ")).toSeq
    assert(offenders.isEmpty, s"non-codegen operators: $offenders\n$plan")
  }

  // formatted explain prints each operator twice (tree + detail section) —
  // count tree entries only
  private def treeCount(plan: String, op: String): Int =
    s"[+:]- $op".r.findAllIn(plan).size

  test("uniqueness is ONE shuffle: partial agg (the implicit salt) + final merge") {
    val seqs = SyntheticTokens.cleanFrom(spark, dir)
    val plan = planString(graft.unique.SaltedUniqueness.duplicates(seqs, "doc_id"))
    // partial+final HashAggregate pair around exactly one Exchange — the
    // map-side partial agg bounds per-reducer fan-in (≤ one row per key
    // per map task), so no second salted shuffle is needed
    assert(treeCount(plan, "HashAggregate") == 2, plan)
    assert(treeCount(plan, "Exchange") == 1, plan)
  }

  test("explicit-salt control keeps the two-stage shape (2 exchanges)") {
    val seqs = SyntheticTokens.cleanFrom(spark, dir)
    val plan = planString(graft.unique.SaltedUniqueness.duplicatesExplicitSalt(seqs, "doc_id"))
    assert(treeCount(plan, "HashAggregate") == 4, plan)
    assert(treeCount(plan, "Exchange") == 2, plan)
  }

  test("Validator.violations scans the fact side exactly 3x (fused row+ref, unique, drift)") {
    val path = java.nio.file.Files.createTempDirectory("graft_fused").toString
    // dirty corpus: real duplicate keys keep the uniqueness branch alive —
    // with a clean corpus its dup-hash LocalRelation is EMPTY and Catalyst
    // folds the whole branch (and its scan) away via empty-relation
    // propagation, which is itself the right plan
    io.write(SyntheticTokens.dirtyFrom(spark, dir).drop("orig"), path)
    val fact = io.read(path)
    val dim = spark.range(0L, 20L, 1L, 1)
      .select(concat(lit("src"), col("id").cast("string")).as("source"))
    val plan = planString(graft.run.Validator.violations(
      fact, TokenSchema.sequences, "doc_id", Map("sources" -> dim)))
    // formatted explain prints each Scan once in the tree and once in the
    // detail section — halve the raw count
    val factScans = "Scan parquet".r.findAllIn(plan).size / 2
    assert(factScans == 3,
      s"expected 3 fact scans (row+ref fused, unique, drift), got $factScans:\n" +
        plan.take(1500))
    // the referential check still rides a broadcast, never a fact shuffle
    assert(plan.contains("BroadcastHashJoin"), plan.take(1500))
  }

  test("AQE splits a skewed shuffle-join partition (skew mitigation live, not just enabled)") {
    // north-star line item: "AQE skew-join mitigation". One hot key carries
    // half the fact rows; thresholds are lowered so sandbox-size skew
    // triggers the SAME OptimizeSkewedJoin rule that handles production
    // skew — the assertion is on the EXECUTED adaptive plan, so this
    // proves the mitigation fires, not merely that the flag is set.
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "200k")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "100k")
      val fact = spark.range(0L, 50000L, 1L, 8).select(
        when(col("id") % 2 === 0, lit(7L)).otherwise(col("id")).as("k"),
        lpad(col("id").cast("string"), 64, "x").as("payload"))
      val dim = spark.range(0L, 50000L, 1L, 8)
        .select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = fact.join(dim, Seq("k"))
      assert(joined.count() === 50000L) // hot key matches exactly one dim row
      joined.collect() // finalize joined's OWN adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("skewed"),
        s"skew-join mitigation did not fire:\n${plan.take(2000)}")
    } finally keep.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("bloom-screened decontamination: the probe filters BEFORE any join or exchange") {
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val df = graft.curate.Curation.contaminationHitsBloom(
      d.filter(col("doc_id") % 97 =!= 0), d.filter(col("doc_id") % 97 === 0),
      "text", "doc_id")
    val plan = df.queryExecution.executedPlan.toString
    // the probe is a Filter expression (no join node), and it must sit
    // below the exact-verify join: everything the join sees is screened
    val probeAt = plan.indexOf("bloom_might_contain")
    val joinAt = plan.indexOf("Join")
    assert(probeAt >= 0, plan.take(800))
    assert(joinAt >= 0 && joinAt < probeAt,
      s"probe must be deeper in the tree (below the join):\n${plan.take(1200)}")
  }

  test("violation_examples: WindowGroupLimit caps partitions before the window exchange") {
    val plan = Queries.violationExamples(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k pushdown did not fire:\n${plan.take(1200)}")
  }

  test("split_safe: the corpus side takes its group id via broadcast, never a shuffle") {
    val plan = Queries.splitSafe(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("containment: inverted-index pipeline is key-equality joins only, posting agg once") {
    val d = spark.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
    val plan = planString(graft.dedup.Dedup.containmentPairs(d, "text", "doc_id", 0.9))
    // candidate generation must never degrade to a pair product: every join
    // is a key-equality hash join (broadcast at toy SF, shuffle at scale)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the posting-list build is ONE two-phase aggregate over the exploded
    // shingles (partial + final ObjectHashAggregate around one exchange)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("bucketed co-located join runs with ZERO exchange under the join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket").toString
    val lt = graft.io.Bucketed.table(
      spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice")),
      "plan_li_b", "l_orderkey", 8, s"$tmp/li")
    val ot = graft.io.Bucketed.table(
      spark.read.parquet(s"$dir/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      "plan_ord_b", "o_orderkey", 8, s"$tmp/ord")
    val joined = graft.io.Bucketed.colocatedJoin(spark, lt, ot,
      "l_orderkey", "o_orderkey")
    // the claim under test is the LARGE-LARGE regime (neither side fits a
    // broadcast at 100 TB) — at sf0.001 Catalyst would rightly broadcast,
    // so pin that regime for the plan assertion
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", prev)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = planString(joined)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(treeCount(plan, "Exchange") == 0,
        s"bucketed join must not shuffle either side:\n$plan")
      // the layout is also CORRECT: same row multiset as the shuffle join
      val shuffled = spark.read.parquet(s"$dir/lineitem.parquet")
        .join(spark.read.parquet(s"$dir/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() === shuffled.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prevAqe)
    }
  }
}
