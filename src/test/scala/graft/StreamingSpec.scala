package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.schema._
import graft.streaming.StreamingValidator

/** The same compiled constraints attached to a Structured Streaming plan:
  * violations stream + watermarked windowed aggregates + windowed
  * uniqueness, driven through MemoryStream micro-batches.
  */
class StreamingSpec extends SparkTestBase {

  import spark.implicits._

  private val schema = RecordSchema("Evt", Seq(
    FieldSpec("k", TextT, required = true),
    FieldSpec("v", IntT(4), min = Some(0L), max = Some(100L))),
    autoRegister = false)

  test("violation stream emits (key, constraint_id) per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int)]
    val stream = mem.toDF().toDF("k", "v")
    val q = StreamingValidator.violations(stream, schema, "k")
      .writeStream.format("memory").queryName("viols").outputMode("append").start()
    try {
      mem.addData(("a", 5), ("b", 101), ("c", -1))
      q.processAllAvailable()
      val got = spark.table("viols").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === Set(("b", "range_v"), ("c", "range_v")))
      mem.addData(("d", 200))
      q.processAllAvailable()
      assert(spark.table("viols").count() === 3L)
    } finally q.stop()
  }

  test("watermarked windowed violation counts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Int)]
    val stream = mem.toDF().toDF("ts", "k", "v")
    val q = StreamingValidator.windowedViolationCounts(stream, schema, "ts", "1 minute", "1 minute")
      .writeStream.format("memory").queryName("winviols").outputMode("update").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 00:00:10")
      val t1 = Timestamp.valueOf("2026-01-01 00:00:40")
      mem.addData((t0, "a", 5), (t1, "b", 999), (t1, "c", 7))
      q.processAllAvailable()
      val rows = spark.table("winviols").collect()
      assert(rows.map(_.getAs[Long]("rows")).sum === 3L)
      assert(rows.map(_.getAs[Long]("violation_count")).sum === 1L)
    } finally q.stop()
  }

  test("stateful streaming drift matches the batch gate after the last micro-batch") {
    import graft.constraint.Drift
    import graft.streaming.StreamingDrift
    implicit val sqlCtx = spark.sqlContext
    val d = Drift("v", "epoch", 10L, ksThreshold = 0.3)
    // two groups: g1's epochs share a distribution (no drift), g2's epoch 1
    // is shifted far right (drifts); delivered across TWO micro-batches so
    // the keyed state must accumulate, not recompute per batch
    val batch1 = Seq(("g1", 0, 5), ("g1", 1, 7), ("g1", 0, 15), ("g1", 1, 13),
      ("g2", 0, 5), ("g2", 0, 8))
    val batch2 = Seq(("g1", 0, 25), ("g1", 1, 27),
      ("g2", 0, 12), ("g2", 1, 71), ("g2", 1, 85), ("g2", 1, 92))
    val mem = MemoryStream[(String, Int, Int)]
    val stream = mem.toDF().toDF("g", "epoch", "v")
    val q = StreamingDrift.driftByGroup(stream, d, "g")
      .writeStream.format("memory").queryName("driftv").outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()
      // last verdict per group (update mode appends one row per touched batch)
      val fin = spark.table("driftv").collect()
        .map(r => (r.getString(0), (r.getDouble(1), r.getDouble(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5))))
        .groupBy(_._1).map { case (g, rows) => g -> rows.last._2 }
      assert(fin("g2")._5, s"g2 should drift: ${fin("g2")}")
      assert(!fin("g1")._5, s"g1 should not drift: ${fin("g1")}")
      // cross-check: identical statistics to the batch DriftGate over the
      // union of all delivered data
      val all = (batch1 ++ batch2).toDF("g", "epoch", "v")
      val batchStats = graft.drift.DriftGate.groupedStats(all, d, Seq("g"))
        .collect().map(r => (r.getString(0),
          (r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
      Seq("g1", "g2").foreach { g =>
        val (ks, chi2, n0, n1, _) = fin(g)
        assert((ks, chi2, n0, n1) === batchStats(g), s"group $g")
      }
    } finally q.stop()
  }

  test("windowed uniqueness flags duplicate keys within the window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val stream = mem.toDF().toDF("ts", "doc_id")
    val q = StreamingValidator.windowedDuplicates(stream, "doc_id", "ts", "1 minute", "1 minute")
      .writeStream.format("memory").queryName("windups").outputMode("update").start()
    try {
      val t = Timestamp.valueOf("2026-01-01 00:00:10")
      mem.addData((t, "x"), (t, "x"), (t, "y"))
      q.processAllAvailable()
      val dups = spark.table("windups").collect().map(_.getAs[String]("doc_id")).toSet
      assert(dups === Set("x"))
    } finally q.stop()
  }

  test("streaming session_window sessions match batch Sessionize (state across batches)") {
    // the batch operator (rel/Sessionize) is the planner's running-window
    // form; this drives the SAME semantics through Structured Streaming's
    // stateful session_window — sessions must merge across MICRO-BATCH
    // boundaries via the state store, then agree with the batch answer.
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long)]
    val stream = mem.toDF().toDF("ts", "user_id")
    val q = stream
      .withWatermark("ts", "10 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.format("memory").queryName("streamsess")
      .outputMode("complete").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
      def at(min: Int) = new Timestamp(t0.getTime + min * 60000L)
      // batch 1: open sessions; batch 2: extend one across the boundary,
      // start another past the gap
      mem.addData((at(0), 1L), (at(10), 1L), (at(0), 2L))
      q.processAllAvailable()
      mem.addData((at(35), 1L), (at(120), 1L), (at(31), 2L))
      q.processAllAvailable()
      val streaming = spark.table("streamsess")
        .select(col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batch = graft.rel.Sessionize.summarize(
          Seq((1L, at(0)), (1L, at(10)), (1L, at(35)), (1L, at(120)),
            (2L, at(0)), (2L, at(31))).toDF("user_id", "ts"),
          "user_id", "ts", gapUs = 30L * 60 * 1000000)
        .select(col("user_id"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      // user 1: {0,10,35} merge (gaps ≤30m), {120} separate; user 2: {0},{31}... 31-0 > 30m? 31 > 30 → separate
      assert(streaming == batch, s"streaming=$streaming batch=$batch")
      assert(batch == Seq((1L, 1L), (1L, 3L), (2L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  test("streaming contamination screen: no false negatives vs the exact batch answer") {
    implicit val sqlCtx = spark.sqlContext
    import graft.curate.Curation
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val train = d.filter(col("doc_id") % 97 =!= 0)
    val evalSet = d.filter(col("doc_id") % 97 === 0)
    // offline fit (batch side), exactly as contaminationHitsBloom builds it
    import graft.functions.hashExprs.word_shingles
    import graft.text.TextAnalysis.words
    val evalGrams = evalSet
      .select(explode(word_shingles(words(col("text")), 3)).as("g")).distinct()
    val hashed = evalGrams.select(xxhash64(col("g")).as("h"))
    val bloom = hashed.stat.bloomFilter("h", math.max(hashed.count(), 1L), 0.01)
    val bcast = spark.sparkContext.broadcast(bloom)
    // exact truth from the batch operator: (doc_id, distinct hit grams)
    val truth = Curation.contaminationHits(train, evalSet, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(truth.nonEmpty, "fixture must plant contamination")
    // stream the train docs through the screen
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = StreamingValidator.contaminationScreen(stream, "text", "doc_id", bcast)
      .writeStream.format("memory").queryName("screen").outputMode("append").start()
    try {
      mem.addData(train.select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq: _*)
      q.processAllAvailable()
      val cand = spark.table("screen").collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Int]("cand_ngrams").toLong).toMap
      // one-sided: every truly contaminated doc is flagged, with at least
      // its true hit count among the candidates (no false negatives)
      truth.foreach { case (id, hits) =>
        assert(cand.getOrElse(id, 0L) >= hits, s"doc $id: ${cand.get(id)} < $hits")
      }
      // the screen is informative at the GRAM level (its actual job:
      // shrinking the exact-verify join input): surplus candidate grams
      // across the whole corpus stay within a few × fpp of total grams.
      // Doc-level flag counts amplify fpp by any-of-N and are NOT the
      // screen's contract — the verify join removes those docs.
      val totalGrams = train.select(
          sum(size(word_shingles(words(col("text")), 3)))).first.getLong(0)
      val surplus = cand.values.sum - truth.values.sum
      assert(surplus >= 0 && surplus <= math.max(50L, totalGrams * 3 / 100),
        s"surplus $surplus of $totalGrams grams")
    } finally q.stop()
  }

  test("streaming dedup keeps the first occurrence of each content hash across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val stream = mem.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingValidator.dedupedWithinWatermark(stream, "text", "ts", "10 minutes")
      .writeStream.format("memory").queryName("streamdedup").outputMode("append").start()
    try {
      val t0 = Timestamp.valueOf("2026-01-01 00:00:10")
      val t1 = Timestamp.valueOf("2026-01-01 00:01:10")
      mem.addData((t0, 1L, "same text"), (t0, 2L, "same text"), (t0, 3L, "other"))
      q.processAllAvailable()
      // duplicate arriving in a LATER micro-batch is still dropped (state)
      mem.addData((t1, 4L, "same text"), (t1, 5L, "fresh"))
      q.processAllAvailable()
      val kept = spark.table("streamdedup").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept === Set(1L, 3L, 5L))
    } finally q.stop()
  }
}
