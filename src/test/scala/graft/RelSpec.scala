package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.rel.{AsofJoin, RangeJoin, Sessionize}

/** Semantics + plan-shape tests for the temporal relational operators
  * (rel/AsofJoin, rel/RangeJoin, rel/Sessionize). The oracle rows certify
  * them against DuckDB on real data; these pin the EDGE rules the sf0.01
  * data may not hit (exact-tie as-of matches, equal-timestamp tie-break,
  * NULL payload fields, window boundary inclusivity) and the single-shuffle
  * plan shape the 100 TB story depends on.
  */
class RelSpec extends SparkTestBase {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def planString(df: org.apache.spark.sql.DataFrame): String = {
    val s = new java.io.ByteArrayOutputStream()
    Console.withOut(s) { df.explain("formatted") }
    s.toString
  }
  private def treeCount(plan: String, op: String): Int =
    s"[+:]- $op".r.findAllIn(plan).size

  // ---------- as-of join ----------

  private lazy val left = Seq(
    (1L, 10L, ts("2024-01-01 10:00:00")), // after r2 → matches r2
    (1L, 11L, ts("2024-01-01 08:00:00")), // exact tie with r1 → matches r1 (<=)
    (1L, 12L, ts("2024-01-01 07:00:00")), // before all rights → NULL
    (2L, 20L, ts("2024-01-01 12:00:00"))  // key with no rights → NULL
  ).toDF("k", "lid", "t")

  private lazy val right = Seq(
    (1L, 100L, ts("2024-01-01 08:00:00"), "a"),
    (1L, 101L, ts("2024-01-01 09:00:00"), "b"),
    (1L, 99L, ts("2024-01-01 09:00:00"), "dup") // same ts as 101 — smaller tieBreak loses
  ).toDF("k", "rid", "t", "tag")

  private def asof() = AsofJoin.asofBackward(
    left, right.select(col("k"), col("t"), col("rid"), col("tag")),
    Seq("k"), "t", "t", Seq("rid", "tag"), tieBreak = "rid")

  test("asof: backward match, inclusive tie, left-join nulls, tie-break max") {
    val got: Map[Long, (Option[Long], Option[String])] =
      asof().select("lid", "rid", "tag").collect()
        .map { r =>
          r.getLong(0) -> ((
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            Option(r.getString(2))))
        }.toMap
    assert(got(10L) == ((Some(101L), Some("b"))))   // latest of the 09:00 pair by tieBreak
    assert(got(11L) == ((Some(100L), Some("a"))))   // exact-timestamp right row visible (<=)
    assert(got(12L) == ((None, None)))              // nothing prior
    assert(got(20L) == ((None, None)))              // key absent on the right
  }

  test("asof: NULL payload FIELD does not tear across right rows") {
    // r2 has tag=NULL; a per-column last(ignoreNulls) would pair r2's rid
    // with r1's tag. The struct transport must keep the NULL.
    val r = Seq(
      (1L, 100L, ts("2024-01-01 08:00:00"), Some("a")),
      (1L, 101L, ts("2024-01-01 09:00:00"), None: Option[String])
    ).toDF("k", "rid", "t", "tag")
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("k", "lid", "t")
    val row = AsofJoin.asofBackward(l, r.select(col("k"), col("t"), col("rid"), col("tag")),
        Seq("k"), "t", "t", Seq("rid", "tag"), tieBreak = "rid")
      .select("rid", "tag").collect().head
    assert(row.getLong(0) == 101L && row.isNullAt(1))
  }

  test("asof: plan is ONE exchange (union + single window), no join node") {
    val plan = planString(asof())
    assert(treeCount(plan, "Exchange") == 1, plan)
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"), plan)
  }

  test("asof sharded ≡ plain on a skewed timeline (boundary carries exercised)") {
    // hot key 1 carries 90% of rows; 60 s shards over a ~1000 s span force
    // ~17 shards per key, so most left rows must coalesce a carried payload
    // from an earlier shard, not a within-shard match.
    val rnd = new scala.util.Random(42)
    def at(ms: Long) = new Timestamp(1700000000000L + ms)
    val l = (1 to 300).map { i =>
      (if (i % 10 == 0) 2L else 1L, i.toLong, at(rnd.nextInt(1000000).toLong))
    }.toDF("k", "lid", "t")
    val r = (1 to 80).map { i =>
      (if (i % 8 == 0) 2L else 1L, 1000L + i, at(rnd.nextInt(1000000).toLong), s"p$i")
    }.toDF("k", "rid", "t", "tag")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "rid", "tag").collect()
        .map(row => (row.getLong(0),
          if (row.isNullAt(1)) -1L else row.getLong(1),
          Option(row.getString(2)).getOrElse(""))).sorted.toSeq
    val rr = r.select(col("k"), col("t"), col("rid"), col("tag"))
    val plain = AsofJoin.asofBackward(l, rr, Seq("k"), "t", "t",
      Seq("rid", "tag"), tieBreak = "rid")
    val sharded = AsofJoin.asofBackwardSharded(l, rr, Seq("k"), "t", "t",
      Seq("rid", "tag"), tieBreak = "rid", shardUs = 60L * 1000000)
    val (p, s) = (norm(plain), norm(sharded))
    assert(p == s)
    assert(p.count(_._2 == -1L) < p.size, "some rows must match") // sanity
  }

  test("asof forward: earliest at-or-after match, smallest tie-break, nulls past the end") {
    val l = Seq(
      (1L, 10L, ts("2024-01-01 08:30:00")), // between r1 and the 09:00 pair → 09:00
      (1L, 11L, ts("2024-01-01 09:00:00")), // exact tie → matched (>=)
      (1L, 12L, ts("2024-01-01 09:30:00")), // after all rights → NULL
      (2L, 20L, ts("2024-01-01 08:00:00"))  // key with no rights → NULL
    ).toDF("k", "lid", "t")
    val got = AsofJoin.asofForward(
        l, right.select(col("k"), col("t"), col("rid"), col("tag")),
        Seq("k"), "t", "t", Seq("rid", "tag"), tieBreak = "rid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(10L) == Some(99L))  // smallest tieBreak of the 09:00 pair
    assert(got(11L) == Some(99L))  // at-timestamp right row visible (>=)
    assert(got(12L) == None)
    assert(got(20L) == None)
  }

  // ---------- range join ----------

  test("range join: [t-w, t) boundaries — w-ago included, probe instant excluded") {
    val probe = Seq((1L, 500L, ts("2024-01-01 10:00:00"))).toDF("k", "pid", "t")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), 1.0),  // exactly w ago → IN
      (1L, ts("2024-01-01 08:59:59"), 2.0),  // older than w → OUT
      (1L, ts("2024-01-01 10:00:00"), 3.0),  // probe instant → OUT (strict <)
      (1L, ts("2024-01-01 09:30:00"), 4.0)   // interior → IN
    ).toDF("k", "t", "v")
    val pairs = RangeJoin.trailingWindowPairs(probe, build, "k", "t", "t",
      Seq("pid"), Seq("v"), windowUs = 3600L * 1000000)
    assert(pairs.select("v").collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.0, 4.0))
  }

  test("range join agg: zero-fill keeps matchless probe rows, once each") {
    val probe = Seq((1L, 500L, ts("2024-01-01 10:00:00")),
      (2L, 501L, ts("2024-01-01 10:00:00"))).toDF("k", "pid", "t")
    val build = Seq((1L, ts("2024-01-01 09:30:00"), 4.0)).toDF("k", "t", "v")
    val got = RangeJoin.trailingWindowAgg(probe, build, "k", "t", "t",
        probeId = "pid", probeCols = Seq("k"), buildCols = Seq("v"),
        windowUs = 3600L * 1000000,
        aggs = Seq(count(col("v")).as("n")))
      .select(col("pid"), coalesce(col("n"), lit(0L)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(500L -> 1L, 501L -> 0L))
  }

  test("range join: equi-join on (key, bucket) — no nested-loop join in the plan") {
    val probe = Seq((1L, 500L, ts("2024-01-01 10:00:00"))).toDF("k", "pid", "t")
    val build = Seq((1L, ts("2024-01-01 09:30:00"), 4.0)).toDF("k", "t", "v")
    val plan = planString(RangeJoin.trailingWindowPairs(probe, build, "k", "t", "t",
      Seq("pid"), Seq("v"), windowUs = 3600L * 1000000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  // ---------- CDC merge apply ----------

  test("mergeInto: U-after-D resurrects a key; payload NULLs on D are fine") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val changes = Seq(
      (1L, "D", 1L, null.asInstanceOf[String]),
      (1L, "U", 2L, "a2"), // later seq resurrects
      (2L, "D", 5L, null.asInstanceOf[String]),
      (3L, "I", 1L, "c")
    ).toDF("k", "op", "seq", "v")
    val got = graft.rel.MergeInto.applyChanges(snap, changes, "k", "op", "seq", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a2", 3L -> "c"))
  }

  test("mergeInto: broadcast (zero-snapshot-shuffle) variant ≡ full-outer variant") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("k", "v")
    val changes = Seq(
      (1L, "D", 1L, null.asInstanceOf[String]),
      (2L, "U", 1L, "stale"), (2L, "U", 2L, "b2"),
      (3L, "U", 1L, "c1"), (3L, "D", 2L, null.asInstanceOf[String]),
      (9L, "I", 1L, "new"), (8L, "D", 1L, null.asInstanceOf[String])
    ).toDF("k", "op", "seq", "v")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val full = graft.rel.MergeInto.applyChanges(snap, changes, "k", "op", "seq", Seq("v"))
    val bc = graft.rel.MergeInto.applyChangesBroadcast(snap, changes, "k", "op", "seq", Seq("v"))
    assert(rows(full) == rows(bc))
    assert(rows(bc) == Seq((2L, "b2"), (4L, "d"), (9L, "new")))
    // the broadcast variant's plan: no sort-merge join, no snapshot-side
    // exchange — only the feed's window compaction shuffles (the feed is
    // a local relation here, so ANY remaining exchange is feed-only)
    val plan = {
      val s = new java.io.ByteArrayOutputStream()
      Console.withOut(s) { bc.explain("formatted") }
      s.toString
    }
    assert(!plan.contains("SortMergeJoin"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("mergeInto: duplicate (key, seq) in the feed fails loudly, never picks a winner") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "U", 7L, "x"), (1L, "U", 7L, "y")).toDF("k", "op", "seq", "v")
    val e = intercept[Exception] {
      graft.rel.MergeInto.applyChanges(snap, changes, "k", "op", "seq", Seq("v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ambiguous")), e.toString)
  }

  test("mergeInto: an unknown op code raises instead of silently upserting") {
    val snap = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "X", 1L, "boom")).toDF("k", "op", "seq", "v")
    val e = intercept[Exception] {
      graft.rel.MergeInto.applyChanges(snap, changes, "k", "op", "seq", Seq("v")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unknown op")), e.toString)
  }

  // ---------- sessionization ----------

  test("sessionize ≡ Spark's native session_window on real events (count AND span)") {
    // session_window merges events whose gap ≤ gapDuration — the same rule
    // as Sessionize's strict `> gap` split. Cross-checking against Spark's
    // own (streaming-capable) session operator certifies the semantics
    // with an implementation we didn't write. Span: window.end = last+gap,
    // so (end − start) − gap == last − first == duration_us.
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val gapUs = 30L * 60 * 1000000
    val ours = Sessionize.summarize(ev, "user_id", "ts", gapUs)
      .select(col("user_id"), col("n_events"), col("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    val theirs = ev
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("n_events"),
        (unix_micros(col("w.end").cast("timestamp")) -
          unix_micros(col("w.start").cast("timestamp")) - gapUs).as("duration_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(ours.nonEmpty && ours == theirs)
  }

  test("sessionize: strict-gap boundary (gap == gapUs stays in session)") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 10:30:00")), // exactly 30 min later → same session
      (1L, ts("2024-01-01 11:00:01")), // 30 min + 1 s → new session
      (2L, ts("2024-01-01 10:00:00"))
    ).toDF("k", "t")
    val got = Sessionize.summarize(ev, "k", "t", gapUs = 30L * 60 * 1000000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 1L))
  }

  // ---------- ordering (monotonicity) audit ----------

  test("order audit: regression fires, equal timestamps don't, keys isolate, NULLs never fire") {
    // key 1: 10 → 20 → 15 (inversion at ord 3) → 15 (equal: NOT an
    //   inversion) → NULL (unproven: never fires) → 30 (prev is NULL:
    //   never fires — the comparison is unproven, not a regression)
    // key 2: descends 100 → 5 across keys is irrelevant; within key 2 the
    //   single row can't invert (first row of a key never fires)
    val rows = Seq[(Long, Long, Option[Long])](
      (1L, 1L, Some(10L)), (1L, 2L, Some(20L)), (1L, 3L, Some(15L)),
      (1L, 4L, Some(15L)), (1L, 5L, None), (1L, 6L, Some(30L)),
      (2L, 7L, Some(5L)))
    val df = rows.toDF("k", "ord", "t_us")
    val got = graft.rel.OrderAudit.inversions(df, "k", col("t_us"), "ord")
      .select("k", "ord", "_prev_ord").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 3L, 2L)))
  }

  test("order audit: declared Monotonic constraint routes through Validator's sink shape") {
    val df = Seq(
      ("a", 1L, ts("2024-01-01 10:00:00")),
      ("b", 2L, ts("2024-01-01 11:00:00")),
      ("c", 3L, ts("2024-01-01 10:30:00")) // regresses behind ord 2
    ).toDF("doc_id", "ord", "ts").withColumn("k", lit(1L))
    val m = graft.constraint.Monotonic("ts", "ord", "k")
    val got = graft.rel.OrderAudit.violations(df, m, "doc_id").collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("c", "monotonic_ts")))
  }

  test("order audit: plan is ONE exchange (shuffle on the key, lag window, no join)") {
    val df = Seq((1L, 1L, 10L), (1L, 2L, 5L)).toDF("k", "ord", "t_us")
    val plan = planString(
      graft.rel.OrderAudit.inversions(df, "k", col("t_us"), "ord"))
    assert(treeCount(plan, "Exchange") == 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("salted join: result-invariant vs the plain join; build side fans out salts×") {
    import graft.rel.SaltedJoin
    // hot key 1L owns 2/3 of the probe side
    val big = (1 to 90).map(i => (if (i % 3 != 0) 1L else i.toLong, i.toLong))
      .toDF("k", "rid")
    val dim = Seq((1L, "hot"), (3L, "c"), (6L, "f"), (9L, "i"), (99L, "absent"))
      .toDF("dk", "tag")
    val salted = SaltedJoin.inner(big, dim, "k", "dk", xxhash64(col("rid")), salts = 4)
    val plain = big.join(dim, col("k") === col("dk"))
    // identical multiset of rows, identical columns (salts dropped)
    assert(salted.columns.sorted.toSeq === plain.columns.sorted.toSeq)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0L)
    assert(plain.exceptAll(salted).count() === 0L)
    // the build side really replicates: pre-join row count = |dim| × salts
    val build = dim.withColumn("_salt_b", explode(typedLit((0 until 4).toArray)))
    assert(build.count() === dim.count() * 4)
    // and the probe's hot key spreads over >1 salt shard
    val shards = big.filter(col("k") === 1L)
      .select(pmod(xxhash64(col("rid")), lit(4L))).distinct().count()
    assert(shards > 1L, s"hot key must fan out, got $shards shard(s)")
  }
}
