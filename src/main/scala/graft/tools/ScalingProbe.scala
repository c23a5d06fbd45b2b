package graft.tools

import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.gen.SyntheticTokens
import graft.run.Validator
import graft.TokenSchema

/** Per-component 8-vs-32-core scaling attribution (VERDICT r1 next-round #2).
  *
  * For each suite component, interleaves the two core levels over R rounds
  * (host noise is bursty — ARCHITECTURE.md "Scaling evidence protocol"),
  * takes the MIN wall per (component, level), and reports throughput at both
  * plus efficiency = (thr_hi/thr_lo)/(hi/lo). GC time is sampled around each
  * rep so allocation-bound components are visible.
  *
  * Components:
  *   gen     — token synthesis only (forces every array element via a sum)
  *   rowpass — constraint violation count over synthesized rows
  *   unique  — salted uniqueness (2-stage agg, 10M distinct string keys)
  *   ref     — broadcast anti-join on source
  *   drift   — histogram partial agg + KS/chi2 tail
  *   suite   — the full unioned validator (the headline)
  */
object ScalingProbe {

  private def gcMillis: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val loCores = sys.env.getOrElse("SP_LO", "8").toInt
    val hiCores = sys.env.getOrElse("SP_HI", "32").toInt
    val only = args.lift(2).map(_.split(',').toSet) // optional component filter
    val localDir = sys.env.get("SP_LOCAL_DIR") // e.g. /dev/shm/spark
    val shufPartsOf: Int => Int = c =>
      sys.env.get("SP_SHUF_ABS").map(_.toInt) // identical-job protocol
        .orElse(sys.env.get("SP_SHUF_MULT").map(_.toInt * c))
        .getOrElse(c)

    def session(cores: Int): SparkSession = {
      val b = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", shufPartsOf(cores).toString)
        .config("spark.ui.enabled", "false")
      localDir.foreach(b.config("spark.local.dir", _))
      sys.env.get("SP_CONF").foreach { kvs =>
        kvs.split(';').filter(_.nonEmpty).foreach { kv =>
          val Array(k, v) = kv.split('=')
          b.config(k, v)
        }
      }
      val s = b.getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    val inputParts = sys.env.get("SP_INPUT_PARTS").map(_.toInt).getOrElse(64)
    def input(s: SparkSession): DataFrame = SyntheticTokens.synthetic(s, rows, inputParts)
    def dim(s: SparkSession): DataFrame = s.range(0L, 20L, 1L, 1)
      .select(concat(lit("src"), col("id").cast("string")).as("source"))

    val components: Seq[(String, SparkSession => Long)] = Seq(
      "gen" -> { s: SparkSession =>
        // xxhash64 over the array walks every byte inside codegen — forces
        // full token materialization + one read pass, no shuffle
        input(s).select(sum(pmod(xxhash64(col("tokens")), lit(1000000000L)))).head().getLong(0)
      },
      "rowpass" -> { s: SparkSession =>
        graft.compile.ConstraintCompiler.withPass(input(s), TokenSchema.sequences.rowConstraints)
          .filter(!col("_pass")).count()
      },
      "unique" -> { s: SparkSession =>
        graft.unique.SaltedUniqueness.duplicates(input(s), "doc_id").count()
      },
      "unique2" -> { s: SparkSession =>
        // hash-compaction variant (see SaltedUniqueness.duplicatesHashCompacted)
        graft.unique.SaltedUniqueness.duplicatesHashCompacted(input(s), "doc_id").count()
      },
      "unique3" -> { s: SparkSession =>
        // skip-partial-agg probe: repartition(key) shuffles RAW keys (no
        // map-side hash-map build — it reduces nothing on all-distinct
        // keys), then ONE reducer-side hash count via mapPartitions
        import s.implicits._
        input(s).select(col("doc_id")).as[String]
          .repartition(shufPartsOf(s.sparkContext.defaultParallelism), col("doc_id"))
          .mapPartitions { it =>
            val m = new java.util.HashMap[String, Long](1 << 20)
            it.foreach(k => m.merge(k, 1L, (a, b) => a + b))
            m.entrySet().iterator().asScala.collect {
              case e if e.getValue > 1 => (e.getKey, e.getValue)
            }
          }.toDF("doc_id", "cnt").count()
      },
      "uniqueSort" -> { s: SparkSession =>
        // SORT-BASED dup detection probe: the hash path's reducer-side is a
        // per-partition hash map with RANDOM DRAM access (the measured
        // 32-thread scaling killer); this formulation shuffles the same
        // 8-byte xxhash64 keys but detects duplicates as EQUAL-ADJACENT
        // after an in-partition radix sort — sequential passes instead of
        // random probes. Declarative one-shuffle shape: the window
        // partitions by the SAME pmod expression the repartition used, so
        // EnsureRequirements adds no second exchange (only the sort the
        // window needs anyway). Counts extra occurrences, the same work as
        // dup detection.
        val parts = shufPartsOf(s.sparkContext.defaultParallelism)
        val grp = pmod(col("h"), lit(parts.toLong))
        val w = org.apache.spark.sql.expressions.Window.partitionBy(grp).orderBy(col("h"))
        input(s).select(xxhash64(col("doc_id")).as("h"))
          .repartition(parts, grp)
          .withColumn("dup", col("h") === lag(col("h"), 1).over(w))
          .filter(col("dup")).count()
      },
      "uniqueSalt" -> { s: SparkSession =>
        // explicit two-stage salted form (two full shuffles in the
        // mostly-distinct regime — kept as the control)
        graft.unique.SaltedUniqueness.duplicatesExplicitSalt(input(s), "doc_id").count()
      },
      "ref" -> { s: SparkSession =>
        graft.ref.ReferentialCheck.orphans(input(s), "source", dim(s), "source").count()
      },
      "drift" -> { s: SparkSession =>
        graft.drift.DriftGate.groupedStats(input(s),
          TokenSchema.sequences.tableConstraints.collectFirst { case d: graft.constraint.Drift => d }
            .getOrElse(graft.constraint.Drift("n_tok", "epoch", 16, 0.05)),
          Nil).count()
      },
      "suite" -> { s: SparkSession =>
        Validator.violations(input(s), TokenSchema.sequences, "doc_id",
          Map("sources" -> dim(s))).count()
      }
    ).filter(c => only.forall(_.contains(c._1)))

    // min wall + min GC per (component, level); one shared JVM, levels
    // interleaved per round so bursty host noise hits both symmetrically
    val best = scala.collection.mutable.Map[(String, Int), Double]()
    val gcAt = scala.collection.mutable.Map[(String, Int), Double]()
    (1 to rounds).foreach { round =>
      Seq(loCores, hiCores).foreach { cores =>
        val s = session(cores)
        components.foreach { case (name, f) =>
          if (round == 1) f(s) // untimed per-level warmup (JIT/codegen)
          s.catalog.clearCache() // gated uniqueness persists its dup-hash set
          val g0 = gcMillis
          val t0 = System.nanoTime()
          f(s)
          val w = (System.nanoTime() - t0) / 1e9
          val g = (gcMillis - g0) / 1e3
          val k = (name, cores)
          if (!best.contains(k) || w < best(k)) { best(k) = w; gcAt(k) = g }
          println(f"[scale] round=$round cores=$cores%2d $name%-8s wall=$w%6.2f s gc=$g%5.2f s")
        }
        s.stop()
      }
    }
    println(f"[scale] === summary (rows=$rows, min over $rounds rounds) ===")
    println(f"[scale] ${"component"}%-8s | t$loCores%d (gc) | t$hiCores%d (gc) | speedup | efficiency")
    components.foreach { case (name, _) =>
      val tl = best((name, loCores)); val th = best((name, hiCores))
      val sp = tl / th
      val eff = sp / (hiCores.toDouble / loCores)
      println(f"[scale] $name%-8s | $tl%6.2f (${gcAt((name, loCores))}%4.2f) | $th%6.2f (${gcAt((name, hiCores))}%4.2f) | $sp%5.2f | $eff%5.3f")
    }
  }
}
