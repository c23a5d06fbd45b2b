package graft

/** ANSI-SQL twins of every oracle-checked query, runnable by DuckDB against
  * the same parquet tables (driver contract — Verify.scala:4-5).
  *
  * The synthetic-sequence CTEs mirror graft.gen.SyntheticTokens FORMULA FOR
  * FORMULA: pure integer arithmetic only, every intermediate < 2^63 and
  * non-negative (so `%` == pmod and DuckDB's checked arithmetic never
  * trips). Double-valued outputs are restricted to expressions whose
  * floating-point evaluation order is identical in both engines
  * (index-ordered left folds, max over identical terms) or rounded at a
  * safety margin far above 1 ulp.
  */
object OracleSql {

  private val Base =
    """base AS (
      |  SELECT doc_id AS orig, doc_id % 50 AS cls, source,
      |         CAST(1 + (doc_id*40503 + 17) % 512 AS INTEGER) AS n_tok0
      |  FROM documents
      |)""".stripMargin

  private val SeqsCte =
    """seqs AS (
      |  SELECT 'doc-' || lpad(CAST(orig AS VARCHAR), 12, '0') AS doc_id,
      |         list_transform(range(0, n_tok0),
      |           i -> CAST((orig*2654435761 + i*97003 + 7) % 32768 AS INTEGER)) AS tokens,
      |         n_tok0 AS n_tok, source, orig
      |  FROM base
      |)""".stripMargin

  private val Seqs = Base + ",\n" + SeqsCte

  private val Dirty = Base +
    """,
      |dirty AS (
      |  SELECT
      |    CASE WHEN cls = 1 THEN NULL
      |         WHEN cls = 2 THEN 'doc-' || lpad('999000', 12, '0')
      |         WHEN cls = 7 THEN 'doc-' || lpad('999007', 12, '0')
      |         ELSE 'doc-' || lpad(CAST(orig AS VARCHAR), 12, '0') END AS doc_id,
      |    list_transform(range(0, n_tok0),
      |      i -> CASE WHEN cls = 6 AND i = 0 THEN CAST(-1 AS INTEGER)
      |                ELSE CAST((orig*2654435761 + i*97003 + 7) % 32768 AS INTEGER) END) AS tokens,
      |    CASE WHEN cls = 4 THEN CAST(9999 AS INTEGER)
      |         WHEN cls = 5 THEN CAST(0 AS INTEGER)
      |         ELSE n_tok0 END AS n_tok,
      |    CASE WHEN cls = 3 THEN '__unknown__' ELSE source END AS source,
      |    orig
      |  FROM base
      |)""".stripMargin

  private val DirtyAndSeqs = Dirty + ",\n" + SeqsCte

  /** Planted-span corpus (mirrors SyntheticTokens.spanned: VARIABLE-STEP
    * streams — step 97003 + 13*orig, distinct per doc — so cross-doc
    * duplication is exactly the planted block) + 8-gram start occurrences;
    * shared by the dedup_span / span_hot / span_trim family.
    */
  private val SpanOcc = Base +
    """,
      |sv AS (SELECT orig, n_tok0,
      |         list_transform(range(0, n_tok0),
      |           i -> CAST((orig*2654435761 + i*(97003 + 13*orig) + 7) % 32768
      |                AS INTEGER)) AS vt
      |       FROM base),
      |sp AS (
      |  SELECT 'doc-' || lpad(CAST(orig AS VARCHAR), 12, '0') AS doc_id,
      |    orig,
      |    CAST(n_tok0 AS INTEGER) AS n_tok,
      |    CASE WHEN orig % 50 IN (11, 12, 13) AND n_tok0 >= 64
      |      THEN vt[1:16]
      |        || list_transform(range(0, 32),
      |             i -> CAST((i*1009 + 13) % 32768 AS INTEGER))
      |        || vt[49:n_tok0]
      |      ELSE vt END AS tokens
      |  FROM sv),
      |st AS (SELECT doc_id, tokens,
      |         unnest(range(1, CAST(n_tok AS BIGINT) - 6)) AS start
      |       FROM sp WHERE n_tok >= 8),
      |occ AS (SELECT doc_id, CAST(start AS BIGINT) AS start,
      |          array_to_string(tokens[start:start+7], ' ') AS g
      |        FROM st)""".stripMargin

  /** Per-row violation-count expression over `dirty` (mirrors the compiled
    * row-constraint suite of TokenSchema.sequences, including the
    * never-firing width/required terms, which add 0).
    */
  private val Vc =
    """(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
      | + (CASE WHEN doc_id IS NOT NULL AND NOT regexp_matches(doc_id, '^doc-[0-9]{12}$') THEN 1 ELSE 0 END)
      | + (CASE WHEN tokens IS NULL THEN 1 ELSE 0 END)
      | + (CASE WHEN tokens IS NOT NULL AND len(list_filter(tokens, t -> t IS NULL OR t < 0 OR t > 32767)) > 0 THEN 1 ELSE 0 END)
      | + (CASE WHEN n_tok IS NULL THEN 1 ELSE 0 END)
      | + (CASE WHEN n_tok IS NOT NULL AND (n_tok < 1 OR n_tok > 8192) THEN 1 ELSE 0 END)
      | + (CASE WHEN source IS NULL THEN 1 ELSE 0 END)
      | + (CASE WHEN tokens IS NOT NULL AND n_tok IS NOT NULL AND len(tokens) <> n_tok THEN 1 ELSE 0 END)""".stripMargin

  private def listSumBigint(expr: String): String =
    s"CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform($expr, t -> CAST(t AS BIGINT))), (a, x) -> a + x) AS BIGINT)"

  /** ALL-PAIRS exact n-gram Jaccard ground truth over the near-dup corpus —
    * the hard oracle for every LSH dedup operator: any candidate-generation
    * recall loss shows up as a row/hash mismatch. Shingle-less docs
    * (<3 words) are excluded on both sides.
    *
    * Scale bound: ground truth is quadratic BY DESIGN (that is what makes
    * it an oracle rather than a mirror of the banding under test) — fine at
    * the driver's sf0.01 gate (500 docs), ~20+ min of single-threaded
    * DuckDB at sf0.1 (5,250 docs → 13.8M list intersections). Don't run
    * the oracle side above sf0.01.
    */
  private val NearDupPairs =
    """nd_corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text || ' graft extra suffix tokens' AS text
      |  FROM documents WHERE doc_id % 20 = 0),
      |nd_w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      |      FROM nd_corpus),
      |nd_sh AS (SELECT doc_id,
      |        list_distinct(list_transform(
      |          range(0, greatest(len(ws) - 2, 0)),
      |          j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3])) AS sh
      |      FROM nd_w),
      |nd_ne AS (SELECT doc_id, sh FROM nd_sh WHERE len(sh) > 0),
      |nd_pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |       round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |             / nullif(len(list_distinct(a.sh || b.sh)), 0), 6) AS jac
      |      FROM nd_ne a JOIN nd_ne b ON a.doc_id < b.doc_id
      |      WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |            / nullif(len(list_distinct(a.sh || b.sh)), 0) >= 0.3)""".stripMargin

  /** Planted/organic recall counts from the all-pairs ground truth:
    * planted_missed = 0 is the oracle's recall assertion for the LSH
    * pipelines (their band parameters put per-pair miss probability ~1e-9
    * at the corpus's ≥0.85 true-pair Jaccard).
    */
  private val DedupRecallReport = s"""WITH $NearDupPairs
    |SELECT
    |  (SELECT CAST(count(*) AS BIGINT) FROM documents WHERE doc_id % 20 = 0) AS planted_total,
    |  CAST(coalesce(sum(CASE WHEN doc_b = doc_a + 100000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS planted_found,
    |  CAST((SELECT count(*) FROM documents WHERE doc_id % 20 = 0)
    |    - coalesce(sum(CASE WHEN doc_b = doc_a + 100000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS planted_missed,
    |  CAST(coalesce(sum(CASE WHEN doc_b <> doc_a + 100000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS organic_found
    |FROM nd_pairs""".stripMargin

  /** Index-ordered left-fold dot product (bit-identical to the Spark
    * aggregate/zip_with evaluation).
    */
  private def dot(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |  list_transform(range(1, len($a) + 1),
       |    i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
       |  (acc, x) -> acc + x)""".stripMargin

  /** Hyperplane-LSH bucket over planes [lo, hi) of an `embedding` column —
    * the SQL mirror of graft.functions.HyperplaneLsh's integer plane
    * weights ((p*12289 + i*331) % 997 - 498) and sign-bit packing.
    */
  private def hyperBucket(lo: Int, hi: Int): String =
    s"""list_reduce(list_prepend(0, list_transform(range($lo, $hi), p ->
       |    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |           list_transform(range(0, len(embedding)),
       |             i -> CAST(embedding[i+1] AS DOUBLE) * ((p*12289 + i*331) % 997 - 498))),
       |           (a, x) -> a + x) > 0 THEN 1 ELSE 0 END)),
       |    (acc, bb) -> acc*2 + bb)""".stripMargin

  val all: Map[String, String] = Map(

    "seq_synth" -> s"""WITH $Seqs
      |SELECT doc_id, n_tok, source,
      |       ${listSumBigint("tokens")} AS sum_tokens,
      |       tokens[1] AS t_first, tokens[n_tok] AS t_last
      |FROM seqs ORDER BY doc_id""".stripMargin,

    "row_violations" -> s"""WITH $Dirty
      |SELECT doc_id, constraint_id FROM (
      |  SELECT doc_id, 'required_doc_id' AS constraint_id FROM dirty WHERE doc_id IS NULL
      |  UNION ALL
      |  SELECT doc_id, 'regex_doc_id' FROM dirty
      |    WHERE doc_id IS NOT NULL AND NOT regexp_matches(doc_id, '^doc-[0-9]{12}$$')
      |  UNION ALL
      |  SELECT doc_id, 'array_elem_tokens' FROM dirty
      |    WHERE tokens IS NOT NULL AND len(list_filter(tokens, t -> t IS NULL OR t < 0 OR t > 32767)) > 0
      |  UNION ALL
      |  SELECT doc_id, 'range_n_tok' FROM dirty
      |    WHERE n_tok IS NOT NULL AND (n_tok < 1 OR n_tok > 8192)
      |  UNION ALL
      |  SELECT doc_id, 'size_consistent' FROM dirty
      |    WHERE tokens IS NOT NULL AND n_tok IS NOT NULL AND len(tokens) <> n_tok
      |) v ORDER BY constraint_id, doc_id NULLS FIRST""".stripMargin,

    // P60: ≤3 exemplar rows per constraint. NULLS FIRST in the window
    // ordering matches Spark's asc_nulls_first (DuckDB defaults NULLS
    // LAST on ASC); ties (duplicated doc_ids) yield identical rows, so
    // row_number over them is output-deterministic in both engines.
    "violation_examples" -> s"""WITH $Dirty,
      |v AS (
      |  SELECT doc_id, 'required_doc_id' AS constraint_id FROM dirty WHERE doc_id IS NULL
      |  UNION ALL
      |  SELECT doc_id, 'regex_doc_id' FROM dirty
      |    WHERE doc_id IS NOT NULL AND NOT regexp_matches(doc_id, '^doc-[0-9]{12}$$')
      |  UNION ALL
      |  SELECT doc_id, 'array_elem_tokens' FROM dirty
      |    WHERE tokens IS NOT NULL AND len(list_filter(tokens, t -> t IS NULL OR t < 0 OR t > 32767)) > 0
      |  UNION ALL
      |  SELECT doc_id, 'range_n_tok' FROM dirty
      |    WHERE n_tok IS NOT NULL AND (n_tok < 1 OR n_tok > 8192)
      |  UNION ALL
      |  SELECT doc_id, 'size_consistent' FROM dirty
      |    WHERE tokens IS NOT NULL AND n_tok IS NOT NULL AND len(tokens) <> n_tok
      |),
      |r AS (SELECT constraint_id, doc_id,
      |             row_number() OVER (PARTITION BY constraint_id
      |                                ORDER BY doc_id NULLS FIRST) AS rn
      |      FROM v)
      |SELECT constraint_id, doc_id, CAST(rn AS BIGINT) AS rn
      |FROM r WHERE rn <= 3 ORDER BY constraint_id, rn""".stripMargin,

    "unique_dups" -> s"""WITH $Dirty
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS cnt
      |FROM dirty WHERE doc_id IS NOT NULL
      |GROUP BY doc_id HAVING count(*) > 1 ORDER BY doc_id""".stripMargin,

    "ref_violations" -> s"""WITH $Dirty
      |SELECT doc_id, source FROM dirty
      |WHERE source NOT IN (SELECT DISTINCT source FROM documents)
      |ORDER BY doc_id""".stripMargin,

    // FD audit doc_id → source: keys with >1 distinct dependent. NULL
    // determinants form one group in both engines; NULLS FIRST matches
    // Spark's asc_nulls_first.
    "fd_audit" -> s"""WITH $Dirty
      |SELECT doc_id,
      |       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_variants,
      |       min(source) AS dep_min, max(source) AS dep_max
      |FROM dirty
      |GROUP BY doc_id HAVING COUNT(DISTINCT source) > 1
      |ORDER BY doc_id NULLS FIRST""".stripMargin,

    "token_equality" -> s"""WITH $DirtyAndSeqs
      |SELECT d.doc_id,
      |       CASE WHEN r.doc_id IS NULL THEN 'missing_in_ref'
      |            ELSE 'tokens_mismatch' END AS status
      |FROM dirty d LEFT JOIN seqs r ON d.doc_id = r.doc_id
      |WHERE r.doc_id IS NULL OR d.tokens <> r.tokens
      |ORDER BY status, d.doc_id NULLS FIRST""".stripMargin,

    "col_stats" -> s"""WITH $Dirty
      |SELECT CAST(count(*) AS BIGINT) AS rows,
      |  CAST(count(doc_id) AS BIGINT) AS doc_id_count,
      |  CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS doc_id_nulls,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_id_distinct,
      |  CAST(count(n_tok) AS BIGINT) AS n_tok_count,
      |  CAST(min(n_tok) AS INTEGER) AS n_tok_min,
      |  CAST(max(n_tok) AS INTEGER) AS n_tok_max,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tok_sum,
      |  quantile_cont(n_tok, 0.5) AS n_tok_p50,
      |  quantile_cont(n_tok, 0.9) AS n_tok_p90,
      |  quantile_cont(n_tok, 0.99) AS n_tok_p99,
      |  CAST(count(DISTINCT source) AS BIGINT) AS source_distinct,
      |  min(source) AS source_min,
      |  max(source) AS source_max
      |FROM dirty""".stripMargin,

    "constraint_suggest" -> s"""WITH $Dirty,
      |prof AS (
      |  SELECT count(*) AS rows,
      |    sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS did_nulls,
      |    CAST(count(DISTINCT doc_id) AS BIGINT) AS did_distinct,
      |    sum(CASE WHEN n_tok IS NULL THEN 1 ELSE 0 END) AS nt_nulls,
      |    CAST(min(n_tok) AS BIGINT) AS nt_min,
      |    CAST(max(n_tok) AS BIGINT) AS nt_max,
      |    sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS src_nulls,
      |    CAST(count(DISTINCT source) AS BIGINT) AS src_distinct,
      |    list_sort(list(DISTINCT source)) AS src_vals,
      |    sum(CASE WHEN tokens IS NULL THEN 1 ELSE 0 END) AS tok_nulls,
      |    CAST(min(list_aggregate(tokens, 'min')) AS BIGINT) AS tok_emin,
      |    CAST(max(list_aggregate(tokens, 'max')) AS BIGINT) AS tok_emax,
      |    CAST(min(len(tokens)) AS BIGINT) AS tok_smin,
      |    CAST(max(len(tokens)) AS BIGINT) AS tok_smax
      |  FROM dirty
      |)
      |SELECT "column", kind, param FROM (
      |  SELECT 'doc_id' AS "column", 'required' AS kind, '' AS param
      |    FROM prof WHERE did_nulls = 0 AND rows > 0
      |  UNION ALL SELECT 'doc_id', 'unique', ''
      |    FROM prof WHERE did_nulls = 0 AND did_distinct = rows
      |  UNION ALL SELECT 'n_tok', 'required', ''
      |    FROM prof WHERE nt_nulls = 0 AND rows > 0
      |  UNION ALL SELECT 'n_tok', 'range', '[' || nt_min || ',' || nt_max || ']'
      |    FROM prof WHERE nt_min IS NOT NULL
      |  UNION ALL SELECT 'source', 'required', ''
      |    FROM prof WHERE src_nulls = 0 AND rows > 0
      |  UNION ALL SELECT 'source', 'enum', array_to_string(src_vals, chr(31))
      |    FROM prof WHERE src_distinct BETWEEN 1 AND 32
      |  UNION ALL SELECT 'tokens', 'required', ''
      |    FROM prof WHERE tok_nulls = 0 AND rows > 0
      |  UNION ALL SELECT 'tokens', 'elem_range', '[' || tok_emin || ',' || tok_emax || ']'
      |    FROM prof WHERE tok_emin IS NOT NULL
      |  UNION ALL SELECT 'tokens', 'size_range', '[' || tok_smin || ',' || tok_smax || ']'
      |    FROM prof WHERE tok_smin IS NOT NULL
      |) ORDER BY "column", kind""".stripMargin,

    "partition_summary" -> s"""WITH $Dirty,
      |v AS (SELECT source, $Vc AS vc FROM dirty)
      |SELECT source, CAST(count(*) AS BIGINT) AS rows,
      |  CAST(sum(CASE WHEN vc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_rows,
      |  CAST(sum(vc) AS BIGINT) AS violation_count,
      |  sum(vc) = 0 AS pass
      |FROM v GROUP BY ROLLUP(source) ORDER BY source NULLS FIRST""".stripMargin,

    "drift_hist" -> s"""WITH $Base
      |SELECT CAST(orig % 2 AS INTEGER) AS epoch,
      |       CAST(floor(n_tok0 / 32.0) AS INTEGER) AS bucket,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM base GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "drift_stats" -> s"""WITH $Base,
      |h AS (SELECT CAST(floor(n_tok0 / 32.0) AS INTEGER) AS bucket,
      |             sum(CASE WHEN orig % 2 = 0 THEN 1 ELSE 0 END) AS c0,
      |             sum(CASE WHEN orig % 2 = 1 THEN 1 ELSE 0 END) AS c1
      |      FROM base GROUP BY 1),
      |c AS (SELECT bucket, c0, c1,
      |             sum(c0) OVER (ORDER BY bucket) AS cum0,
      |             sum(c1) OVER (ORDER BY bucket) AS cum1,
      |             sum(c0) OVER () AS n0, sum(c1) OVER () AS n1
      |      FROM h),
      |t AS (SELECT bucket, abs(CAST(cum0 AS DOUBLE)/n0 - CAST(cum1 AS DOUBLE)/n1) AS d,
      |             CAST(n0*(c0+c1) AS DOUBLE)/(n0+n1) AS e0,
      |             CAST(n1*(c0+c1) AS DOUBLE)/(n0+n1) AS e1,
      |             c0, c1, n0, n1
      |      FROM c)
      |SELECT round(max(d), 6) AS ks,
      |       round(sum((CASE WHEN e0 > 0 THEN (c0-e0)*(c0-e0)/e0 ELSE 0 END)
      |               + (CASE WHEN e1 > 0 THEN (c1-e1)*(c1-e1)/e1 ELSE 0 END)), 6) AS chi2,
      |       CAST(max(n0) AS BIGINT) AS n0, CAST(max(n1) AS BIGINT) AS n1
      |FROM t""".stripMargin,

    "drift_emd" -> s"""WITH $Base,
      |h AS (SELECT CAST(floor(n_tok0 / 32.0) AS INTEGER) AS bucket,
      |             sum(CASE WHEN orig % 2 = 0 THEN 1 ELSE 0 END) AS c0,
      |             sum(CASE WHEN orig % 2 = 1 THEN 1 ELSE 0 END) AS c1
      |      FROM base GROUP BY 1),
      |c AS (SELECT bucket,
      |             sum(c0) OVER (ORDER BY bucket) AS cum0,
      |             sum(c1) OVER (ORDER BY bucket) AS cum1,
      |             sum(c0) OVER () AS n0, sum(c1) OVER () AS n1
      |      FROM h)
      |SELECT CAST(sum(abs(cum0*n1 - cum1*n0)) AS DECIMAL(38,0)) AS emd_num,
      |       CAST(max(n0) AS BIGINT) AS n0, CAST(max(n1) AS BIGINT) AS n1,
      |       CAST(CAST(sum(abs(cum0*n1 - cum1*n0)) AS HUGEINT) * 32 * 1000000
      |            // (CAST(max(n0) AS HUGEINT) * CAST(max(n1) AS HUGEINT))
      |            AS BIGINT) AS emd_ppm
      |FROM c""".stripMargin,

    // PSI mirror: same two-epoch width-32 histogram as drift_emd; Laplace
    // smoothing (c+1)/(n+B) is exact integer arithmetic until the single
    // division, ln is the natural log in both engines, rounded 6 dp.
    "drift_psi" -> s"""WITH $Base,
      |h AS (SELECT CAST(floor(n_tok0 / 32.0) AS INTEGER) AS bucket,
      |             sum(CASE WHEN orig % 2 = 0 THEN 1 ELSE 0 END) AS c0,
      |             sum(CASE WHEN orig % 2 = 1 THEN 1 ELSE 0 END) AS c1
      |      FROM base GROUP BY 1),
      |t AS (SELECT sum(c0) AS n0, sum(c1) AS n1, count(*) AS nb FROM h),
      |p AS (SELECT CAST(c0 + 1 AS DOUBLE) / (n0 + nb) AS p0,
      |             CAST(c1 + 1 AS DOUBLE) / (n1 + nb) AS p1,
      |             n0, n1, nb
      |      FROM h, t)
      |SELECT round(sum((p0 - p1) * ln(p0 / p1)), 6) AS psi,
      |       CAST(max(n0) AS BIGINT) AS n0, CAST(max(n1) AS BIGINT) AS n1,
      |       CAST(max(nb) AS BIGINT) AS buckets
      |FROM p""".stripMargin,

    // P59: leave-one-out TV permille per source — the planted +512 shift
    // on src1, the bucketing, the densified source×bucket grid, the
    // HUGEINT numerator and the floor division are all mirrored exactly
    // (both engines do pure integer arithmetic end to end)
    "source_anomaly" -> s"""WITH $Base,
      |v AS (SELECT source,
      |             n_tok0 + CASE WHEN source = 'src1' THEN 512 ELSE 0 END AS v
      |      FROM base),
      |h AS (SELECT source, CAST(floor(v / 128.0) AS INTEGER) AS bucket,
      |             count(*) AS cnt
      |      FROM v GROUP BY 1, 2),
      |d AS (SELECT s.source, b.bucket, COALESCE(h.cnt, 0) AS cnt
      |      FROM (SELECT DISTINCT source FROM h) s
      |      CROSS JOIN (SELECT DISTINCT bucket FROM h) b
      |      LEFT JOIN h ON h.source = s.source AND h.bucket = b.bucket),
      |t AS (SELECT source, bucket, cnt,
      |             sum(cnt) OVER (PARTITION BY bucket) AS tot_b,
      |             sum(cnt) OVER (PARTITION BY source) AS n_s,
      |             sum(cnt) OVER () AS n
      |      FROM d),
      |p AS (SELECT source, n_s, n - n_s AS n_r,
      |             sum(abs(CAST(cnt AS HUGEINT) * (n - n_s)
      |                     - CAST(tot_b - cnt AS HUGEINT) * n_s)) AS num
      |      FROM t GROUP BY source, n_s, n)
      |SELECT source, CAST(n_s AS BIGINT) AS n,
      |       CAST(CASE WHEN n_r > 0 THEN (1000 * num) // (2 * n_s * n_r) END
      |            AS BIGINT) AS tv_permille,
      |       CASE WHEN n_r > 0 THEN (1000 * num) // (2 * n_s * n_r) > 600
      |            ELSE FALSE END AS anomalous
      |FROM p ORDER BY source""".stripMargin,

    // Categorical vocab drift: one token-keyed conditional aggregate (no
    // densify — a token absent from an epoch has that sum = 0 in its one
    // row), HUGEINT common-denominator numerator, `//` exact floor.
    "drift_vocab" -> s"""WITH $Seqs,
      |vtk AS (SELECT orig % 2 AS e, unnest(tokens) AS tok FROM seqs),
      |vh AS (SELECT tok,
      |         CAST(sum(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |         CAST(sum(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |       FROM vtk GROUP BY tok),
      |vt AS (SELECT CAST(sum(n0) AS BIGINT) AS t0, CAST(sum(n1) AS BIGINT) AS t1,
      |         CAST(sum(CASE WHEN n0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v0,
      |         CAST(sum(CASE WHEN n1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |         CAST(sum(CASE WHEN n0 > 0 AND n1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS vs
      |       FROM vh),
      |vn AS (SELECT sum(abs(CAST(n0 AS HUGEINT) * t1
      |                      - CAST(n1 AS HUGEINT) * t0)) AS num
      |       FROM vh, vt)
      |SELECT vt.t0 AS n0_total, vt.t1 AS n1_total,
      |  vt.v0 AS vocab0, vt.v1 AS vocab1, vt.vs AS vocab_shared,
      |  CAST(CASE WHEN vt.t0 > 0 AND vt.t1 > 0
      |    THEN (1000 * vn.num) // (2 * CAST(vt.t0 AS HUGEINT) * vt.t1)
      |    END AS BIGINT) AS tv_permille
      |FROM vt, vn""".stripMargin,

    "drift_vocab_top" -> s"""WITH $Seqs,
      |vtk AS (SELECT orig % 2 AS e, unnest(tokens) AS tok FROM seqs),
      |vh AS (SELECT tok,
      |         CAST(sum(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |         CAST(sum(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      |       FROM vtk GROUP BY tok),
      |vt AS (SELECT CAST(sum(n0) AS BIGINT) AS t0,
      |              CAST(sum(n1) AS BIGINT) AS t1 FROM vh),
      |vd AS (SELECT tok, n0, n1,
      |         CAST(n0 AS HUGEINT) * t1 - CAST(n1 AS HUGEINT) * t0 AS diff,
      |         CAST(t0 AS HUGEINT) * t1 AS den
      |       FROM vh, vt)
      |SELECT tok, n0, n1,
      |  CAST((1000000 * abs(diff)) // den AS BIGINT) AS shift_ppm,
      |  CAST(CASE WHEN diff > 0 THEN 1 WHEN diff < 0 THEN -1 ELSE 0 END
      |       AS BIGINT) AS dir
      |FROM vd
      |ORDER BY shift_ppm DESC, tok
      |LIMIT 10""".stripMargin,

    "lm_oov" -> s"""WITH $Seqs,
      |tok AS (SELECT doc_id, unnest(tokens) AS tok FROM seqs),
      |freq AS (SELECT tok, count(*) AS cnt FROM tok GROUP BY 1),
      |vocab AS (SELECT tok FROM freq ORDER BY cnt DESC, tok LIMIT 1024)
      |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
      |  CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
      |  CAST(floor(1000 * sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
      |             / count(*)) AS BIGINT) AS oov_permille
      |FROM tok t LEFT JOIN vocab v ON t.tok = v.tok
      |GROUP BY 1 ORDER BY 1""".stripMargin,

    "custom_validator" -> """SELECT doc_id, constraint_id FROM (
      |  SELECT doc_id, 'custom_spark_spam' AS constraint_id FROM documents
      |    WHERE len(regexp_extract_all(text, '\bspark\b')) > 5
      |  UNION ALL
      |  SELECT doc_id, 'custom_short_mod7' FROM documents
      |    WHERE doc_id % 7 = 0 AND length(text) < 200
      |) v ORDER BY constraint_id, doc_id""".stripMargin,

    // CondRequire semantics mirrored literally: COALESCE(guard, FALSE)
    // AND NOT COALESCE(consequent, FALSE)
    "cond_violations" -> s"""WITH $Dirty
      |SELECT doc_id, constraint_id FROM (
      |  SELECT doc_id, 'cond_src1_cap' AS constraint_id FROM dirty
      |    WHERE COALESCE(source = 'src1', FALSE)
      |      AND NOT COALESCE(n_tok <= 256, FALSE)
      |  UNION ALL
      |  SELECT doc_id, 'cond_zero_empty' FROM dirty
      |    WHERE COALESCE(n_tok = 0, FALSE)
      |      AND NOT COALESCE(len(tokens) = 0, FALSE)
      |) v ORDER BY constraint_id, doc_id NULLS FIRST""".stripMargin,

    // OrderAudit: the same planted 6-hour shift on every 37th event, the
    // same (user, event_id-order) lag compare, all in BIGINT epoch-micros
    "order_audit" -> """WITH shifted AS (
      |  SELECT event_id, user_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) -
      |           CASE WHEN event_id % 37 = 0 THEN 21600000000 ELSE 0 END AS t_us
      |  FROM events
      |), lagged AS (
      |  SELECT user_id, event_id, t_us,
      |         lag(t_us)     OVER (PARTITION BY user_id ORDER BY event_id) AS prev_t_us,
      |         lag(event_id) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_event_id
      |  FROM shifted
      |)
      |SELECT user_id, event_id, prev_event_id,
      |       CAST(prev_t_us - t_us AS BIGINT) AS regress_us
      |FROM lagged WHERE t_us < prev_t_us
      |ORDER BY user_id, event_id""".stripMargin,

    "q_cube" -> """SELECT o_orderstatus, o_orderpriority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    // DuckDB's NATIVE ASOF JOIN — an independent implementation of the
    // semantics, not a re-statement of the union+window plan.
    "q_asof_join" -> """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |purch AS (
      |  SELECT user_id, ts, event_id AS p_event_id, value AS p_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, p.p_event_id, p.p_value,
      |       epoch_us(c.ts) - epoch_us(p.ts) AS lag_us
      |FROM clicks c ASOF LEFT JOIN purch p
      |  ON c.user_id = p.user_id AND c.ts >= p.ts
      |ORDER BY c.event_id""".stripMargin,

    "q_asof_fwd" -> """WITH clicks AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
      |purch AS (
      |  SELECT user_id, ts, event_id AS p_event_id, value AS p_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id, p.p_event_id, p.p_value,
      |       epoch_us(p.ts) - epoch_us(c.ts) AS lead_us
      |FROM clicks c ASOF LEFT JOIN purch p
      |  ON c.user_id = p.user_id AND c.ts <= p.ts
      |ORDER BY c.event_id""".stripMargin,

    // Plain inequality join — semantics only; the engine's bucketed
    // interval-join plan must reproduce it exactly (zero-filled).
    "q_range_join" -> """WITH p AS (
      |  SELECT event_id AS p_event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, value AS c_value FROM events
      |      WHERE event_type = 'click')
      |SELECT p.p_event_id, p.user_id,
      |       CAST(count(c.c_value) AS BIGINT) AS n_clicks,
      |       max(c.c_value) AS c_vmax
      |FROM p LEFT JOIN c ON p.user_id = c.user_id
      |  AND epoch_us(c.ts) >= epoch_us(p.ts) - 86400000000
      |  AND epoch_us(c.ts) < epoch_us(p.ts)
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    // the MERGE result stated directly as set algebra over the snapshot —
    // no window/compaction mechanics, so the oracle is independent.
    "merge_apply" -> """WITH snap AS (SELECT doc_id, lang, n_chars FROM documents)
      |SELECT doc_id, lang, n_chars FROM snap WHERE doc_id % 10 NOT IN (0, 1, 3)
      |UNION ALL
      |SELECT doc_id, 'bb' AS lang, n_chars + 2 FROM snap WHERE doc_id % 10 = 1
      |UNION ALL
      |SELECT doc_id + 1000000, 'nw', CAST(42 AS BIGINT) FROM snap WHERE doc_id % 10 = 2
      |ORDER BY doc_id""".stripMargin,

    "events_sessionize" -> """WITH e AS (
      |  SELECT user_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (
      |  SELECT user_id, ts, event_type,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                     ROWS UNBOUNDED PRECEDING) AS session_seq
      |  FROM e)
      |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_purchases,
      |  max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "hist_udaf" -> s"""WITH $Base
      |SELECT source, CAST(floor(n_tok0 / 32.0) AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS cnt
      |FROM base GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin,

    "drift_gate" -> s"""WITH $Base,
      |h AS (SELECT source, CAST(floor(n_tok0 / 32.0) AS INTEGER) AS bucket,
      |             sum(CASE WHEN orig % 2 = 0 THEN 1 ELSE 0 END) AS c0,
      |             sum(CASE WHEN orig % 2 = 1 THEN 1 ELSE 0 END) AS c1
      |      FROM base GROUP BY 1, 2),
      |c AS (SELECT source, bucket, c0, c1,
      |             sum(c0) OVER (PARTITION BY source ORDER BY bucket) AS cum0,
      |             sum(c1) OVER (PARTITION BY source ORDER BY bucket) AS cum1,
      |             sum(c0) OVER (PARTITION BY source) AS n0,
      |             sum(c1) OVER (PARTITION BY source) AS n1
      |      FROM h),
      |t AS (SELECT source,
      |             CASE WHEN n0 > 0 AND n1 > 0
      |                  THEN abs(CAST(cum0 AS DOUBLE)/n0 - CAST(cum1 AS DOUBLE)/n1)
      |                  ELSE 0.0 END AS d,
      |             CAST(n0*(c0+c1) AS DOUBLE)/(n0+n1) AS e0,
      |             CAST(n1*(c0+c1) AS DOUBLE)/(n0+n1) AS e1,
      |             c0, c1, n0, n1
      |      FROM c)
      |SELECT source, round(max(d), 6) AS ks,
      |       round(sum((CASE WHEN e0 > 0 THEN (c0-e0)*(c0-e0)/e0 ELSE 0 END)
      |               + (CASE WHEN e1 > 0 THEN (c1-e1)*(c1-e1)/e1 ELSE 0 END)), 6) AS chi2,
      |       CAST(max(n0) AS BIGINT) AS n0, CAST(max(n1) AS BIGINT) AS n1
      |FROM t GROUP BY source ORDER BY source""".stripMargin,

    "events_drift" -> """SELECT event_type,
      |  CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END AS half,
      |  CAST(count(*) AS BIGINT) AS cnt,
      |  min(value) AS vmin, max(value) AS vmax
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "json_roundtrip" ->
      "SELECT doc_id, CAST(TRUE AS BOOLEAN) AS ok FROM documents ORDER BY doc_id",

    // Avro-JSON encoding (R17): the oracle constructs the exact encoded
    // string — unions wrapped as {"<branch>":v}, nulls explicit, required
    // fields plain, no whitespace (to_json's compact form)
    "avro_roundtrip" -> """SELECT doc_id,
      |  '{"doc_id":' || doc_id ||
      |  ',"lang":' || CASE WHEN lang IS NULL OR lang = 'zh' THEN 'null'
      |                     ELSE '{"string":"' || lang || '"}' END ||
      |  ',"source":"' || source || '"' ||
      |  ',"n_chars":' || CASE WHEN n_chars IS NULL THEN 'null'
      |                        ELSE '{"long":' || n_chars || '}' END ||
      |  '}' AS avro,
      |  CAST(TRUE AS BOOLEAN) AS ok
      |FROM documents ORDER BY doc_id""".stripMargin,

    "schema_dispatch" -> """SELECT CASE doc_id % 3 WHEN 0 THEN 'DocA' WHEN 1 THEN 'DocB'
      |  ELSE '__unknown__' END AS record_name,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "ckpt_resume" -> """WITH parts AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS rows FROM documents GROUP BY source)
      |SELECT source, rows FROM parts
      |WHERE CAST(substr(source, 4) AS INTEGER) % 2 = 1
      |ORDER BY source""".stripMargin,

    "q1_agg" -> """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_c,
      |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_e4,
      |  CAST(count(*) AS BIGINT) AS cnt
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_pushdown" -> """SELECT CAST(count(*) AS BIGINT) AS cnt,
      |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
      |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity < 25.0""".stripMargin,

    "q_join_agg" -> """SELECT c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_c
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_large" -> """SELECT o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    // bucketing changes layout, never results — the oracle is the plain
    // join+agg (identical to q_join_large's, which the row cross-checks)
    "q_join_bucketed" -> """SELECT o_orderstatus,
      |  CAST(count(*) AS BIGINT) AS n_lines,
      |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_c
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q_topk" -> """SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DECIMAL(20,2)) AS price
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin,

    "q_window" -> """WITH r AS (
      |  SELECT o_custkey, o_orderkey,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_orderdate DESC, o_orderkey) AS rn
      |  FROM orders)
      |SELECT o_custkey, o_orderkey AS latest_order FROM r WHERE rn = 1
      |ORDER BY o_custkey""".stripMargin,

    "q_setops" -> """SELECT doc_id FROM documents
      |EXCEPT
      |SELECT doc_id FROM documents WHERE doc_id % 3 = 0
      |ORDER BY doc_id""".stripMargin,

    "q_map_ops" -> """SELECT event_type AS key, CAST(count(*) AS BIGINT) AS value
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

    "dedup_exact" -> """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0)
      |SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(min(doc_id) AS BIGINT) AS exemplar
      |FROM corpus GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,

    "dedup_ngram_jaccard" -> s"""WITH $NearDupPairs
      |SELECT doc_a, doc_b, jac FROM nd_pairs ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_minhash_lsh" -> DedupRecallReport,

    // Token-level duplicated-span coverage: the planted-span variant (sp —
    // mirrors SyntheticTokens.spanned), 8-gram starts via per-row unnest,
    // grams in >=2 distinct docs, and the sorted-starts interval-union
    // coverage formula — all reproduced exactly, including natural
    // collisions of the linear token generator.
    // NOTE: SpanOcc is interpolated OUTSIDE the triple-quoted template —
    // interpolating it inside would re-run stripMargin over its `||` list
    // concatenations (whitespace + leading pipe) and eat one pipe.
    "dedup_span" -> (s"WITH $SpanOcc,\n" + """dm AS (SELECT g, doc_id FROM occ GROUP BY 1, 2),
      |dup AS (SELECT g FROM dm GROUP BY g HAVING count(*) >= 2),
      |docc AS (SELECT o.doc_id, o.start,
      |           lead(o.start) OVER (PARTITION BY o.doc_id ORDER BY o.start) AS nxt
      |         FROM occ o JOIN dup USING (g)),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_grams,
      |          CAST(sum(CASE WHEN nxt IS NULL THEN 8
      |                        ELSE least(8, nxt - start) END) AS BIGINT) AS dup_cov
      |        FROM docc GROUP BY 1)
      |SELECT s.doc_id, s.n_tok,
      |  coalesce(a.n_dup_grams, 0) AS n_dup_grams,
      |  coalesce(a.dup_cov, 0) AS dup_cov,
      |  CASE WHEN s.n_tok > 0
      |    THEN CAST(floor(1000 * coalesce(a.dup_cov, 0) / s.n_tok) AS BIGINT)
      |    ELSE 0 END AS dup_permille
      |FROM sp s LEFT JOIN agg a USING (doc_id)
      |ORDER BY doc_id""".stripMargin),

    "span_hot" -> (s"WITH $SpanOcc,\n" + """dm AS (SELECT g, doc_id, CAST(count(*) AS BIGINT) AS m
      |       FROM occ GROUP BY 1, 2)
      |SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(m) AS BIGINT) AS n_occ
      |FROM dm GROUP BY g HAVING count(*) >= 2
      |ORDER BY n_occ DESC, n_docs DESC, g
      |LIMIT 20""".stripMargin),

    // Token-level eval-overlap decontamination mirror: eval grams are the
    // DISTINCT string grams of the cls-11 docs; a train doc's hits are
    // its k-gram START positions matching that set.
    "decontam_span" -> (s"WITH $SpanOcc,\n" + """evg AS (
      |  SELECT DISTINCT o.g FROM occ o JOIN sp s USING (doc_id)
      |  WHERE s.orig % 50 = 11)
      |SELECT o.doc_id, CAST(count(*) AS BIGINT) AS n_hits
      |FROM occ o JOIN sp s USING (doc_id) JOIN evg USING (g)
      |WHERE s.orig % 50 <> 11
      |GROUP BY o.doc_id
      |HAVING count(*) >= 1
      |ORDER BY o.doc_id""".stripMargin),

    // Canonical-owner trim mirror: min-doc ownership on the (gram,doc)
    // aggregate, non-owner occurrences merged gaps-and-islands style
    // (new island when start > running max(end) + 1), island slice-sums
    // subtracted from the doc total — kept_sum certifies WHICH positions
    // survived without emitting arrays.
    "span_trim" -> (s"WITH $SpanOcc,\n" + """dm AS (SELECT g, doc_id FROM occ GROUP BY 1, 2),
      |own AS (SELECT g, min(doc_id) AS owner
      |        FROM dm GROUP BY g HAVING count(*) >= 2),
      |rem AS (SELECT o.doc_id, o.start, o.start + 7 AS fin
      |        FROM occ o JOIN own w USING (g) WHERE o.doc_id <> w.owner),
      |i0 AS (SELECT doc_id, start, fin,
      |         max(fin) OVER (PARTITION BY doc_id ORDER BY start, fin
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |       FROM rem),
      |i1 AS (SELECT doc_id, start, fin,
      |         CASE WHEN pmax IS NULL OR start > pmax + 1 THEN 1 ELSE 0 END AS nw
      |       FROM i0),
      |i2 AS (SELECT doc_id, start, fin,
      |         sum(nw) OVER (PARTITION BY doc_id ORDER BY start, fin
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      |       FROM i1),
      |isl AS (SELECT doc_id, isl, min(start) AS a, max(fin) AS b
      |        FROM i2 GROUP BY 1, 2),
      |sums AS (SELECT i.doc_id, CAST(count(*) AS BIGINT) AS n_islands,
      |           CAST(sum(i.b - i.a + 1) AS BIGINT) AS n_removed,
      |           CAST(sum(CAST(list_sum(s.tokens[i.a:i.b]) AS BIGINT)) AS BIGINT) AS rsum
      |         FROM isl i JOIN sp s USING (doc_id) GROUP BY 1),
      |tot AS (SELECT doc_id, n_tok, CAST(list_sum(tokens) AS BIGINT) AS t FROM sp)
      |SELECT t.doc_id, t.n_tok,
      |  coalesce(m.n_islands, 0) AS n_islands,
      |  coalesce(m.n_removed, 0) AS n_removed,
      |  t.t - coalesce(m.rsum, 0) AS kept_sum
      |FROM tot t LEFT JOIN sums m USING (doc_id)
      |ORDER BY doc_id""".stripMargin),

    // One-sided containment mirror: snippet plant, word 3-gram shingles,
    // the df<=100 inverted-index candidate gate and the exact
    // containment-over-min verify are all reproduced formula-for-formula
    // (the df cap is part of the certified semantics, not noise).
    "dedup_containment" -> """WITH ct_corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 300000 AS doc_id,
      |         array_to_string(list_slice(
      |           regexp_split_to_array(trim(text), '\s+'), 1, 12), ' ') AS text
      |  FROM documents WHERE doc_id % 25 = 3),
      |ct_w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws
      |         FROM ct_corpus),
      |ct_sh AS (SELECT doc_id, list_distinct(list_transform(
      |            range(0, greatest(len(ws) - 2, 0)),
      |            j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3])) AS sh
      |          FROM ct_w),
      |ct_ne AS (SELECT doc_id, sh FROM ct_sh WHERE len(sh) > 0),
      |ct_ex AS (SELECT doc_id, unnest(sh) AS g FROM ct_ne),
      |ct_keep AS (SELECT g FROM ct_ex GROUP BY g HAVING count(*) <= 100),
      |ct_idx AS (SELECT e.doc_id, e.g FROM ct_ex e JOIN ct_keep k USING (g)),
      |ct_cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |            FROM ct_idx a JOIN ct_idx b
      |              ON a.g = b.g AND a.doc_id < b.doc_id),
      |ct_pairs AS (SELECT c.doc_a, c.doc_b,
      |               round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE)
      |                     / least(len(x.sh), len(y.sh)), 6) AS cont
      |             FROM ct_cand c
      |             JOIN ct_ne x ON c.doc_a = x.doc_id
      |             JOIN ct_ne y ON c.doc_b = y.doc_id)
      |SELECT doc_a, doc_b, cont FROM ct_pairs
      |WHERE cont >= 0.9 ORDER BY doc_a, doc_b""".stripMargin,

    // Leakage audit mirror: exact all-pairs nd_pairs (certified equal to
    // the engine's LSH pipeline by dedup_ngram_jaccard) + the sampleBucket
    // modular split formula on both endpoints; leaks = straddling pairs.
    "split_leak_audit" -> s"""WITH $NearDupPairs,
      |sp AS (SELECT doc_a, doc_b, jac,
      |  CASE WHEN ((doc_a % 1000003) * 2654435761 + 12345) % 1000 < 800 THEN 'train'
      |       WHEN ((doc_a % 1000003) * 2654435761 + 12345) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split_a,
      |  CASE WHEN ((doc_b % 1000003) * 2654435761 + 12345) % 1000 < 800 THEN 'train'
      |       WHEN ((doc_b % 1000003) * 2654435761 + 12345) % 1000 < 900 THEN 'val'
      |       ELSE 'test' END AS split_b
      |  FROM nd_pairs)
      |SELECT doc_a, doc_b, split_a, split_b, jac FROM sp
      |WHERE split_a <> split_b ORDER BY doc_a, doc_b""".stripMargin,

    // Coverage-curve mirror: vocab-sized window (rank + running sum over
    // (cnt DESC, tok)), fixed k ladder, floor-permille of the cumulative
    // share. sum() OVER returns HUGEINT -- cast before the arithmetic.
    "vocab_coverage" -> s"""WITH $Seqs,
      |tokf AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
      |         FROM (SELECT unnest(tokens) AS tok FROM seqs) GROUP BY 1),
      |r AS (SELECT tok, cnt,
      |        row_number() OVER (ORDER BY cnt DESC, tok) AS rank,
      |        CAST(sum(cnt) OVER (ORDER BY cnt DESC, tok
      |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      |      FROM tokf),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM tokf)
      |SELECT CAST(rank AS BIGINT) AS k, cum AS cum_tokens,
      |  CAST(floor(1000 * cum / t) AS BIGINT) AS coverage_permille
      |FROM r, tot WHERE rank IN (16, 64, 256, 1024, 4096, 16384)
      |ORDER BY k""".stripMargin,

    // Bipartite ground truth for incremental screening: exact all-pairs
    // Jaccard across (history × batch) — both LSH error directions are
    // checked (recall via planted_missed, precision via batch_clean).
    "lsh_screen" -> """WITH scr_hist AS (SELECT doc_id, text FROM documents),
      |scr_batch AS (
      |  SELECT doc_id + 100000 AS doc_id, text || ' graft extra suffix tokens' AS text
      |    FROM documents WHERE doc_id % 20 = 0
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id,
      |         'fresh unique doc ' || CAST(doc_id AS VARCHAR) || ' payload' AS text
      |    FROM documents WHERE doc_id % 20 = 7),
      |scr_hs AS (SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(ws)-2,0)), j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3])) AS sh
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM scr_hist)),
      |scr_bs AS (SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(ws)-2,0)), j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3])) AS sh
      |  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM scr_batch)),
      |scr_hn AS (SELECT doc_id, sh FROM scr_hs WHERE len(sh) > 0),
      |scr_bn AS (SELECT doc_id, sh FROM scr_bs WHERE len(sh) > 0),
      |scr_pairs AS (
      |  SELECT a.doc_id AS doc_hist, b.doc_id AS doc_new
      |  FROM scr_hn a JOIN scr_bn b
      |    ON CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      |       / nullif(len(list_distinct(a.sh || b.sh)), 0) >= 0.3)
      |SELECT
      |  CAST((SELECT count(*) FROM documents WHERE doc_id % 20 = 0)
      |     + (SELECT count(*) FROM documents WHERE doc_id % 20 = 7) AS BIGINT) AS batch_total,
      |  CAST((SELECT count(*) FROM documents WHERE doc_id % 20 = 0) AS BIGINT) AS planted_total,
      |  CAST(coalesce(sum(CASE WHEN doc_new = doc_hist + 100000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS planted_found,
      |  CAST((SELECT count(*) FROM documents WHERE doc_id % 20 = 0)
      |     - coalesce(sum(CASE WHEN doc_new = doc_hist + 100000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS planted_missed,
      |  CAST(coalesce(sum(CASE WHEN doc_new <> doc_hist + 100000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS organic_found,
      |  CAST((SELECT count(*) FROM documents WHERE doc_id % 20 = 0)
      |     + (SELECT count(*) FROM documents WHERE doc_id % 20 = 7)
      |     - coalesce(count(DISTINCT doc_new), 0) AS BIGINT) AS batch_clean
      |FROM scr_pairs""".stripMargin,

    // Mirrors BOTH the messy-URL synthesis and the full canonical form
    // (fragment, case, www., default port, trailing slash, tracking-param
    // drop + param sort) — the normalization pipeline is hash-checked.
    "url_canon" -> """WITH uh AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END) || source || '.example.com' AS h
      |  FROM documents),
      |u AS (
      |  SELECT doc_id,
      |    (CASE WHEN doc_id % 3 = 0 THEN 'HTTPS://' ELSE 'https://' END)
      |    || (CASE WHEN doc_id % 2 = 0 THEN upper(h) ELSE h END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END)
      |    || '/a/' || CAST(doc_id % 10 AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |    || '?'
      |    || (CASE WHEN doc_id % 2 = 0 THEN 'utm_source=feed&ref=' ELSE 'ref=' END)
      |    || CAST(doc_id % 3 AS VARCHAR)
      |    || (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
      |  FROM uh),
      |n AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u),
      |p AS (SELECT doc_id,
      |    regexp_replace(regexp_replace(
      |      lower(regexp_extract(nofrag, '^([^:]+://[^/?#]*)', 1)),
      |      '://www\.', '://'), ':(443|80)$', '') AS prec,
      |    substring(nofrag, length(regexp_extract(nofrag, '^([^:]+://[^/?#]*)', 1)) + 1) AS rest
      |  FROM n),
      |c AS (SELECT doc_id,
      |    prec || regexp_replace(regexp_replace(rest, '\?.*$', ''), '/+$', '')
      |    || (CASE WHEN kept = '' THEN '' ELSE '?' || kept END) AS canon
      |  FROM (SELECT doc_id, prec, rest,
      |      array_to_string(list_sort(list_filter(
      |        regexp_split_to_array(regexp_extract(rest, '\?([^#]*)', 1), '&'),
      |        p2 -> p2 <> '' AND NOT regexp_matches(p2, '^(utm_[^=]*|fbclid|gclid)='))), '&') AS kept
      |    FROM p))
      |SELECT canon, CAST(count(*) AS BIGINT) AS cnt, CAST(min(doc_id) AS BIGINT) AS exemplar
      |FROM c GROUP BY 1 HAVING count(*) > 1 ORDER BY canon""".stripMargin,

    // Integer-only (// = DIV) so the salting plan is bit-identical.
    // Salted join certified by the UNSALTED join: salting is internal
    // mechanics, the result must be identical. pmod mirror: ((k%7)+7)%7.
    "join_salted" -> """WITH e AS (
      |  SELECT CASE WHEN event_id % 3 = 0 THEN -1 ELSE user_id END AS k, value
      |  FROM events),
      |dim AS (SELECT DISTINCT k, ((k % 7) + 7) % 7 + 1 AS w FROM e)
      |SELECT e.k, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(round(value * 100) AS BIGINT) * w) AS BIGINT) AS weighted_c
      |FROM e JOIN dim USING (k)
      |GROUP BY e.k ORDER BY e.k""".stripMargin,

    "key_skew" -> """WITH k AS (
      |  SELECT CASE WHEN event_id % 3 = 0 THEN -1 ELSE user_id END AS key FROM events),
      |c AS (SELECT key, count(*) AS cnt FROM k GROUP BY 1),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS nkeys FROM c)
      |SELECT CAST(key AS BIGINT) AS key, CAST(cnt AS BIGINT) AS cnt,
      |  CAST(cnt * 1000000 // total AS BIGINT) AS ppm,
      |  CAST((cnt * 32 + total - 1) // total AS BIGINT) AS salt,
      |  total, nkeys
      |FROM c, t ORDER BY cnt DESC, key LIMIT 10""".stripMargin,

    // Direct payload comparison (IS DISTINCT FROM) — the Spark side's
    // xxhash64 compaction must classify identically.
    "snapshot_diff" -> """WITH oldsnap AS (SELECT doc_id, text FROM documents),
      |newsnap AS (
      |  SELECT doc_id, CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM documents WHERE doc_id % 13 <> 0
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 17 = 0),
      |d AS (
      |  SELECT coalesce(o.doc_id, n.doc_id) AS key,
      |    CASE WHEN o.doc_id IS NULL THEN 'added'
      |         WHEN n.doc_id IS NULL THEN 'removed'
      |         WHEN o.text IS DISTINCT FROM n.text THEN 'changed'
      |         ELSE 'unchanged' END AS change
      |  FROM oldsnap o FULL OUTER JOIN newsnap n ON o.doc_id = n.doc_id)
      |SELECT CAST(key AS BIGINT) AS key, change FROM d
      |WHERE change <> 'unchanged' ORDER BY key""".stripMargin,

    // Re-derives the whole sliding-window plan with generate_series;
    // chunk count = 1 + ceil((n-32)/24) for n > 32, else 1.
    "seq_chunk" -> """WITH w AS (
      |  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
      |  FROM documents),
      |e AS (
      |  SELECT doc_id, n, unnest(generate_series(0,
      |    24 * (CASE WHEN n > 32 THEN (n - 32 + 23) // 24 ELSE 0 END), 24)) AS tok_start
      |  FROM w WHERE n > 0)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(tok_start // 24 AS BIGINT) AS chunk_idx,
      |  CAST(tok_start AS BIGINT) AS tok_start,
      |  CAST(least(32, n - tok_start) AS BIGINT) AS chunk_len
      |FROM e ORDER BY doc_id, tok_start""".stripMargin,

    // Mirrors the normal form exactly; DuckDB regexp_replace needs the
    // explicit 'g' flag (Spark replaces all matches by default).
    "dedup_norm" -> """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, upper(text) || ' !!' AS text
      |  FROM documents WHERE doc_id % 20 = 0),
      |n AS (SELECT doc_id,
      |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS norm
      |  FROM corpus)
      |SELECT md5(norm) AS h, CAST(count(*) AS BIGINT) AS cnt,
      |       CAST(min(doc_id) AS BIGINT) AS exemplar
      |FROM n GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,

    // Full SQL mirror of the simhash pipeline: polynomial word hash →
    // 63 parity votes → 4×16-bit band collision → Hamming ≤ 6. All-pairs
    // form (correctness scale); band collision is the candidate criterion,
    // exactly as in Dedup.simhashPairs.
    "dedup_simhash" -> """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text || ' graft extra suffix tokens' AS text
      |  FROM documents WHERE doc_id % 20 = 0),
      |wh AS (SELECT doc_id,
      |        list_transform(regexp_split_to_array(trim(text), '\s+'),
      |          w -> list_reduce(list_prepend(CAST(0 AS BIGINT),
      |                 list_transform(range(1, length(w) + 1),
      |                   k -> CAST(unicode(substr(w, k, 1)) AS BIGINT))),
      |               (a, c) -> (a * 131 + c) % 1000000007)) AS hs
      |      FROM corpus),
      |sim AS (SELECT doc_id,
      |        list_reduce(list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(0, 63), bb ->
      |            CASE WHEN list_reduce(list_prepend(0,
      |                   list_transform(hs, h ->
      |                     CASE WHEN ((h * (2*(62-bb)+3) + 7919*((62-bb)+1)) % 1000000007) % 2 = 1
      |                          THEN 1 ELSE -1 END)),
      |                   (a, x) -> a + x) > 0
      |                 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)),
      |          (acc, bit) -> acc * 2 + bit) AS s
      |       FROM wh),
      |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |        CAST(bit_count(xor(a.s, b.s)) AS BIGINT) AS hamming,
      |        (((a.s >> 0)  & 65535) = ((b.s >> 0)  & 65535) OR
      |         ((a.s >> 16) & 65535) = ((b.s >> 16) & 65535) OR
      |         ((a.s >> 32) & 65535) = ((b.s >> 32) & 65535) OR
      |         ((a.s >> 48) & 65535) = ((b.s >> 48) & 65535)) AS bandhit
      |      FROM sim a JOIN sim b ON a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b, hamming FROM p
      |WHERE bandhit AND hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin,

    "dedup_exemplars" -> """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0),
      |t AS (SELECT doc_id, md5(text) AS h,
      |        row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
      |        count(*) OVER (PARTITION BY md5(text)) AS grp
      |      FROM corpus)
      |SELECT h, doc_id, CAST(rn AS BIGINT) AS rn, rn = 1 AS keep
      |FROM t WHERE grp > 1 ORDER BY h, rn""".stripMargin,

    "doc_violations" -> """WITH dirty AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 1 THEN 'xx'
      |         WHEN doc_id % 10 = 7 THEN NULL ELSE lang END AS lang0,
      |    CASE WHEN doc_id % 10 = 2 THEN 40000
      |         ELSE CAST(n_chars % 1000 AS INTEGER) END AS n_small,
      |    CASE WHEN doc_id % 10 = 3 THEN 'not-a-date' ELSE '2026-01-15' END AS fetched_on,
      |    doc_id % 100 AS attr_views,
      |    CASE WHEN doc_id % 10 = 6 THEN -5 ELSE doc_id % 10 END AS attr_score,
      |    CASE WHEN doc_id % 10 = 4 THEN NULL ELSE source END AS meta_origin,
      |    CASE WHEN doc_id % 10 = 5 THEN 99 ELSE doc_id % 6 END AS meta_rating,
      |    strlen(text) AS payload_len
      |  FROM documents),
      |d2 AS (SELECT *, coalesce(lang0, 'en') AS lang FROM dirty)
      |SELECT doc_id, constraint_id FROM (
      |  SELECT doc_id, 'enum_lang' AS constraint_id FROM d2
      |    WHERE lang IS NOT NULL AND lang NOT IN ('de','en','es','fr','zh')
      |  UNION ALL
      |  SELECT doc_id, 'int_width_n_small' FROM d2
      |    WHERE n_small IS NOT NULL AND (n_small < -32768 OR n_small > 32767)
      |  UNION ALL
      |  SELECT doc_id, 'type_conform_fetched_on' FROM d2
      |    WHERE fetched_on IS NOT NULL AND try_cast(fetched_on AS DATE) IS NULL
      |  UNION ALL
      |  SELECT doc_id, 'map_range_attrs' FROM d2
      |    WHERE attr_views < 0 OR attr_views > 1000000
      |       OR attr_score < 0 OR attr_score > 1000000
      |  UNION ALL
      |  SELECT doc_id, 'bytes_len_payload' FROM d2 WHERE payload_len > 400
      |  UNION ALL
      |  SELECT doc_id, 'required_meta.origin' FROM d2 WHERE meta_origin IS NULL
      |  UNION ALL
      |  SELECT doc_id, 'range_meta.rating' FROM d2
      |    WHERE meta_rating IS NOT NULL AND (meta_rating < 0 OR meta_rating > 5)
      |) v ORDER BY constraint_id, doc_id""".stripMargin,

    "sim_topk" -> """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |q AS (SELECT vec_id AS qid, embedding AS qe FROM e WHERE vec_id < 10),
      |s AS (SELECT q.qid, e.vec_id,
      |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          list_transform(range(1, len(e.embedding) + 1),
      |            i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))),
      |          (a, x) -> a + x)
      |        / (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             list_transform(range(1, len(e.embedding) + 1),
      |               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))),
      |             (a, x) -> a + x))
      |         * sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |             list_transform(range(1, len(q.qe) + 1),
      |               i -> CAST(q.qe[i] AS DOUBLE) * CAST(q.qe[i] AS DOUBLE))),
      |             (a, x) -> a + x))) AS cos
      |      FROM e, q WHERE e.vec_id <> q.qid),
      |r AS (SELECT qid, vec_id,
      |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
      |      FROM s)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
      |       CAST(vec_id AS BIGINT) AS neighbor
      |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Quantized top-k: replay the int8 fit + quantization (same op order
    // as emb_quantize), then rank by the PURE-INTEGER dot product —
    // tie-break (dot DESC, vec_id) matches the TopKAgg total order.
    "sim_topk_quant" -> """WITH v0 AS (
      |  SELECT vec_id, unnest(range(len(embedding))) AS i, embedding
      |  FROM embeddings),
      |x AS (
      |  SELECT vec_id, i, CAST(embedding[i+1] AS DOUBLE) AS v FROM v0),
      |p AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY i),
      |s AS (SELECT i, mn,
      |        CASE WHEN mx = mn THEN 0.0 ELSE 255.0 / (mx - mn) END AS sc
      |      FROM p),
      |qv AS (
      |  SELECT vec_id, x.i,
      |         CAST(floor((v - mn) * sc + 0.5) AS BIGINT) AS qr
      |  FROM x JOIN s ON x.i = s.i),
      |qc AS (
      |  SELECT vec_id, i,
      |         CASE WHEN qr < 0 THEN 0 WHEN qr > 255 THEN 255 ELSE qr END AS q
      |  FROM qv),
      |qz AS (SELECT vec_id, list(q ORDER BY i) AS qe FROM qc GROUP BY vec_id),
      |qs AS (SELECT vec_id AS qid, qe FROM qz WHERE vec_id < 10),
      |sc2 AS (
      |  SELECT q.qid, c.vec_id,
      |         list_reduce(list_prepend(CAST(0 AS BIGINT),
      |           list_transform(range(1, len(c.qe) + 1),
      |             i -> c.qe[i] * q.qe[i])),
      |           (a, y) -> a + y) AS dot
      |  FROM qz c, qs q WHERE c.vec_id <> q.qid),
      |r AS (SELECT qid, vec_id,
      |        row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) AS rank
      |      FROM sc2)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
      |       CAST(vec_id AS BIGINT) AS neighbor
      |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Full SQL mirror of the ANN pipeline: hyperplane bucket (pure integer
    // plane formula, index-ordered double fold — bit-identical to
    // graft.functions.HyperplaneLsh), Hamming-1 multi-probe on the query
    // side, exact cosine rescoring, per-query rank.
    "sim_ann_lsh" -> s"""WITH e AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id < 10),
      |b AS (SELECT vec_id, embedding,
      |  list_reduce(list_prepend(0, list_transform(range(0, 16), p ->
      |    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(0, len(embedding)),
      |             i -> CAST(embedding[i+1] AS DOUBLE) * ((p*12289 + i*331) % 997 - 498))),
      |           (a, x) -> a + x) > 0 THEN 1 ELSE 0 END)),
      |    (acc, bb) -> acc*2 + bb) AS bucket
      |  FROM e),
      |q AS (SELECT vec_id AS qid, embedding AS qe, bucket AS qb FROM b WHERE vec_id < 10),
      |probes AS (SELECT qid, qe, xor(qb, m.msk) AS bucket
      |           FROM q CROSS JOIN (SELECT unnest([0,1,2,4,8,16,32,64,128,256,512,
      |             1024,2048,4096,8192,16384,32768]) AS msk) m),
      |s AS (SELECT p.qid, c.vec_id,
      |        ${dot("c.embedding", "p.qe")}
      |        / (sqrt(${dot("c.embedding", "c.embedding")})
      |           * sqrt(${dot("p.qe", "p.qe")})) AS cos
      |      FROM b c JOIN probes p ON c.bucket = p.bucket
      |      WHERE c.vec_id <> p.qid),
      |r AS (SELECT qid, vec_id,
      |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
      |      FROM s)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
      |       CAST(vec_id AS BIGINT) AS neighbor
      |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Full SQL mirror of the IVF pipeline: codebook = vec_id < 8, corpus
    // assigned to its argmax-cosine centroid (ties → smallest cid, the
    // struct-sort order on the Spark side), queries probe their top-2
    // centroids, exact cosine rescoring, per-query rank.
    "sim_ann_ivf" -> s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |cent AS (SELECT vec_id AS cid, embedding AS ce FROM e WHERE vec_id < 8),
      |sc AS (SELECT e.vec_id, e.embedding, cent.cid,
      |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |           ${dot("e.embedding", "cent.ce")}
      |           / (sqrt(${dot("e.embedding", "e.embedding")})
      |              * sqrt(${dot("cent.ce", "cent.ce")})) DESC, cent.cid) AS rn
      |       FROM e CROSS JOIN cent),
      |corpus AS (SELECT vec_id, embedding, cid FROM sc WHERE rn = 1),
      |probes AS (SELECT vec_id AS qid, embedding AS qe, cid
      |           FROM sc WHERE vec_id < 10 AND rn <= 2),
      |s AS (SELECT p.qid, c.vec_id,
      |        ${dot("c.embedding", "p.qe")}
      |        / (sqrt(${dot("c.embedding", "c.embedding")})
      |           * sqrt(${dot("p.qe", "p.qe")})) AS cos
      |      FROM corpus c JOIN probes p USING (cid)
      |      WHERE c.vec_id <> p.qid),
      |r AS (SELECT qid, vec_id,
      |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
      |      FROM s)
      |SELECT CAST(qid AS BIGINT) AS qid, CAST(rank AS BIGINT) AS rank,
      |       CAST(vec_id AS BIGINT) AS neighbor
      |FROM r WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // Full SQL mirror of the two-pass deterministic k-means fit behind the
    // IVF codebook: init = the 4 smallest vec_ids (cid 0..3 in id order),
    // pass 1 assigns every vector to its argmax-cosine centroid (ties →
    // smallest cid) and takes per-(cid,pos) quantized coordinate means
    // (floor(v·10^6) sums — exact integers, so the reduction order can't
    // matter in either engine), pass 2 reassigns against those means and
    // emits its sums. Multiple unnests in one SELECT zip positionally.
    // Int8 quantization: the fit (per-dim min/max) and the apply replay
    // the Spark side's exact double-op order — subtract, multiply by the
    // PRE-DIVIDED scale 255/(mx−mn), +0.5, floor — so the integers match
    // bit-for-bit (each IEEE op is correctly rounded; mul-then-div would
    // round differently). Explicit DOUBLE casts: DuckDB keeps FLOAT
    // arithmetic in single precision, Spark promotes to double.
    // Embedding audit mirror: identical per-row predicates (same non-finite
    // formula — abs(x) above Float.MaxValue — rather than isinf, so the
    // FORMULA is mirrored, not the intent), exact integer counts only.
    "emb_audit" -> """SELECT
      |  CAST(count(*) AS BIGINT) AS n_total,
      |  CAST(sum(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_null,
      |  CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) = 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
      |  CAST(min(CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
      |    THEN len(embedding) END) AS BIGINT) AS dim_min,
      |  CAST(max(CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
      |    THEN len(embedding) END) AS BIGINT) AS dim_max,
      |  CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
      |    AND len(list_filter(embedding, x -> x IS NULL)) > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullelem,
      |  CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
      |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
      |    AND len(list_filter(embedding,
      |          x -> isnan(x) OR abs(x) > 3.4028235e38)) > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite,
      |  CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
      |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
      |    AND len(list_filter(embedding,
      |          x -> isnan(x) OR abs(x) > 3.4028235e38)) = 0
      |    AND len(list_filter(embedding, x -> x <> 0)) = 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
      |  CAST(sum(CASE WHEN embedding IS NOT NULL AND len(embedding) > 0
      |    AND len(list_filter(embedding, x -> x IS NULL)) = 0
      |    AND len(list_filter(embedding,
      |          x -> isnan(x) OR abs(x) > 3.4028235e38)) = 0
      |    AND len(list_filter(embedding, x -> x <> 0)) > 0
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
      |FROM embeddings""".stripMargin,

    "emb_quantize" -> """WITH v0 AS (
      |  SELECT vec_id, len(embedding) AS n,
      |         unnest(range(len(embedding))) AS i, embedding
      |  FROM embeddings),
      |x AS (
      |  SELECT vec_id, n, i, CAST(embedding[i+1] AS DOUBLE) AS v FROM v0),
      |p AS (SELECT i, min(v) AS mn, max(v) AS mx FROM x GROUP BY i),
      |s AS (SELECT i, mn,
      |        CASE WHEN mx = mn THEN 0.0 ELSE 255.0 / (mx - mn) END AS sc
      |      FROM p),
      |q0 AS (
      |  SELECT vec_id, n, x.i,
      |         CAST(floor((v - mn) * sc + 0.5) AS BIGINT) AS qr
      |  FROM x JOIN s ON x.i = s.i),
      |q AS (
      |  SELECT vec_id, n, i,
      |         CASE WHEN qr < 0 THEN 0 WHEN qr > 255 THEN 255 ELSE qr END AS q
      |  FROM q0)
      |SELECT vec_id,
      |  CAST(SUM(q) AS BIGINT) AS q_sum,
      |  CAST(MAX(CASE WHEN i = 0 THEN q END) AS BIGINT) AS q_first,
      |  CAST(MAX(CASE WHEN i = n - 1 THEN q END) AS BIGINT) AS q_last,
      |  CAST(SUM(CASE WHEN q = 0 OR q = 255 THEN 1 ELSE 0 END) AS BIGINT) AS n_sat
      |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "ivf_fit" -> s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |initk AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ce
      |          FROM e ORDER BY vec_id LIMIT 4),
      |init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, ce FROM initk),
      |a1 AS (SELECT e.vec_id, e.embedding, init.cid,
      |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |           ${dot("e.embedding", "init.ce")}
      |           / (sqrt(${dot("e.embedding", "e.embedding")})
      |              * sqrt(${dot("init.ce", "init.ce")})) DESC, init.cid) AS rn
      |       FROM e CROSS JOIN init),
      |x1 AS (SELECT cid,
      |         unnest(range(0, len(embedding))) AS pos,
      |         unnest(list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS q
      |       FROM a1 WHERE rn = 1),
      |c1 AS (SELECT cid, pos, CAST(sum(q) AS BIGINT) AS qsum,
      |              CAST(count(*) AS BIGINT) AS cnt
      |       FROM x1 GROUP BY cid, pos),
      |cent1 AS (SELECT cid,
      |            list(CAST(qsum AS DOUBLE) / CAST(cnt AS DOUBLE) / 1000000.0
      |                 ORDER BY pos) AS ce
      |          FROM c1 GROUP BY cid),
      |a2 AS (SELECT e.vec_id, e.embedding, cent1.cid,
      |         row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |           ${dot("e.embedding", "cent1.ce")}
      |           / (sqrt(${dot("e.embedding", "e.embedding")})
      |              * sqrt(${dot("cent1.ce", "cent1.ce")})) DESC, cent1.cid) AS rn
      |       FROM e CROSS JOIN cent1),
      |x2 AS (SELECT cid,
      |         unnest(range(0, len(embedding))) AS pos,
      |         unnest(list_transform(embedding,
      |           x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))) AS q
      |       FROM a2 WHERE rn = 1)
      |SELECT CAST(cid AS BIGINT) AS cid, CAST(pos AS BIGINT) AS pos,
      |       CAST(sum(q) AS BIGINT) AS qsum, CAST(count(*) AS BIGINT) AS cnt
      |FROM x2 GROUP BY cid, pos ORDER BY cid, pos""".stripMargin,

    // Embedding-cosine near-dup: TWO-band bucket mirror of HyperplaneLsh
    // (band b uses plane indices p+16*b of the same integer plane family)
    // + exact cosine (index-ordered fold), rounded BEFORE the threshold
    // filter as in Dedup.embeddingPairs; candidate = collision in EITHER
    // band, each pair emitted once (the Spark side's cross-band
    // dropDuplicates)
    "dedup_embedding" -> s"""WITH e AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
      |b AS (SELECT vec_id, embedding,
      |  list_reduce(list_prepend(0, list_transform(range(0, 16), p ->
      |    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(0, len(embedding)),
      |             i -> CAST(embedding[i+1] AS DOUBLE) * ((p*12289 + i*331) % 997 - 498))),
      |           (a, x) -> a + x) > 0 THEN 1 ELSE 0 END)),
      |    (acc, bb) -> acc*2 + bb) AS bucket0,
      |  list_reduce(list_prepend(0, list_transform(range(16, 32), p ->
      |    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(0, len(embedding)),
      |             i -> CAST(embedding[i+1] AS DOUBLE) * ((p*12289 + i*331) % 997 - 498))),
      |           (a, x) -> a + x) > 0 THEN 1 ELSE 0 END)),
      |    (acc, bb) -> acc*2 + bb) AS bucket1
      |  FROM e),
      |p AS (SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
      |        round(${dot("x.embedding", "y.embedding")}
      |          / (sqrt(${dot("x.embedding", "x.embedding")})
      |             * sqrt(${dot("y.embedding", "y.embedding")})), 6) AS cos
      |      FROM b x JOIN b y
      |        ON (x.bucket0 = y.bucket0 OR x.bucket1 = y.bucket1)
      |       AND x.vec_id < y.vec_id)
      |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b, cos
      |FROM p WHERE cos >= 0.9 ORDER BY doc_a, doc_b""".stripMargin,

    // Line-level boilerplate dedup: 10-word chunk "lines" (1-based
    // inclusive list slice = Spark's slice(arr, i*10+1, 10)), planted
    // footer line on doc_id%7==0, a line stripped when >= 2 distinct docs
    // carry it; per-doc re-assembly ordered by chunk position (string_agg
    // skips the NULLed dup lines exactly like Spark's filter+array_join)
    "dedup_lines" -> """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS words FROM documents),
      |l0 AS (SELECT doc_id, i AS pos,
      |         array_to_string(words[(i*10+1):(i*10+10)], ' ') AS line
      |       FROM d, unnest(range(0, CAST(ceil(len(words)/10.0) AS BIGINT))) AS t(i)),
      |l AS (SELECT doc_id, pos, line FROM l0
      |      UNION ALL
      |      SELECT doc_id, 1000000 AS pos,
      |             'subscribe now click here to follow us and sign up' AS line
      |      FROM documents WHERE doc_id % 7 = 0),
      |g AS (SELECT line FROM l GROUP BY line HAVING count(DISTINCT doc_id) >= 2),
      |k AS (SELECT l.doc_id, l.pos, l.line, (g.line IS NOT NULL) AS dup
      |      FROM l LEFT JOIN g ON l.line = g.line)
      |SELECT doc_id,
      |  coalesce(string_agg(CASE WHEN NOT dup THEN line END, ' ' ORDER BY pos), '') AS clean_text,
      |  CAST(coalesce(sum(CASE WHEN dup THEN 1 ELSE 0 END), 0) AS BIGINT) AS removed
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Capped (scale-mode) embedding dedup: same two-band bucketing, but a
    // planted 41-member dense bucket (vec 0 + 40 clones) exceeds
    // maxBucket=20 in both bands, so those buckets emit the id-ordered
    // successor CHAIN (lead over vec_id) instead of all-pairs — exactly
    // Dedup.embeddingPairs' windowed cap path; small buckets keep the
    // pair-complete self-join. UNION dedupes cross-band collisions like
    // the Spark side's dropDuplicates.
    "dedup_embedding_capped" -> s"""WITH e AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT 300000 + x.u AS vec_id, e0.embedding
      |  FROM (SELECT embedding FROM embeddings WHERE vec_id = 0) e0
      |  CROSS JOIN (SELECT unnest(range(0, 40)) AS u) x),
      |b AS (SELECT vec_id,
      |  list_reduce(list_prepend(0, list_transform(range(0, 16), p ->
      |    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(0, len(embedding)),
      |             i -> CAST(embedding[i+1] AS DOUBLE) * ((p*12289 + i*331) % 997 - 498))),
      |           (a, x) -> a + x) > 0 THEN 1 ELSE 0 END)),
      |    (acc, bb) -> acc*2 + bb) AS bucket0,
      |  list_reduce(list_prepend(0, list_transform(range(16, 32), p ->
      |    CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |           list_transform(range(0, len(embedding)),
      |             i -> CAST(embedding[i+1] AS DOUBLE) * ((p*12289 + i*331) % 997 - 498))),
      |           (a, x) -> a + x) > 0 THEN 1 ELSE 0 END)),
      |    (acc, bb) -> acc*2 + bb) AS bucket1
      |  FROM e),
      |t AS (SELECT vec_id, 0 AS band, bucket0 AS bucket FROM b
      |      UNION ALL
      |      SELECT vec_id, 1 AS band, bucket1 AS bucket FROM b),
      |sized AS (SELECT vec_id, band, bucket,
      |            count(*) OVER (PARTITION BY band, bucket) AS n,
      |            lead(vec_id) OVER (PARTITION BY band, bucket
      |                               ORDER BY vec_id) AS nxt
      |          FROM t),
      |cand AS (
      |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
      |  FROM sized x JOIN sized y ON x.band = y.band AND x.bucket = y.bucket
      |   AND x.vec_id < y.vec_id
      |  WHERE x.n <= 20 AND y.n <= 20
      |  UNION
      |  SELECT vec_id AS doc_a, nxt AS doc_b FROM sized
      |  WHERE n > 20 AND nxt IS NOT NULL),
      |p AS (SELECT c.doc_a, c.doc_b,
      |        round(${dot("ea.embedding", "eb.embedding")}
      |          / (sqrt(${dot("ea.embedding", "ea.embedding")})
      |             * sqrt(${dot("eb.embedding", "eb.embedding")})), 6) AS cos
      |      FROM cand c JOIN e ea ON ea.vec_id = c.doc_a
      |                  JOIN e eb ON eb.vec_id = c.doc_b)
      |SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b, cos
      |FROM p WHERE cos >= 0.9 ORDER BY doc_a, doc_b""".stripMargin,

    // Transitive dup groups: recursive-CTE reachability over the ALL-PAIRS
    // exact near-dup ground truth (quadratic by design, like nd_pairs —
    // sf0.01 gate only); group_id = min reachable id including self
    "dedup_groups" -> s"""WITH RECURSIVE $NearDupPairs,
      |edges AS (
      |  SELECT doc_a AS s, doc_b AS d FROM nd_pairs
      |  UNION
      |  SELECT doc_b AS s, doc_a AS d FROM nd_pairs),
      |reach(s, d) AS (
      |  SELECT s, d FROM edges
      |  UNION
      |  SELECT r.s, e2.d FROM reach r JOIN edges e2 ON r.d = e2.s),
      |grp AS (
      |  SELECT s AS doc_id, least(s, min(d)) AS group_id
      |  FROM reach GROUP BY s)
      |SELECT CAST(group_id AS BIGINT) AS group_id, CAST(doc_id AS BIGINT) AS doc_id,
      |       doc_id = group_id AS keep
      |FROM grp ORDER BY group_id, doc_id""".stripMargin,

    // Leakage-safe split: reachability groups (as in dedup_groups) LEFT-
    // joined onto the whole corpus (singletons default group_id = doc_id),
    // then the same modular sampling hash as sample_stratified picks the
    // split from the GROUP id — recomputed end to end, so a doc split by
    // its own id instead of its group's would hash-mismatch.
    "split_safe" -> s"""WITH RECURSIVE $NearDupPairs,
      |edges AS (
      |  SELECT doc_a AS s, doc_b AS d FROM nd_pairs
      |  UNION
      |  SELECT doc_b AS s, doc_a AS d FROM nd_pairs),
      |reach(s, d) AS (
      |  SELECT s, d FROM edges
      |  UNION
      |  SELECT r.s, e2.d FROM reach r JOIN edges e2 ON r.d = e2.s),
      |grp AS (
      |  SELECT s AS doc_id, least(s, min(d)) AS group_id
      |  FROM reach GROUP BY s),
      |asg AS (
      |  SELECT c.doc_id, COALESCE(g.group_id, c.doc_id) AS group_id
      |  FROM nd_corpus c LEFT JOIN grp g ON c.doc_id = g.doc_id),
      |b AS (
      |  SELECT doc_id, group_id,
      |    ((group_id % 1000003) * 2654435761 + 12345) % 1000 AS bkt
      |  FROM asg)
      |SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |       CAST(group_id AS BIGINT) AS group_id,
      |       CASE WHEN bkt < 800 THEN 'train'
      |            WHEN bkt < 900 THEN 'val'
      |            ELSE 'test' END AS split
      |FROM b ORDER BY doc_id""".stripMargin,

    // Dedup-weighted effective size: reachability groups (as in
    // split_safe), anchor = group min doc id; planted +100000 copies take
    // their original's source via the src CTE join; one source-keyed
    // rollup of raw vs anchor-only word counts.
    "effective_size" -> s"""WITH RECURSIVE $NearDupPairs,
      |src AS (
      |  SELECT doc_id, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, source FROM documents WHERE doc_id % 20 = 0),
      |edges AS (
      |  SELECT doc_a AS s, doc_b AS d FROM nd_pairs
      |  UNION
      |  SELECT doc_b AS s, doc_a AS d FROM nd_pairs),
      |reach(s, d) AS (
      |  SELECT s, d FROM edges
      |  UNION
      |  SELECT r.s, e2.d FROM reach r JOIN edges e2 ON r.d = e2.s),
      |grp AS (
      |  SELECT s AS doc_id, least(s, min(d)) AS group_id
      |  FROM reach GROUP BY s),
      |asg AS (
      |  SELECT c.doc_id, s.source,
      |    CAST(len(regexp_split_to_array(trim(c.text), '\\s+')) AS BIGINT) AS w,
      |    COALESCE(g.group_id, c.doc_id) AS group_id
      |  FROM nd_corpus c JOIN src s ON c.doc_id = s.doc_id
      |  LEFT JOIN grp g ON c.doc_id = g.doc_id)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id = group_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(w) AS BIGINT) AS words_raw,
      |  CAST(sum(CASE WHEN doc_id = group_id THEN w ELSE 0 END) AS BIGINT) AS words_kept
      |FROM asg GROUP BY 1 ORDER BY 1""".stripMargin,

    // Quality-aware canonical election: reachability groups (as in
    // dedup_groups) joined to the text_quality formula over nd_corpus;
    // winner = (quality DESC, words DESC, doc_id) row_number 1
    "dedup_keep_best" -> s"""WITH RECURSIVE $NearDupPairs,
      |edges AS (
      |  SELECT doc_a AS s, doc_b AS d FROM nd_pairs
      |  UNION
      |  SELECT doc_b AS s, doc_a AS d FROM nd_pairs),
      |reach(s, d) AS (
      |  SELECT s, d FROM edges
      |  UNION
      |  SELECT r.s, e2.d FROM reach r JOIN edges e2 ON r.d = e2.s),
      |grp AS (
      |  SELECT s AS doc_id, least(s, min(d)) AS group_id
      |  FROM reach GROUP BY s),
      |q AS (SELECT doc_id,
      |        CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS words,
      |        CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
      |             w -> w IN ('the', 'a', 'of'))) AS BIGINT) AS stops
      |      FROM nd_corpus),
      |sc AS (SELECT doc_id, words,
      |         CASE WHEN words >= 50 AND stops > 0 THEN CAST(2 AS BIGINT)
      |              WHEN words >= 20 THEN CAST(1 AS BIGINT)
      |              ELSE CAST(0 AS BIGINT) END AS quality
      |       FROM q),
      |r AS (SELECT g.group_id, g.doc_id, sc.quality,
      |        row_number() OVER (PARTITION BY g.group_id
      |          ORDER BY sc.quality DESC, sc.words DESC, g.doc_id) AS rn,
      |        count(*) OVER (PARTITION BY g.group_id) AS n_members
      |      FROM grp g JOIN sc USING (doc_id))
      |SELECT CAST(group_id AS BIGINT) AS group_id, CAST(doc_id AS BIGINT) AS best_id,
      |       quality AS best_quality, CAST(n_members AS BIGINT) AS n_members
      |FROM r WHERE rn = 1 ORDER BY group_id""".stripMargin,

    "sample_stratified" -> """WITH rates(key, permille) AS (VALUES ('en', 250), ('zh', 500))
      |SELECT d.doc_id, d.lang, d.source,
      |       ((d.doc_id % 1000003) * 2654435761 + 12345) % 1000 AS bucket
      |FROM documents d LEFT JOIN rates r ON d.lang = r.key
      |WHERE ((d.doc_id % 1000003) * 2654435761 + 12345) % 1000
      |      < COALESCE(r.permille, 1000)
      |ORDER BY d.doc_id""".stripMargin,

    // Temperature mixture: sqrt is IEEE-correctly-rounded in both engines
    // (ln/pow are not); weight quantized to exact long, weight sum
    // integer-exact, permille a fixed-order double quotient — mirrored
    // operation-for-operation against Curation.temperatureMixRates.
    "mix_sample" -> """WITH n AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang),
      |tot AS (
      |  SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
      |         CAST(sum(CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT)) AS BIGINT) AS q_sum
      |  FROM n),
      |r AS (
      |  SELECT lang, n_docs,
      |    CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT) AS w_q,
      |    LEAST(CAST(floor(
      |      ((1000.0 * CAST(floor(CAST(n_total AS DOUBLE) / 2.0) AS BIGINT))
      |         * CAST(floor(sqrt(CAST(n_docs AS DOUBLE)) * 1000000.0) AS BIGINT))
      |      / (CAST(q_sum AS DOUBLE) * CAST(n_docs AS DOUBLE))) AS BIGINT), 1000) AS permille
      |  FROM n, tot)
      |SELECT r.lang, r.n_docs, r.w_q, r.permille,
      |       CAST(count(d.doc_id) AS BIGINT) AS n_kept,
      |       CAST(coalesce(sum(d.doc_id), 0) AS BIGINT) AS kept_id_sum
      |FROM r LEFT JOIN documents d
      |  ON d.lang = r.lang
      | AND ((d.doc_id % 1000003) * 2654435761 + 12345) % 1000 < r.permille
      |GROUP BY r.lang, r.n_docs, r.w_q, r.permille
      |ORDER BY r.lang""".stripMargin,

    // Per-key quota in deterministic hash order (same order hash as
    // shard_plan's within-shard shuffle).
    "sample_cap_per_key" -> """WITH t AS (
      |  SELECT doc_id, lang,
      |    ((doc_id % 999983) * 1103515245 + 54321) % 1000000007 AS ord
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang ORDER BY ord, doc_id) AS rnk
      |  FROM t)
      |SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rank
      |FROM r WHERE rnk <= 10 ORDER BY lang, rank""".stripMargin,

    // Exact quartiles from the value-domain histogram — the oracle mirrors
    // histogram → running sum → min-threshold boundary → bucket stats.
    "len_buckets" -> """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS tok
      |  FROM documents),
      |h AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM t GROUP BY tok),
      |c AS (SELECT tok, cnt, CAST(sum(cnt) OVER (ORDER BY tok) AS BIGINT) AS cum FROM h),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM t),
      |b AS (
      |  SELECT
      |    min(CASE WHEN cum >= CAST(ceil(CAST(1 * n_docs AS DOUBLE) / 4.0) AS BIGINT) THEN tok END) AS b1,
      |    min(CASE WHEN cum >= CAST(ceil(CAST(2 * n_docs AS DOUBLE) / 4.0) AS BIGINT) THEN tok END) AS b2,
      |    min(CASE WHEN cum >= CAST(ceil(CAST(3 * n_docs AS DOUBLE) / 4.0) AS BIGINT) THEN tok END) AS b3
      |  FROM c, n)
      |SELECT CAST(CASE WHEN tok <= b1 THEN 0 WHEN tok <= b2 THEN 1
      |            WHEN tok <= b3 THEN 2 ELSE 3 END AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_docs, CAST(min(tok) AS BIGINT) AS min_tok,
      |       CAST(max(tok) AS BIGINT) AS max_tok, CAST(sum(tok) AS BIGINT) AS sum_tok
      |FROM t, b GROUP BY 1 ORDER BY 1""".stripMargin,

    // Deterministic shard plan: both hashes are pure modular arithmetic
    // (every product < 2^63); order_sum certifies the within-shard
    // row_number assignment, not just membership.
    "shard_plan" -> """WITH t AS (
      |  SELECT doc_id,
      |    ((doc_id % 1000003) * 2654435761 + 40503) % 16 AS shard,
      |    ((doc_id % 999983) * 1103515245 + 54321) % 1000000007 AS ord
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, shard, ord,
      |    row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS seq
      |  FROM t)
      |SELECT CAST(shard AS BIGINT) AS shard, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(max(CASE WHEN seq = 1 THEN doc_id END) AS BIGINT) AS first_id,
      |  CAST(sum(seq * (doc_id % 1000003)) AS BIGINT) AS order_sum
      |FROM r GROUP BY shard ORDER BY shard""".stripMargin,

    "seq_pack" -> """WITH t AS (
      |  SELECT doc_id, source, doc_id % 4 AS shard,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS tok
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, source, shard, tok,
      |    CAST(COALESCE(SUM(tok) OVER (PARTITION BY source, shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
      |  FROM t)
      |SELECT doc_id, source, shard, tok,
      |  CAST(floor(prev / 128.0) AS BIGINT) AS bin_id, prev % 128 AS bin_offset
      |FROM p ORDER BY source, shard, doc_id""".stripMargin,

    "decontaminate" -> """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(ws) - 2, 0)),
      |    j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3])) AS sh
      |  FROM w),
      |ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0),
      |tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 97 <> 0)
      |SELECT tr.doc_id, COUNT(*) AS hit_ngrams
      |FROM tr JOIN ev USING (g)
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    // Same expected RESULT as decontaminate: the Bloom prefilter has
    // one-sided error and the exact verify join removes false positives,
    // so the oracle IS the exact-set semantics — a hash mismatch here
    // would mean the screen dropped a true hit (impossible for a correct
    // Bloom) or the verify let a false positive through.
    // Embedding-space decontamination mirror: bipartite hyperplane-LSH
    // bucket join (train x eval, OR over the two bands — several-band
    // collisions collapse because the join is on the pair, not per band),
    // exact cosine on candidates, threshold 0.9. Planted leaks (every 50th
    // eval vector copied into train at +200000) must appear at cos = 1.
    "decontam_emb" -> s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |ev AS (SELECT vec_id, embedding FROM e WHERE vec_id % 25 = 0),
      |tr AS (SELECT vec_id, embedding FROM e WHERE vec_id % 25 <> 0
      |       UNION ALL
      |       SELECT vec_id + 200000 AS vec_id, embedding FROM ev WHERE vec_id % 50 = 0),
      |bt AS (SELECT vec_id, embedding,
      |         ${hyperBucket(0, 16)} AS bucket0,
      |         ${hyperBucket(16, 32)} AS bucket1 FROM tr),
      |be AS (SELECT vec_id, embedding,
      |         ${hyperBucket(0, 16)} AS bucket0,
      |         ${hyperBucket(16, 32)} AS bucket1 FROM ev),
      |p AS (SELECT t.vec_id AS vec_train, v.vec_id AS vec_eval,
      |        round(${dot("t.embedding", "v.embedding")}
      |          / (sqrt(${dot("t.embedding", "t.embedding")})
      |             * sqrt(${dot("v.embedding", "v.embedding")})), 6) AS cos
      |      FROM bt t JOIN be v
      |        ON (t.bucket0 = v.bucket0 OR t.bucket1 = v.bucket1))
      |SELECT CAST(vec_train AS BIGINT) AS vec_train,
      |  CAST(vec_eval AS BIGINT) AS vec_eval, cos
      |FROM p WHERE cos >= 0.9 ORDER BY vec_train, vec_eval""".stripMargin,

    "decontam_bloom" -> """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |sh AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(ws) - 2, 0)),
      |    j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3])) AS sh
      |  FROM w),
      |ev AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 97 = 0),
      |tr AS (SELECT doc_id, unnest(sh) AS g FROM sh WHERE doc_id % 97 <> 0)
      |SELECT tr.doc_id, COUNT(*) AS hit_ngrams
      |FROM tr JOIN ev USING (g)
      |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,

    "doc_repetition" -> """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    list_transform(range(0, greatest(len(ws) - 1, 0)),
      |      j -> ws[j+1] || ' ' || ws[j+2]) AS g2,
      |    list_transform(range(0, greatest(len(ws) - 2, 0)),
      |      j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3]) AS g3
      |  FROM w),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN len(g2) = 0 THEN 0.0
      |         ELSE round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) END AS dup2_frac,
      |    CASE WHEN len(g3) = 0 THEN 0.0
      |         ELSE round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) END AS dup3_frac
      |  FROM g)
      |SELECT doc_id, dup2_frac, dup3_frac,
      |       dup2_frac > 0.2 OR dup3_frac > 0.18 AS repetitive
      |FROM f ORDER BY doc_id""".stripMargin,

    "curation_gate" -> """WITH tr AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 0),
      |w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws, text FROM tr),
      |scored AS (
      |  SELECT doc_id,
      |    CAST(len(ws) AS BIGINT) AS words,
      |    CAST(length(regexp_replace(text, '[^.,!?]', '', 'g')) AS BIGINT) AS punct,
      |    CAST(len(list_filter(ws, x -> x IN ('the', 'a', 'of'))) AS BIGINT) AS stops,
      |    list_transform(range(0, greatest(len(ws) - 1, 0)),
      |      j -> ws[j+1] || ' ' || ws[j+2]) AS g2,
      |    list_transform(range(0, greatest(len(ws) - 2, 0)),
      |      j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3]) AS g3
      |  FROM w),
      |f AS (
      |  SELECT doc_id,
      |    CASE WHEN words >= 50 AND stops > 0 THEN CAST(2 AS BIGINT)
      |         WHEN words >= 20 THEN CAST(1 AS BIGINT)
      |         ELSE CAST(0 AS BIGINT) END AS quality,
      |    CASE WHEN len(g2) = 0 THEN 0.0
      |         ELSE round(1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2), 6) END AS dup2_frac,
      |    CASE WHEN len(g3) = 0 THEN 0.0
      |         ELSE round(1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3), 6) END AS dup3_frac
      |  FROM scored),
      |esh AS (SELECT doc_id, list_distinct(list_transform(
      |    range(0, greatest(len(regexp_split_to_array(trim(text), '\s+')) - 2, 0)),
      |    j -> regexp_split_to_array(trim(text), '\s+')[j+1] || ' '
      |         || regexp_split_to_array(trim(text), '\s+')[j+2] || ' '
      |         || regexp_split_to_array(trim(text), '\s+')[j+3])) AS sh
      |  FROM documents),
      |ev AS (SELECT DISTINCT unnest(sh) AS g FROM esh WHERE doc_id % 97 = 0),
      |contam AS (
      |  SELECT DISTINCT t.doc_id FROM (
      |    SELECT doc_id, unnest(sh) AS g FROM esh WHERE doc_id % 97 <> 0) t
      |  JOIN ev USING (g))
      |SELECT f.doc_id, f.quality, f.dup2_frac, f.dup3_frac,
      |  f.dup2_frac > 0.2 OR f.dup3_frac > 0.18 AS repetitive,
      |  c.doc_id IS NOT NULL AS contaminated,
      |  f.quality >= 1 AND NOT (f.dup2_frac > 0.2 OR f.dup3_frac > 0.18)
      |    AND c.doc_id IS NULL AS keep
      |FROM f LEFT JOIN contam c ON f.doc_id = c.doc_id
      |ORDER BY f.doc_id""".stripMargin,

    "text_redact" -> """WITH c AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 10 = 0 THEN text || ' call 123456789 or 555123456'
      |         ELSE text END AS text
      |  FROM documents)
      |SELECT doc_id,
      |  regexp_replace(text, '[0-9]{6,}', '<NUM>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS redactions
      |FROM c ORDER BY doc_id""".stripMargin,

    "tok_topfreq" -> """SELECT token, COUNT(*) AS cnt FROM (
      |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
      |  FROM documents)
      |WHERE token <> '' GROUP BY token
      |ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "text_tokens" -> """SELECT doc_id, CAST(length(text) AS BIGINT) AS chars,
      |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS words,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS BIGINT) AS tokens_bpe
      |FROM documents ORDER BY doc_id""".stripMargin,

    // Rational-idf TF-IDF (N/df instead of ln(N/df): ln is libm-dependent
    // and not bit-portable; the rational weight ranks identically for
    // equal tf). score_q is a fixed-order double product, floored.
    "text_tfidf" -> """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |tf AS (
      |  SELECT doc_id, t AS term, CAST(len(list_filter(ws, x -> x = t)) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, ws, unnest(list_distinct(ws)) AS t FROM w)),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df,
      |              CAST(sum(tf) AS BIGINT) AS ctf FROM tf GROUP BY term),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
      |s AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df, df.ctf,
      |    CAST(floor(((CAST(n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
      |      * CAST(tf.tf AS DOUBLE)) * 1000.0) AS BIGINT) AS score_q
      |  FROM tf JOIN df USING (term) CROSS JOIN n),
      |r AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY score_q DESC, term) AS rnk FROM s)
      |SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, tf, df, ctf, score_q
      |FROM r WHERE rnk <= 3 ORDER BY doc_id, rank""".stripMargin,

    "text_quality" -> """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS words,
      |    CAST(length(regexp_replace(text, '[^.,!?]', '', 'g')) AS BIGINT) AS punct,
      |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
      |         w -> w IN ('the', 'a', 'of'))) AS BIGINT) AS stops
      |  FROM documents)
      |SELECT doc_id, words, punct, stops,
      |  CASE WHEN words >= 50 AND stops > 0 THEN CAST(2 AS BIGINT)
      |       WHEN words >= 20 THEN CAST(1 AS BIGINT)
      |       ELSE CAST(0 AS BIGINT) END AS quality
      |FROM t ORDER BY doc_id""".stripMargin,

    "text_lang_id" -> """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w IN ('the','a','of'))) AS BIGINT) AS c_en,
      |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w IN ('der','die','und'))) AS BIGINT) AS c_de,
      |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w IN ('el','los','que'))) AS BIGINT) AS c_es,
      |    CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), w -> w IN ('le','les','est'))) AS BIGINT) AS c_fr
      |  FROM documents),
      |p AS (SELECT doc_id, lang, greatest(c_en, c_de, c_es, c_fr) AS best,
      |             c_en, c_de, c_es, c_fr FROM t),
      |o AS (SELECT doc_id, lang,
      |        CASE WHEN c_en > 0 AND c_en = best THEN 'en'
      |             WHEN c_de > 0 AND c_de = best THEN 'de'
      |             WHEN c_es > 0 AND c_es = best THEN 'es'
      |             WHEN c_fr > 0 AND c_fr = best THEN 'fr'
      |             ELSE 'und' END AS pred
      |      FROM p)
      |SELECT doc_id, pred, lang, pred = lang AS hit FROM o ORDER BY doc_id""".stripMargin,

    "text_fingerprint" -> """SELECT doc_id,
      |  list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(regexp_split_to_array(trim(text), '\s+'),
      |      w -> CAST((length(w)*131 + ascii(substr(w, 1, 1))) % 1000000007 AS BIGINT))),
      |    (acc, x) -> (acc*1000003 + x) % 1000000007) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin,

    // Bigram fluency mirror: same relative threshold (c*1000 >= total
    // occurrences), same floor-permille idiom. Grams are enumerated with
    // the list_transform(range)+unnest idiom (the table-function range
    // cannot take lateral column args); the "u v" string is equivalent to
    // the engine's (u, v) pair key because words are whitespace-split
    // (injective concat). Sub-2-word docs are re-attached by the LEFT
    // JOIN with zero counts and a NULL permille.
    "ngram_fluency" -> """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |big AS (SELECT doc_id, unnest(list_transform(
      |          range(0, greatest(len(ws) - 1, 0)),
      |          j -> ws[j+1] || ' ' || ws[j+2])) AS g FROM w),
      |cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM big GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM big),
      |flagged AS (SELECT g, (c * 1000 >= t) AS common FROM cnt, tot),
      |pd AS (SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_big,
      |         CAST(sum(CASE WHEN f.common THEN 1 ELSE 0 END) AS BIGINT) AS n_common
      |       FROM big b JOIN flagged f ON b.g = f.g GROUP BY 1)
      |SELECT d.doc_id, COALESCE(pd.n_big, 0) AS n_big,
      |  COALESCE(pd.n_common, 0) AS n_common,
      |  CASE WHEN COALESCE(pd.n_big, 0) > 0
      |    THEN CAST(floor(1000 * pd.n_common / pd.n_big) AS BIGINT) END AS common_permille
      |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
      |ORDER BY d.doc_id""".stripMargin,

    // Trigram novelty mirror: DISTINCT (doc, gram), min doc id per gram via
    // a window (exactly the engine's Window.partitionBy(g)), permille over
    // the doc's distinct-gram count.
    "ngram_novelty" -> """WITH w AS (
      |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |tri AS (SELECT DISTINCT doc_id, g FROM (
      |          SELECT doc_id, unnest(list_transform(
      |            range(0, greatest(len(ws) - 2, 0)),
      |            j -> ws[j+1] || ' ' || ws[j+2] || ' ' || ws[j+3])) AS g FROM w)),
      |flag AS (SELECT doc_id, g,
      |           min(doc_id) OVER (PARTITION BY g) AS first_doc FROM tri),
      |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
      |         CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
      |       FROM flag GROUP BY 1)
      |SELECT d.doc_id, COALESCE(pd.n_grams, 0) AS n_grams,
      |  COALESCE(pd.n_novel, 0) AS n_novel,
      |  CASE WHEN COALESCE(pd.n_grams, 0) > 0
      |    THEN CAST(floor(1000 * pd.n_novel / pd.n_grams) AS BIGINT) END AS novelty_permille
      |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
      |ORDER BY d.doc_id""".stripMargin,

    // Source-overlap mirror: per-source DISTINCT bigram sets, gram-keyed
    // self-join intersection, all unordered pairs kept (empty intersection
    // => 0). String '<' is binary order in both engines.
    "source_overlap" -> """WITH w AS (
      |  SELECT source, regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
      |sg AS (SELECT DISTINCT source, g FROM (
      |         SELECT source, unnest(list_transform(
      |           range(0, greatest(len(ws) - 1, 0)),
      |           j -> ws[j+1] || ' ' || ws[j+2])) AS g FROM w)),
      |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sg GROUP BY 1),
      |inter AS (SELECT a.source AS src_a, b.source AS src_b,
      |            CAST(count(*) AS BIGINT) AS inter
      |          FROM sg a JOIN sg b ON a.g = b.g AND a.source < b.source
      |          GROUP BY 1, 2)
      |SELECT x.source AS src_a, y.source AS src_b, x.sz AS sz_a, y.sz AS sz_b,
      |  COALESCE(i.inter, 0) AS inter,
      |  CAST(floor(1000 * COALESCE(i.inter, 0) /
      |    (x.sz + y.sz - COALESCE(i.inter, 0))) AS BIGINT) AS jaccard_permille
      |FROM sizes x JOIN sizes y ON x.source < y.source
      |LEFT JOIN inter i ON i.src_a = x.source AND i.src_b = y.source
      |ORDER BY src_a, src_b""".stripMargin,

    "multimodal_meta" -> """SELECT doc_id,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes,
      |  CAST(64 + strlen(text) % 577 AS BIGINT) AS width,
      |  CAST(64 + (strlen(text) * 31) % 577 AS BIGINT) AS height,
      |  CAST(1 + strlen(text) % 24 AS BIGINT) AS frames
      |FROM documents ORDER BY doc_id""".stripMargin
  )
}
