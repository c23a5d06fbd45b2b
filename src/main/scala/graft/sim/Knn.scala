package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * - `cosineTopK`: brute-force exact baseline — broadcast the (small) query
  *   set against the corpus, score with a left-fold dot product (the fold
  *   is index-ordered, so the double result is bit-identical to the DuckDB
  *   oracle's list_reduce), rank per query. At 10^12 rows this is one
  *   corpus scan per query batch — the correct exact-kNN shape.
  * - `lshTopK`: scale path — 16 deterministic hyperplanes (pure integer
  *   formula, no data-dependent training) bucket both corpus and queries;
  *   candidates come from a bucket-equality join (plus optional multi-probe
  *   by Hamming-adjacent buckets), exact rescoring only on candidates.
  */
object Knn {

  /** Index-ordered dot product of two float arrays, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query row.
    * Output: (qid, rank, neighbor) — integer-only, oracle-exact.
    */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qe"))
    val scored = corpus.select(col(idCol).as("neighbor"), col(embCol).as("ce"))
      .join(broadcast(q), col("neighbor") =!= col("qid"))
      .withColumn("cos", cosine(col("ce"), col("qe")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").cast("long").as("qid"), col("rank").cast("long").as("rank"),
        col("neighbor").cast("long").as("neighbor"))
  }

  /** Deterministic hyperplane component p,i ∈ [-498, 498]:
    * ((p*12289 + i*331) mod 997) - 498. Public-formula stand-in for random
    * Gaussian planes; being data-independent it needs no fit step and is
    * reproducible across engines and cluster sizes.
    */
  private def planeVal(p: Column, i: Column): Column =
    (pmod(p * 12289 + i * 331, lit(997L)) - 498L).cast("double")

  /** 16-bit LSH bucket of an embedding: bit p = sign of <emb, plane_p>. */
  def lshBucket(emb: Column): Column =
    aggregate(sequence(lit(0L), lit(15L)), lit(0L), (acc, p) => {
      val d = aggregate(sequence(lit(0L), size(emb).cast("long") - 1L), lit(0.0),
        (s, i) => s + element_at(emb, (i + 1L).cast("int")).cast("double") * planeVal(p, i))
      acc * 2L + when(d > 0.0, 1L).otherwise(0L)
    })

  /** Approximate top-k: candidates share the query's LSH bucket; exact
    * cosine rescoring on candidates only. Output same shape as cosineTopK.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor"), col(embCol).as("ce"),
      lshBucket(col(embCol)).as("bucket"))
    val q = queries.select(col(idCol).as("qid"), col(embCol).as("qe"),
      lshBucket(col(embCol)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor") =!= col("qid"))
      .withColumn("cos", cosine(col("ce"), col("qe")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("neighbor").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").cast("long").as("qid"), col("rank").cast("long").as("rank"),
        col("neighbor").cast("long").as("neighbor"))
  }
}
