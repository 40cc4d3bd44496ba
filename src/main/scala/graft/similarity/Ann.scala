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

  /** IVF coarse quantizer: `nlist` centroids trained with `iters` Lloyd
    * rounds, deterministic seeding (the nlist corpus vectors with the
    * smallest xxhash64 rank — reproducible across runs and partitions).
    * Output: (cid, cv: array<double>).
    *
    * Scale notes: centroids are TINY (nlist×dim) and always broadcast;
    * each Lloyd round is one broadcast join (assign, narrow) + one
    * per-dimension hash aggregate (update) whose shuffle rows are
    * (cid, dim_idx, partial) — independent of corpus vector bytes. The
    * seeding window sorts hash ranks of (id) pairs only; at the
    * 10^12-vector regime seed/train on a sampled slice instead — the
    * interface stays the same.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val v = corpus.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    val w = Window.orderBy(xxhash64(col("vec_id")), col("vec_id"))
    var cents = v.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= nlist)
      .select((col("rk") - 1).cast("int").as("cid"), col("v").as("cv"))
    (0 until iters).foreach { _ =>
      val assigned = assignCells(v, cents)
      cents = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cid", "i").agg(avg(col("x")).as("x"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("i"), col("x")))),
          s => s.getField("x")).as("cv"))
    }
    cents
  }

  /** nearest-centroid assignment by cosine (broadcast centroids) */
  private def assignCells(v: DataFrame, cents: DataFrame): DataFrame =
    v.crossJoin(broadcast(cents))
      .withColumn("__cos",
        dot(col("v"), col("cv")) /
          (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("cv"), col("cv")))))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), col("__cos")).as("cid"), first(col("v")).as("v"))

  /** IVF top-k: corpus vectors are inverted-listed by nearest centroid;
    * each query probes its `nprobe` nearest cells and ranks EXACT cosine
    * within the probed candidates. The candidate join is an equi-join on
    * cell id — at 10^12 vectors only ~nprobe/nlist of the corpus is
    * touched per query, and nothing shuffles but (cid)-keyed rows.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val cents = ivfCentroids(corpus, nlist, iters, vecCol, idCol)
    val c = assignCells(
        corpus.select(col(idCol).as("vec_id"),
          col(vecCol).cast("array<double>").as("v")), cents)
      .withColumn("vnorm", sqrt(dot(col("v"), col("v"))))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("cid"))
    val qprobe = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .crossJoin(broadcast(cents))
      .withColumn("__cos",
        dot(col("qv"), col("cv")) /
          (sqrt(dot(col("qv"), col("qv"))) * sqrt(dot(col("cv"), col("cv")))))
      .withColumn("__pr", row_number().over(probeW))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("cid"))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    c.join(qprobe, Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosinePrenormed(col("qv"), col("v"),
          col("qnorm"), col("vnorm")), 6).as("cos"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("rank", row_number().over(w))
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
