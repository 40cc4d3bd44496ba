package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Dedup.{cosinePrenormed, dot}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Three paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus, one narrow pass computing cosine, then a
  *    per-query top-k window. This is the correctness baseline and the
  *    right plan whenever |queries| is broadcastable: the corpus is
  *    scanned ONCE with no shuffle of vectors; only (query_id, vec_id,
  *    cos) survives to the window shuffle, and the window partitions by
  *    query_id so skew is bounded by the corpus/query ratio.
  *  - [[lshTopK]] — random-hyperplane LSH with multi-probe: bucket both
  *    sides by sign-bit signature, probe the query's own bucket plus the
  *    `probes-1` single-bit flips with the smallest |margin| (the planes
  *    the query is closest to — the standard multi-probe choice), exact
  *    cosine + top-k within candidates. At 10^12 vectors the bucket join
  *    shuffles ids+buckets (~16 bytes/row), not vectors; recall is tuned
  *    with `planes` (fewer planes → bigger buckets) and `probes`.
  *  - [[ivfTopK]] — IVF: corpus inverted-listed by nearest coarse
  *    centroid, queries probe their `nprobe` nearest cells.
  *
  * All paths are pure built-in/native expressions — no UDFs anywhere.
  * The IVF model (nlist×dim doubles) lives on the driver like the
  * calibration model; every data pass stays distributed.
  */
object Ann {

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * a value in [-1, 1) derived from xxhash64 — reproducible across runs
    * and across both join sides without shipping a plane matrix.
    */
  private def planeComponent(p: Int, d: Int): Column =
    (pmod(xxhash64(lit(p * 100003 + d)), lit(2000000L)).cast("double")
      / 1000000.0) - 1.0

  /** per-plane signed margins (dot products with the hyperplanes) —
    * staged ONCE per row; both the bucket bits and the multi-probe flip
    * choice read this array.
    */
  private def planeDots(v: Column, planes: Int, dim: Int): Column =
    array((0 until planes).map { p =>
      (0 until dim).map(d =>
        // try_element_at: a vector shorter than `dim` (corrupt row at
        // 10^12 scale) contributes 0 for its missing components —
        // mirroring VecDot's shorter-length-wins contract — instead of
        // raising ANSI INVALID_ARRAY_INDEX and killing the job; for
        // full-length vectors the value is identical
        coalesce(try_element_at(v, lit(d + 1)), lit(0.0))
          * planeComponent(p, d)).reduce(_ + _)
    }: _*)

  /** sign-bit bucket id from a staged margin array */
  private def bucketFromDots(ds: Column, planes: Int): Column =
    (0 until planes).map { p =>
      when(element_at(ds, p + 1) >= 0, lit(1L << p)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))

  /** Sign-bit bucket id from `planes` hyperplanes over a double array.
    * dim must be the (fixed) embedding dimensionality.
    */
  def hyperplaneBucket(v: Column, planes: Int, dim: Int): Column =
    bucketFromDots(planeDots(v, planes, dim), planes)

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

  // --------------------------------------------------------------- IVF

  /** Per-row nearest centroid (max cosine) over BROADCAST centroid
    * literals: an argmax fold over nlist (score, cid) structs — no
    * crossJoin, no explode, no re-shuffle of vectors (the round-2 form
    * crossJoined every vector × nlist through a groupBy). |v| is constant
    * across candidates, so scores divide by the driver-precomputed
    * centroid norms only. Ties pick the larger cid (struct `greatest`) —
    * deterministic.
    */
  def nearestCentroid(v: Column, cents: Array[Array[Double]]): Column = {
    require(cents.length >= 2, "need at least 2 centroids")
    greatest(cents.zipWithIndex.map { case (cv, cid) =>
      val n = math.max(math.sqrt(cv.map(x => x * x).sum), 1e-12)
      struct((dot(v, typedLit(cv)) / n).as("s"), lit(cid).as("cid"))
    }: _*).getField("cid")
  }

  /** The query's `nprobe` best cells: ascending array_sort of literal
    * (-score, cid) structs (→ score desc, cid asc), first nprobe cids.
    * Pure per-row expression — replaces the round-2 crossJoin + window.
    */
  private def topCells(qv: Column, cents: Array[Array[Double]],
      nprobe: Int): Column =
    transform(
      slice(array_sort(array(cents.zipWithIndex.map { case (cv, cid) =>
        val n = math.max(math.sqrt(cv.map(x => x * x).sum), 1e-12)
        struct((-dot(qv, typedLit(cv)) / n).as("s"), lit(cid).as("cid"))
      }: _*)), 1, nprobe),
      s => s.getField("cid"))

  /** IVF coarse quantizer: `nlist` centroids, `iters` Lloyd rounds.
    * Returns the driver-side model (index = cell id).
    *
    * Scale design: the model is TINY (nlist×dim doubles) and the driver
    * holds it like the calibration model; every data pass is distributed:
    *  - seeding — the nlist corpus vectors with the smallest
    *    (xxhash64(vec_id), vec_id) rank via orderBy(...).limit(nlist),
    *    which Spark plans as TakeOrderedAndProject (per-partition top-k
    *    + driver merge; the round-2 no-partition window was a
    *    single-task global sort — gone). Deterministic across runs and
    *    partitionings.
    *  - assign — [[nearestCentroid]]: narrow per-row argmax, no shuffle;
    *  - update — one (cid, dim_idx) hash aggregate whose shuffle rows
    *    are independent of corpus vector bytes; the nlist×dim result is
    *    collected to refresh the model. Empty cells keep their centroid.
    * At the 10^12-vector regime, train on a hash-sampled slice
    * (`corpus.filter(pmod(xxhash64(id), K) === 0)`) — the interface and
    * model shape are unchanged.
    */
  def ivfCentroids(corpus: DataFrame, nlist: Int, iters: Int = 2,
      vecCol: String = "embedding",
      idCol: String = "vec_id"): Array[Array[Double]] = {
    val v = corpus.select(col(idCol).as("vec_id"),
      col(vecCol).cast("array<double>").as("v"))
    var cents: Array[Array[Double]] = v
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(nlist)
      .select(col("v")).collect()
      .map(_.getSeq[Double](0).toArray)
    (0 until iters).foreach { _ =>
      val sums = v
        .select(nearestCentroid(col("v"), cents).as("cid"),
          posexplode(col("v")).as(Seq("i", "x")))
        .groupBy("cid", "i").agg(avg(col("x")).as("x"))
        .collect()
      val next = cents.clone()
      sums.groupBy(_.getAs[Int]("cid")).foreach { case (cid, rows) =>
        val arr = next(cid).clone()
        rows.foreach(r => arr(r.getAs[Int]("i")) = r.getAs[Double]("x"))
        next(cid) = arr
      }
      cents = next
    }
    cents
  }

  /** IVF top-k: corpus vectors are inverted-listed by nearest centroid
    * (a narrow per-row expression — cells are disjoint, so no candidate
    * duplication); each query probes its `nprobe` nearest cells and
    * ranks EXACT cosine within the probed candidates. The candidate join
    * broadcasts the (queries × nprobe) probe rows against the cell-keyed
    * corpus — at 10^12 vectors only ~nprobe/nlist of the corpus is
    * touched per query and corpus vectors never shuffle.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      nlist: Int = 16, nprobe: Int = 4, iters: Int = 2,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame =
    ivfTopKWithCentroids(corpus, queries,
      ivfCentroids(corpus, nlist, iters, vecCol, idCol), k, nprobe,
      vecCol, idCol)

  /** The downstream of [[ivfTopK]] — inverted-list assignment, nprobe
    * cell probing, exact-cosine ranking — with a GIVEN centroid model.
    * Two callers: [[ivfTopK]] (Lloyd-trained model) and any caller with
    * a pre-trained / externally-supplied coarse quantizer (the common
    * production shape: train once on a sample, reuse the model across
    * many query batches). Splitting here also puts everything downstream
    * of the (hash-seeded, iteration-dependent) training under the DuckDB
    * value oracle: t13 feeds a closed-form centroid model through this
    * exact code path.
    */
  def ivfTopKWithCentroids(corpus: DataFrame, queries: DataFrame,
      cents: Array[Array[Double]], k: Int = 5, nprobe: Int = 4,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("cid", nearestCentroid(col("v"), cents))
      .withColumn("vnorm", sqrt(dot(col("v"), col("v"))))
    val qprobe = queries
      .select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
      .withColumn("cid", explode(topCells(col("qv"), cents, nprobe)))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("vec_id"))
    c.join(broadcast(qprobe), Seq("cid"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosinePrenormed(col("qv"), col("v"),
          col("qnorm"), col("vnorm")), 6).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  // --------------------------------------------------------------- LSH

  /** Approximate top-k: candidates = corpus vectors in any of the query's
    * `probes` probed buckets (its own + the smallest-|margin| single-bit
    * flips), equi-join on bucket id, exact cosine + top-k within
    * candidates. `dim` is the embedding dimensionality. Probed buckets
    * are distinct and corpus vectors live in exactly one bucket, so no
    * candidate is scored twice.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int = 5,
      planes: Int = 8, dim: Int = 64, probes: Int = 1,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    require(probes >= 1 && probes <= planes + 1,
      s"probes must be in [1, planes+1] (got $probes with $planes planes)")
    val masks = typedLit((0 until planes).map(p => 1L << p).toArray)
    val c = corpus.select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", hyperplaneBucket(col("v"), planes, dim))
      .withColumn("vnorm", sqrt(dot(col("v"), col("v"))))
    val q0 = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("__ds", planeDots(col("qv"), planes, dim))
      .withColumn("__base", bucketFromDots(col("__ds"), planes))
      .withColumn("qnorm", sqrt(dot(col("qv"), col("qv"))))
    // flip order: ascending |margin| — the planes the query sits closest
    // to are the likeliest sign flips of its near neighbors
    val flipOrder = array_sort(array((0 until planes).map(p =>
      struct(abs(element_at(col("__ds"), p + 1)).as("m"),
        lit(p).as("p"))): _*))
    val q = q0
      .withColumn("bucket", explode(concat(
        array(col("__base")),
        transform(slice(flipOrder, 1, probes - 1), s =>
          col("__base").bitwiseXOR(
            element_at(masks, s.getField("p") + 1))))))
      .select("query_id", "qv", "qnorm", "bucket")
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
