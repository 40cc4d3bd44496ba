package graft.plans

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Extract

/** Batch extraction job with Iceberg-shaped layout on Parquet (the sandbox
  * ships no Iceberg runtime jar — SURVEY.md §7): hash-bucketed directory
  * partitioning + a snapshot-style manifest table carrying per-bucket
  * lineage/metrics and completion, giving checkpoint/resume semantics.
  *
  * Scale design (north_rule):
  *  - ONE Exchange: repartition by salted conv_id hash bucket; ordering is
  *    re-established with sortWithinPartitions(conv_id, turn_idx) — never a
  *    global orderBy (per-turn equality needs deterministic per-key order,
  *    not a total sort; SURVEY T6).
  *  - Skew/salting: the bucket key is hash(conv_id, turn_idx/saltChunk) so a
  *    mega-conversation (10^8 turns) spreads across buckets in
  *    saltChunk-sized runs instead of serializing into one task; per-turn
  *    outputs never need re-merging so ordering inside each chunk suffices.
  *  - Resume: broadcast left_anti join of the input against completed
  *    manifest buckets — the graft analog of the reference's cache reuse
  *    (`pipeline.py:100-191`) but with durable exactly-once-per-bucket
  *    semantics: data is written with dynamic partition overwrite, so
  *    re-running a bucket that crashed mid-write replaces its directory
  *    instead of appending duplicates.
  *  - Lineage/metrics (north_star triplet): turns processed, blocks
  *    dropped, parser fallbacks — derived per bucket with one hash
  *    aggregate over the written rows and appended to the manifest.
  */
object ExtractionJob {

  /** @param bucketExpr overrides the salted-hash bucket key (e.g. a
    *   modulo key for an oracle-reproducible layout, or a date-derived
    *   key for time-partitioned reruns); must be deterministic in the
    *   input row — resume identity depends on the same row mapping to
    *   the same bucket across runs. Default: [[bucketCol]].
    * @param waveBuckets commit granularity: process at most this many
    *   buckets per write+manifest commit (a "wave"), so a mid-run kill
    *   loses only the current wave instead of the whole run — the
    *   plain-parquet analog of Iceberg's per-snapshot commits. Tradeoff
    *   documented on [[run]]: each wave re-scans the input (the bucket
    *   key is computed, not a storage partition), so choose a size that
    *   yields a handful of waves, not hundreds. None (default) = one
    *   wave, the single-commit behavior.
    */
  case class Config(
      outDir: String,
      numBuckets: Int = 32,
      saltChunk: Int = 4096,
      bucketExpr: Option[org.apache.spark.sql.Column] = None,
      waveBuckets: Option[Int] = None)

  /** salted bucket id: hash(conv_id, turn_idx / saltChunk) mod numBuckets */
  def bucketCol(numBuckets: Int, saltChunk: Int) =
    pmod(hash(col("conv_id"), floor(col("turn_idx") / saltChunk).cast("int")),
      lit(numBuckets))

  /** the bucket-id column for `cfg`, pinned to int. A custom expr gets a
    * per-row null fail-fast (`coalesce` + `raise_error`, zero cost on the
    * non-null branch): a NULL key would otherwise write rows under
    * `__HIVE_DEFAULT_PARTITION__`, NPE the driver-side id collects, and —
    * worst — be silently dropped by the resume complement filter on the
    * NEXT run (null fails `!isin(...)`). Failing the job at the first
    * null row, before any of that, is the only resume-safe semantics.
    * The default hash key is never null, so it skips the branch.
    */
  private def bucketKey(cfg: Config): org.apache.spark.sql.Column =
    cfg.bucketExpr match {
      case None => bucketCol(cfg.numBuckets, cfg.saltChunk)
      case Some(e) => coalesce(e.cast("int"),
        raise_error(lit("graft.ExtractionJob: custom bucketExpr produced" +
          " a NULL bucket id — bucket keys must be non-null and" +
          " deterministic per input row")).cast("int"))
    }

  def dataDir(cfg: Config): String = s"${cfg.outDir}/data"
  def manifestDir(cfg: Config): String = s"${cfg.outDir}/_manifest"

  /** completed bucket ids from prior runs (empty frame when no manifest) */
  def completedBuckets(spark: SparkSession, cfg: Config): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(manifestDir(cfg))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      // mergeSchema: manifests written before a metrics-column addition
      // (e.g. turns_truncated) coexist with new files in one dir; a
      // single-footer schema pick would randomly drop the new columns
      spark.read.option("mergeSchema", "true").parquet(manifestDir(cfg))
        .filter(col("status") === "complete")
        .select("bucket").distinct()
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.IntegerType))))
  }

  /** Run (or resume) the extraction job over `input` (transcript schema).
    * Returns the per-bucket manifest rows written by THIS run.
    *
    * `onlyBuckets` processes a subset — used by tests to simulate a killed
    * run (the manifest then records only those buckets as complete).
    *
    * With `cfg.waveBuckets = Some(w)` the todo bucket-id space is split
    * into waves of `w` and each wave is written + manifest-committed
    * independently: a SIGKILL mid-run loses at most one wave's work and
    * a re-submit resumes from the last committed wave (demonstrated at
    * stress scale in BASELINE.md). Cost model: the wave loop iterates
    * over the STATIC id range 0 until numBuckets (no extra pass over the
    * input to discover ids), but each wave's extraction re-scans the
    * input to filter its buckets out — K waves = K scans. At 100 TB pick
    * w ≈ numBuckets/4..8; a real Iceberg writer would get per-snapshot
    * commits without the re-scan.
    */
  def run(spark: SparkSession, input: DataFrame, cfg: Config,
      onlyBuckets: Option[Seq[Int]] = None): DataFrame = cfg.waveBuckets match {
    case Some(w) =>
      require(w > 0, s"waveBuckets must be positive, got $w")
      // candidate id space: the default hash key is 0 until numBuckets by
      // construction (no pass over the input needed); a CUSTOM bucketExpr
      // can emit ANY int (date-derived, offset), so its ids must be
      // discovered — a column-pruned distinct over the single computed
      // int column (partial-agg'd, driver-bounded by the bucket count).
      // Without this, out-of-range ids would silently match no wave and
      // the job would process nothing.
      val candidates = onlyBuckets.getOrElse {
        cfg.bucketExpr match {
          case None => (0 until cfg.numBuckets): Seq[Int]
          case Some(_) => input.select(bucketKey(cfg).as("bucket"))
            .distinct().collect().map(_.getInt(0)).toSeq
        }
      }.toSeq.sorted
      // zero candidates (empty input under a custom key, or an empty
      // onlyBuckets): run ONE empty wave so the output/manifest dirs
      // exist and the return is an empty manifest frame, same as the
      // non-wave path — not a PATH_NOT_FOUND on the read below
      if (candidates.isEmpty)
        return runWave(spark, input, cfg, Some(Seq.empty))
      // ids actually committed by this run's waves (≤ numBuckets — driver-safe)
      val written = scala.collection.mutable.ArrayBuffer.empty[Integer]
      candidates.grouped(w).foreach { wave =>
        val m = runWave(spark, input, cfg, Some(wave))
        written ++= m.select("bucket").collect().map(r => Integer.valueOf(r.getInt(0)))
      }
      // runWave always creates the manifest dir (even a zero-row append
      // writes _SUCCESS), so this read is safe after ≥1 wave
      val all = spark.read.option("mergeSchema", "true").parquet(manifestDir(cfg))
      if (written.isEmpty) all.filter(lit(false))
      else all.filter(col("bucket").isin(written.toSeq: _*))
    case None => runWave(spark, input, cfg, onlyBuckets)
  }

  private def runWave(spark: SparkSession, input: DataFrame, cfg: Config,
      onlyBuckets: Option[Seq[Int]]): DataFrame = {
    val t0 = System.currentTimeMillis()
    val bExpr = bucketKey(cfg)

    // bucketKey pins the schema to int and fail-fasts null custom keys
    val bucketed = input.withColumn("bucket", bExpr)

    // EAGER snapshot of completed bucket ids (≤ numBuckets): a lazy
    // manifest read here is re-evaluated after this run's own writes
    // refresh the path cache, which silently empties every downstream
    // frame derived from it
    val doneIds: Seq[Integer] = completedBuckets(spark, cfg)
      .collect().map(r => Integer.valueOf(r.getInt(0))).toSeq
    val todo0 =
      if (doneIds.isEmpty) bucketed
      else bucketed.filter(!col("bucket").isin(doneIds: _*))
    val todo = onlyBuckets match {
      case Some(bs) => todo0.filter(col("bucket").isin(bs.map(Integer.valueOf): _*))
      case None => todo0
    }

    // bucket is computed ONCE on the input and passed THROUGH the
    // extraction (review fix: the earlier drop-and-recompute evaluated
    // bucketExpr a second time on Extract's OUTPUT, where any key not a
    // pure function of (conv_id, turn_idx) either fails analysis — the
    // output lacks role/tool/ts — or silently disagrees with the resume
    // filter's pre-Extract value, breaking exactly-once on resume)
    val extracted = Extract(todo, Seq("bucket"))
      .repartition(cfg.numBuckets, col("bucket"))
      // bucket LEADS the sort key: the dynamic-partition file writer
      // requires rows ordered by the partition columns and would insert
      // its OWN whole-partition sort (by bucket alone) when the child
      // ordering doesn't satisfy it — a second full sort of every
      // partition, and per-(conv) row order would then hang on that
      // sort's stability. Sorting (bucket, conv_id, turn_idx) here
      // satisfies the writer's requirement prefix-wise (ONE sort total)
      // and keeps the T6 contract: within every bucket file, rows are
      // in (conv_id, turn_idx) order.
      .sortWithinPartitions("bucket", "conv_id", "turn_idx")

    // exactly-once per bucket: dynamic partition overwrite replaces a
    // bucket dir on re-run instead of appending duplicates
    extracted.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(dataDir(cfg))

    // lineage/metrics per bucket, from the rows just durably WRITTEN: a
    // partition-pruned + column-pruned (five small metric columns, never
    // the text) read of the output table. This replaced a
    // persist(MEMORY_AND_DISK) of the full extracted frame (round-5
    // measurement at (1,4) and (2,8) cores: the compressed-columnar
    // cache build sat on the hot path and cost more than this re-read —
    // which touches ~1 % of the written bytes — at every width), and it
    // is the honest lineage source: the manifest describes the durable
    // bytes, not a cached twin of them. An Iceberg writer would emit
    // these stats in commit metadata for free.
    //
    // This run's buckets = everything in the table EXCEPT prior-complete
    // ids (complement, not `0 until numBuckets`: a custom bucketExpr may
    // use keys outside that range, e.g. date-derived — the prune must
    // not assume the id space). A crashed run's partial bucket is never
    // in doneIds, so its rows — just re-written by THIS run's dynamic
    // overwrite — correctly enter this manifest.
    val notDone =
      if (doneIds.isEmpty) lit(true)
      else !col("bucket").isin(doneIds: _*)
    val thisRun = onlyBuckets match {
      case Some(bs) => notDone && col("bucket").isin(bs.map(Integer.valueOf): _*)
      case None => notDone
    }
    // explicit schema: an all-buckets-done resume or an empty input
    // leaves nothing to infer from, and the read must still plan
    val manifest = spark.read.schema(extracted.schema).parquet(dataDir(cfg))
      .filter(thisRun)
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("turns_processed"),
        sum(col("blocks_total") - col("blocks_kept")).as("blocks_dropped"),
        sum(when(col("status") === "fallback", 1).otherwise(0))
          .as("parser_fallbacks"),
        sum(when(col("status") === "blank", 1).otherwise(0)).as("blank_turns"),
        // truncation lineage: turns whose payload hit a tokenizer cap
        // (content dropped — reference warnings trail, pipeline.py:2799)
        sum(when(col("truncated"), 1).otherwise(0)).as("turns_truncated"))
      .withColumn("status", lit("complete"))
      .withColumn("wall_ms", lit(System.currentTimeMillis() - t0))

    // this run's bucket ids (≤ numBuckets — driver-safe), collected
    // BEFORE the manifest write refreshes the path cache
    val bucketIds = manifest.select("bucket").collect()
      .map(r => Integer.valueOf(r.getInt(0))).toSeq
    manifest.write.mode(SaveMode.Append).parquet(manifestDir(cfg))
    val all = spark.read.option("mergeSchema", "true").parquet(manifestDir(cfg))
    if (bucketIds.isEmpty) all.filter(lit(false))
    else all.filter(col("bucket").isin(bucketIds: _*))
  }

  /** the final output table (all completed buckets), stable per-key order */
  def output(spark: SparkSession, cfg: Config): DataFrame =
    spark.read.parquet(dataDir(cfg))
}
