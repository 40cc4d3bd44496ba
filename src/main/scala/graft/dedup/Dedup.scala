package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expr}

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (content-hash groupBy), MinHash+LSH near-dup, SimHash near-dup,
  * n-gram Jaccard verification, and embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *  - signatures (minhash / simhash) are pure per-row expressions — narrow,
  *    codegen'd, no shuffle;
  *  - candidate generation shuffles ONLY on small keys (band hash / simhash
  *    chunk), never on full text;
  *  - verification joins carry just (id, tokens) for candidate pairs —
  *    a tiny fraction of the corpus after banding;
  *  - exact dedup groups on a 256-bit content hash, not the text itself,
  *    so shuffle rows are ~40 bytes regardless of document size.
  */
object Dedup {

  // ------------------------------------------------------------- exact

  /** One row per distinct content hash: keeper (min doc_id) + group size.
    * Shuffles (hash, doc_id) pairs only — text never crosses the wire.
    */
  def exactDedup(docs: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(sha2(col(textCol), 256).as("text_hash"), col(idCol))
      .groupBy("text_hash")
      .agg(min(idCol).as("keeper_id"), count(lit(1)).as("dup_count"))

  // ------------------------------------------------------------- shingles

  /** w-token shingles of the whitespace-tokenized text, as a distinct array. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = split(trim(text), "\\s+")
    val n = size(toks)
    when(n < w, array(array_join(toks, " ")))
      .otherwise(array_distinct(
        transform(sequence(lit(1), n - (w - 1)),
          i => array_join(slice(toks, i, lit(w)), " "))))
  }

  // ------------------------------------------------------------- minhash

  /** 31-bit Mersenne prime modulus for the universal hash family: keeps
    * every intermediate product < 2^62, so the arithmetic is exact under
    * ANSI mode (no long overflow) while staying pure codegen expressions.
    */
  private val P31 = 2147483647L // 2^31 - 1

  /** deterministic universal-hash parameters (a_i, b_i) in [1, P31) */
  private def hashParams(i: Int): (Long, Long) = (
    1L + java.lang.Long.remainderUnsigned(
      0x9E3779B97F4A7C15L * (i + 1), P31 - 1),
    java.lang.Long.remainderUnsigned(0xC2B2AE3D27D4EB4FL * (i + 1), P31))

  /** numHashes minhash values over a column of PRE-COMPUTED base hashes
    * (each in [0, P31)); family member i applies (a_i*h + b_i) mod P31.
    */
  def minhashSignature(baseHashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      val (a, b) = hashParams(i)
      array_min(transform(baseHashes, h =>
        pmod(h * lit(a) + lit(b), lit(P31))))
    }: _*)

  /** doc_id + minhash signature per document. The shingle array and the
    * base hashes are STAGED as intermediate columns so each of the
    * numHashes permutation passes reads an attribute instead of
    * re-evaluating the shingle subtree — measured >10× per-row cost
    * difference (same staging discipline as the Extract operator).
    */
  def minhashed(docs: DataFrame, numHashes: Int = 32, shingleWidth: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("__sh", shingles(col(textCol), shingleWidth))
      .withColumn("__base", transform(col("__sh"), s => pmod(xxhash64(s), lit(P31))))
      .select(col(idCol).as("doc_id"),
        minhashSignature(col("__base"), numHashes).as("sig"))

  /** LSH banding: (band_idx, band_hash, doc_id) rows. bands×rowsPerBand
    * must equal the signature length. Banded keys are what gets shuffled —
    * ~24 bytes/row — so candidate generation at 100 TB moves ≪1% of the
    * corpus bytes.
    */
  def lshBands(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band_idx"),
        xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand))
          .as("band_hash"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("b"))
      .select(col("doc_id"), col("b.band_idx"), col("b.band_hash"))
  }

  /** Candidate near-dup pairs (a<b) from any shared LSH band. The
    * self-join is on (band_idx, band_hash) — an equi-join whose build side
    * is tiny after banding; dropDuplicates collapses multi-band hits.
    */
  def candidatePairs(bands: DataFrame): DataFrame =
    bands.as("l").join(bands.as("r"),
        col("l.band_idx") === col("r.band_idx") &&
          col("l.band_hash") === col("r.band_hash") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")

  /** Exact n-gram Jaccard verification of candidate pairs: join the
    * (distinct) shingle arrays back in — only for candidates — and compute
    * |∩|/|∪| per pair with array intersection, no extra shuffle beyond the
    * two id-joins.
    */
  def jaccardVerify(pairs: DataFrame, docs: DataFrame, w: Int = 3,
      threshold: Double = 0.7, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      shingles(col(textCol), w).as("sh"))
    val inter = size(array_intersect(col("la.sh"), col("rb.sh")))
    val uni = size(array_union(col("la.sh"), col("rb.sh")))
    pairs
      .join(sh.as("la"), col("a_id") === col("la.doc_id"))
      .join(sh.as("rb"), col("b_id") === col("rb.doc_id"))
      .select(col("a_id"), col("b_id"),
        round(inter.cast("double") / uni, 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** End-to-end MinHash+LSH near-dup detection: signature → bands →
    * candidates → exact-Jaccard verify.
    */
  def minhashDedup(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
      shingleWidth: Int = 3, threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = minhashed(docs, numHashes, shingleWidth)
    // the band self-join references the signature pipeline twice; persist
    // so signatures are computed once (at cluster scale: checkpoint to a
    // signature table instead)
    val banded = lshBands(sigs, bands, numHashes / bands)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = candidatePairs(banded)
    jaccardVerify(cand, docs, shingleWidth, threshold)
  }

  // ------------------------------------------------------------- simhash

  /** 64-bit SimHash over whitespace tokens: per-bit vote of each token's
    * xxhash64 bits, assembled into one long. Pure per-row expression
    * (64 × n_tokens bit tests inside codegen — no shuffle, no UDF).
    */
  def simhash(text: Column): Column =
    simhashFromHashes(tokenHashes(text))

  /** per-token xxhash64 array — stage this as its own column before
    * calling [[simhashFromHashes]] so the 64 bit-vote passes read an
    * attribute instead of re-tokenizing (same staging discipline as
    * [[minhashed]]).
    */
  def tokenHashes(text: Column): Column =
    transform(split(trim(text), "\\s+"), t => xxhash64(t))

  /** 64 bit-vote aggregates over a pre-computed hash array (Scala-side
    * loop so each shift amount is a literal — every vote is one
    * codegen'd array pass).
    */
  def simhashFromHashes(hs: Column): Column =
    (0 until 64).map { b =>
      val vote = aggregate(hs, lit(0),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1)
          .otherwise(-1))
      when(vote > 0, lit(1L << b)).otherwise(0L)
    }.reduce((a, c) => a.bitwiseOR(c))

  /** SimHash near-dup pairs: band the 64-bit hash into four 16-bit chunks
    * (any equal chunk ⇒ candidate, guaranteeing recall for hamming ≤ 3),
    * then verify hamming distance via bit_count(xor).
    */
  def simhashDedup(docs: DataFrame, maxHamming: Int = 3,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sigs = docs
      .withColumn("__hs", tokenHashes(col(textCol)))
      .select(col(idCol).as("doc_id"),
        simhashFromHashes(col("__hs")).as("sh"))
    val chunkCols = (0 until 4).map(c =>
      struct(lit(c).as("chunk_idx"),
        shiftright(col("sh"), c * 16).bitwiseAND(0xFFFFL).as("chunk")))
    val chunked = sigs
      .select(col("doc_id"), col("sh"), explode(array(chunkCols: _*)).as("c"))
      .select(col("doc_id"), col("sh"), col("c.chunk_idx"), col("c.chunk"))
    chunked.as("l").join(chunked.as("r"),
        col("l.chunk_idx") === col("r.chunk_idx") &&
          col("l.chunk") === col("r.chunk") &&
          col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"),
        bit_count(col("l.sh").bitwiseXOR(col("r.sh"))).as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------- embeddings

  /** dot product of two double-array columns — the native [[VecDot]]
    * expression (allocation-free primitive loop; the declarative
    * zip_with+aggregate form allocates a temp array per evaluation,
    * which dominates all-pairs similarity joins).
    */
  def dot(x: Column, y: Column): Column =
    column(graft.expressions.VecDot(expr(x), expr(y)))

  /** Cosine similarity between two double-array columns. Prefer
    * [[cosinePrenormed]] inside joins — norms belong OUTSIDE the pair
    * join (computed once per vector, not once per pair; measured 3× on
    * the all-pairs query).
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** cosine given pre-computed norms. */
  def cosinePrenormed(a: Column, b: Column, normA: Column,
      normB: Column): Column =
    dot(a, b) / (normA * normB)

  /** Embedding-cosine near-dup pairs (a<b) with cosine ≥ threshold.
    * At test scale this is the exact all-pairs form (one shuffle of the
    * compact (id, vector) projection); at 100 TB swap the self-join for
    * [[graft.similarity.Ann.lshTopK]]'s hyperplane-bucketed candidates —
    * same verify expression.
    */
  def embeddingNearDup(embs: DataFrame, threshold: Double = 0.95,
      vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    val v = embs
      .select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot(col("v"), col("v"))))
    v.as("l").join(v.as("r"), col("l.vec_id") < col("r.vec_id"))
      .select(col("l.vec_id").as("a_id"), col("r.vec_id").as("b_id"),
        round(cosinePrenormed(col("l.v"), col("r.v"),
          col("l.norm"), col("r.norm")), 6).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
