package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale corpus deduplication operators (training-data pipeline ops;
  * not present in the reference — required engine components per the build
  * brief). All are pure DataFrame plans: shuffles only on the natural keys,
  * map-side partial aggregation everywhere, no driver-side loops.
  */
object Dedup {

  /** Tokenize to non-empty lowercase word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"), t => length(t) > 0)

  /** n-token shingles of a text column (overlapping windows). */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      array_distinct(transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: one survivor per identical value of `keyCol` (the min of
    * `idCol`). Single hash-aggregate: partial min map-side, so the shuffle
    * carries one row per distinct key per partition — scales to 10^12 rows
    * as long as distinct keys fit the cluster, which is the same bound any
    * exact dedup has. Returns (keyCol, survivor_id, dup_count). */
  def exactDedup(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("dup_count"))

  /** Exact dedup by content hash — at scale, prefer hashing the (possibly
    * megabyte-sized) text down to 128 bits BEFORE the shuffle so the
    * exchange carries hashes, not documents. */
  def exactDedupByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(md5(to_binary(col(textCol), lit("utf-8"))).as("text_md5"), col(idCol))
      .groupBy(col("text_md5"))
      .agg(min(col(idCol)).as("survivor_id"), count(lit(1)).as("dup_count"))

  /** MinHash signature lanes over an ALREADY-MATERIALIZED shingle-array
    * column: signature i = min over shingles of xxhash64(i, shingle).
    * Callers must materialize the shingle column behind a plan barrier
    * (cache/checkpoint) first — Catalyst's CollapseProject would otherwise
    * inline the shingle subtree (regex splits!) into every one of the
    * `numHashes` lanes, multiplying the tokenization cost ×numHashes. */
  def minhashSignatureFromShingles(sh: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(lit(i), s)))
    }: _*)

  /** Convenience single-expression form (fine for one-off use; see the
    * CollapseProject warning above for hot paths). */
  def minhashSignature(text: Column, shingleLen: Int, numHashes: Int): Column =
    minhashSignatureFromShingles(shingles(text, shingleLen), numHashes)

  /** MinHash + LSH banding near-dup candidate pairs, verified by estimated
    * Jaccard (fraction of matching signature positions).
    *
    * Plan shape (the scale path for fuzzy dedup at 10^12 docs):
    *   1. narrow: signature per doc (no shuffle)
    *   2. explode to `bands` rows/doc, hash each band (shuffle key = band
    *      bucket — uniform by construction, no skew)
    *   3. self-join within buckets (docs sharing ≥1 band bucket)
    *   4. distinct pairs, then verify on signature agreement ≥ threshold
    *
    * Returns (id_a, id_b, est_jaccard) with id_a < id_b. */
  def minhashLshPairs(df: DataFrame, textCol: String, idCol: String,
                      shingleLen: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // two materialization barriers (at 10^12 scale: checkpointed tables):
    // 1. shingles — so the regex tokenization runs once, not ×numHashes
    //    (CollapseProject would inline it into every hash lane);
    // 2. signatures — reused by BOTH sides of the banded self-join.
    val sh = df.select(col(idCol).as("_id"),
      shingles(col(textCol), shingleLen).as("_sh")).cache()
    val sig = sh.select(col("_id"),
      minhashSignatureFromShingles(col("_sh"), numHashes).as("_sig"))
      .cache()
    val banded = sig.withColumn("_band",
        explode(transform(sequence(lit(0), lit(bands - 1)),
          b => struct(b.as("b"),
            xxhash64(b, concat_ws(",", transform(slice(col("_sig"), b * rowsPerBand + 1, lit(rowsPerBand)), x => x.cast("string")))).as("h")))))
      .select(col("_id"), col("_sig"), col("_band.b").as("_b"), col("_band.h").as("_h"))
    val l = banded.select(col("_id").as("id_a"), col("_sig").as("_sig_a"), col("_b"), col("_h"))
    val r = banded.select(col("_id").as("id_b"), col("_sig").as("_sig_b"), col("_b"), col("_h"))
    l.join(r, Seq("_b", "_h"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(filter(zip_with(col("_sig_a"), col("_sig_b"), (x, y) => x === y), b => b))
          .cast("double") / lit(numHashes)).as("est_jaccard"))
      .groupBy(col("id_a"), col("id_b")).agg(first(col("est_jaccard")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash: 64-bit locality-sensitive fingerprint — bit i of the result is
    * the sign of Σ_tokens (2·bit_i(hash(token)) − 1). Pure expressions, one
    * narrow pass. Near-dups = small Hamming distance. */
  def simhash(text: Column): Column =
    simhashFromHashes(transform(tokens(text), t => xxhash64(t)))

  /** SimHash from a materialized token-hash array column — same
    * CollapseProject caveat as minhashSignatureFromShingles: the 64 bit
    * lanes each reference the array; materialize it behind a barrier so
    * tokenization doesn't run ×64. */
  def simhashFromHashes(hashes: Column): Column = {
    val bits = (0 until 64).map { i =>
      val s = aggregate(hashes, lit(0L),
        (acc, h) => acc + shiftright(h, i).bitwiseAND(lit(1L)) * lit(2L) - lit(1L))
      when(s > 0, lit(1L << i)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by the 4 16-bit quarters (a pair within
    * Hamming distance 3 of 64 bits must agree on ≥1 quarter — pigeonhole),
    * then verify exact Hamming ≤ maxHamming. */
  def simhashPairs(df: DataFrame, textCol: String, idCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val th = df.select(col(idCol).as("_id"),
      transform(tokens(col(textCol)), t => xxhash64(t)).as("_th")).cache()
    val fp = th.select(col("_id"), simhashFromHashes(col("_th")).as("_fp")).cache()
    val quartered = fp.withColumn("_q", explode(array((0 until 4).map { q =>
      struct(lit(q).as("q"), shiftright(col("_fp"), q * 16).bitwiseAND(lit(0xffffL)).as("v"))
    }: _*)))
    val l = quartered.select(col("_id").as("id_a"), col("_fp").as("_fa"), col("_q"))
    val r = quartered.select(col("_id").as("id_b"), col("_fp").as("_fb"), col("_q"))
    l.join(r, Seq("_q"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming64(col("_fa"), col("_fb")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Exact n-gram Jaccard similarity for candidate pairs sharing at least
    * one shingle. Classic IR plan: (id, shingle) distinct → self-join on
    * shingle → |A∩B| per pair → join per-doc set sizes → J = ∩/(|A|+|B|−∩).
    * `maxShingleFreq` drops ubiquitous shingles before the self-join (the
    * standard stop-shingle guard: a shingle in f docs makes f² pairs). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        shingleLen: Int = 3, threshold: Double = 0.5,
                        maxShingleFreq: Long = 1000): DataFrame = {
    val ds = df.select(col(idCol).as("_id"),
        explode(shingles(col(textCol), shingleLen)).as("_sh"))
      .distinct()
      .cache() // reused 3×: sizes, frequency filter, self-join (both sides)
    val sizes = ds.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val filtered = ds.join(
      ds.groupBy(col("_sh")).agg(count(lit(1)).as("_f"))
        .where(col("_f") <= maxShingleFreq).select("_sh"),
      Seq("_sh"))
    val inter = filtered.select(col("_id").as("id_a"), col("_sh"))
      .join(filtered.select(col("_id").as("id_b"), col("_sh")), Seq("_sh"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("_inter"))
    inter
      .join(sizes.withColumnRenamed("_id", "id_a").withColumnRenamed("_n", "_na"), "id_a")
      .join(sizes.withColumnRenamed("_id", "id_b").withColumnRenamed("_n", "_nb"), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("_inter").cast("double") / (col("_na") + col("_nb") - col("_inter"))).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }
}
