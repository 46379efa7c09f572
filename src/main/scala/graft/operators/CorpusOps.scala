package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level DataFrame operators for training-data curation, beyond
  * per-document columns (`TextAnalysis`) and near-dup pairing (`Dedup`):
  * benchmark decontamination and distinctive-term extraction.
  */
object CorpusOps {

  /** Benchmark decontamination: flag every train document sharing at least
    * one n-token shingle with the eval/benchmark set — the standard
    * train-test-overlap sweep a pretraining pipeline runs before training
    * (e.g. GPT-3 appendix C / PaLM-style 8-gram overlap; n is a knob here
    * because the synthetic fixture's documents are short).
    *
    * Returns one row per CONTAMINATED train doc: (idCol, n_shared) where
    * n_shared counts distinct shared shingles.
    *
    * Scale shape: the eval side is benchmark-sized (thousands of docs) —
    * its distinct shingle-hash set is dimension data, so the join is a
    * BROADCAST equi-join on a 60-bit shingle hash and the 100 TB train
    * side is never shuffled; the only exchange is the final per-doc
    * aggregation, bounded by contaminated (doc, shingle) pairs. Joining
    * on the 60-bit hash instead of the shingle string keeps the broadcast
    * small; a hash collision can only over-flag (conservative for
    * decontamination, where a false keep is the costly error). */
  def flagOverlap(train: DataFrame, eval: DataFrame, textCol: String,
                  idCol: String, n: Int): DataFrame = {
    def shingleHashes(df: DataFrame) = df
      .select(col(idCol), explode(Dedup.shingles(col(textCol), n)).as("_sh"))
      .select(col(idCol), Dedup.hash60(col("_sh")).as("_h"))
    val evalHashes = shingleHashes(eval).select(col("_h")).distinct()
    shingleHashes(train)
      .join(broadcast(evalHashes), "_h")
      .groupBy(col(idCol))
      .agg(countDistinct(col("_h")).as("n_shared"))
  }

  /** Distinctive-term extraction: the top-k terms per document ranked by
    * (term frequency desc, document frequency asc, term asc) — a tf-idf
    * ranking in EXACT integer arithmetic. For a fixed tf, idf is strictly
    * decreasing in df, so the (tf desc, df asc) order agrees with
    * tf·idf within each tf class; skipping the float log keeps the result
    * bit-reproducible across engines (the DuckDB oracle replays the exact
    * same integers).
    *
    * Returns (idCol, term, tf, df, rank). Scale shape: tf is one
    * map-side-combined aggregation on (doc, term); df is derived from tf.
    * The df side gets NO broadcast hint on purpose: on a real web corpus
    * the distinct-term count is unbounded (typos, URLs, hex blobs — 10^9+
    * rows at 100 TB), and a hard `broadcast()` overrides Spark's size
    * check and OOMs instead of degrading. Left unhinted, AQE reads the
    * finished tf/df shuffle stats at runtime and converts the join to
    * broadcast exactly when df is actually small — the safe version of
    * the same optimization (proven in CorpusOpsSpec's non-broadcast
    * path). */
  def topTerms(df: DataFrame, textCol: String, idCol: String,
               k: Int): DataFrame = {
    val tf = df
      .select(col(idCol), explode(Dedup.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(docFreq, "term")
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("rank"))
  }
}
