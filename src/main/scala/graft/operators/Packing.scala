package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context packing for training pipelines: assign each document a position
  * inside fixed token-budget contexts ("packs") — the sample-packing step
  * between mixture sampling and tokenization. The packer is the standard
  * streaming prefix-sum form: within a shard, documents fill contexts in
  * doc_id order; a document starting at running-token-offset `c` lands in
  * pack `c div budget` at offset `c mod budget`.
  *
  * Scale shape: ONE shuffle (the window partition key). Packing is made
  * embarrassingly parallel BY CONSTRUCTION: the window partitions on
  * (stratum, shard) where shard = doc_id % [[packShards]] — contexts never
  * cross shards, so no global ordering exists anywhere and shard count
  * scales with the cluster (a global single-partition window would
  * serialize 100 TB through one task; per-language-only partitions skew to
  * the corpus's language mix). Everything is integer arithmetic in doc_id
  * order — deterministic, DuckDB-twin exact.
  */
object Packing {

  /** Token budget per packed context (a context-window size). */
  val packBudget = 512

  /** Shards per stratum — the packing parallelism knob. At 100 TB this
    * scales with the cluster (contexts are shard-local by design); 16 keeps
    * every shard non-trivially filled at test scale.
    */
  val packShards = 16

  /** Tokens per training chunk and the chunk stride for [[chunkDocuments]]
    * (overlap = [[chunkTokens]] - [[chunkStride]] = 32 tokens, the standard
    * sliding-window form so no token is ever more than one chunk boundary
    * away from chunkStride tokens of left context).
    */
  val chunkTokens = 128
  val chunkStride = 96

  /** Fixed-length CHUNKING with overlap — the other sequence-prep shape
    * ([[packContexts]] concatenates short docs into fixed contexts; this
    * SPLITS long docs into them): chunk i covers tokens
    * [i*stride, i*stride + chunkTokens); the last chunk starts at the last
    * offset still needed, so every token is covered and every doc emits at
    * least one chunk. Returns one row per chunk:
    * (doc_id, chunk_idx, start_token, n_chunk_tokens, chunk_fp) — the
    * chunk text rides as an md5 fingerprint (the payload write is the
    * caller's tokenizer's job; the fingerprint keeps results compact and
    * oracle-hashable).
    *
    * Scale shape: a PURE NARROW stage — the token array and the per-chunk
    * fingerprint array are each materialized once per row as columns (the
    * O(n²) HOF re-evaluation trap, see [[graft.operators.Dedup.windowFingerprints]]),
    * then one posexplode. No shuffle, no state; pushdown/pruning intact.
    */
  def chunkDocuments(doc: DataFrame): DataFrame = {
    val nChunks =
      when(col("n") <= chunkTokens, lit(1L))
        .otherwise(expr(s"(n - $chunkTokens + $chunkStride - 1) div $chunkStride") + lit(1L))
    doc
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n"), col("toks"))
      .withColumn("n_chunks", nChunks)
      .select(col("doc_id"), col("n"),
        posexplode(expr(
          s"""transform(sequence(0L, n_chunks - 1),
             |  i -> md5(concat_ws(' ', slice(toks, int(i * $chunkStride) + 1, $chunkTokens))))""".stripMargin)))
      .select(
        col("doc_id"),
        col("pos").cast("int").as("chunk_idx"),
        (col("pos") * chunkStride).cast("int").as("start_token"),
        least(lit(chunkTokens), col("n") - col("pos") * chunkStride).cast("int")
          .as("n_chunk_tokens"),
        col("col").as("chunk_fp"))
  }

  /** Pack assignment over the documents table, stratified by predicted
    * language (packs are language-homogeneous — the common curriculum
    * choice) and sharded by doc_id. Returns one row per document:
    * (doc_id, predicted, shard, n_tokens, pack_id, pack_offset).
    */
  def packContexts(doc: DataFrame): DataFrame = {
    val n = size(TextAnalysis.tokens(col("text"))).cast("long")
    val shard = pmod(col("doc_id"), lit(packShards.toLong)).cast("int")
    val w = Window.partitionBy(col("predicted"), col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    doc
      .select(col("doc_id"), TextAnalysis.langPredicted.as("predicted"),
        shard.as("shard"), n.as("n_tokens"))
      .withColumn("prev_cum", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .select(
        col("doc_id"), col("predicted"), col("shard"), col("n_tokens"),
        expr(s"prev_cum div $packBudget").cast("long").as("pack_id"),
        (col("prev_cum") % lit(packBudget.toLong)).cast("long").as("pack_offset"))
  }
}
