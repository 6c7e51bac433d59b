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
