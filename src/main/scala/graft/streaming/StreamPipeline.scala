package graft.streaming

import graft.spark.ExtractPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-Streaming form of the extraction pipeline. The reference IS a
  * streaming system (unbounded RabbitMQ queue, prefetch flow control,
  * at-least-once ack — SURVEY.md §2.10); this is the same fused typed stage
  * dropped into `readStream -> mapPartitions -> writeStream` with
  * checkpointing standing in for the ack/requeue machinery. Per-record
  * processing is stateless, exactly like the reference; watermarked windowed
  * counts stand in for the Prometheus rate metrics (O22).
  */
object StreamPipeline {

  val transcriptSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))

  /** One-shot (Trigger.AvailableNow) streaming extraction over a parquet
    * directory: drains everything available, checkpoints, stops. Restarting
    * with the same checkpoint skips processed files — the streaming twin of
    * [[graft.spark.Lineage]].
    */
  def runAvailableNow(
      spark: SparkSession,
      inputDir: String,
      outDir: String,
      checkpointDir: String
  ): Unit = {
    val stream = spark.readStream.schema(transcriptSchema).parquet(inputDir)
    val extracted = ExtractPipeline.extract(spark, stream)
    val q = extracted.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** O20 postback as an ACTUAL side output
    * (`/root/reference/ocr_postback_client.go:27-78`, retry loop
    * `ocr_rpc_client.go:232-277`): each micro-batch's extraction results are
    * "posted back" through [[graft.core.Delivery.postbackOutcome]] and the
    * per-row attempt/outcome is recorded in a delivery table via
    * `foreachBatch`. The write is IDEMPOTENT under restart: each micro-batch
    * OVERWRITES its own batchId-scoped directory (`deliveryDir/b<batchId>`),
    * so a crash after the write but before the checkpoint commit makes the
    * retried batch rewrite — not duplicate — its rows (a plain `append`
    * would be at-least-once). Read the table back with
    * `recursiveFileLookup` (the subdirs are not k=v partition dirs).
    * Failure counts are simulated deterministically (turn_idx % 5) so the
    * delivery table is oracle-checkable; a real deployment would substitute
    * the HTTP POST and record the observed outcome in the same table.
    */
  def runPostbackSink(
      spark: SparkSession,
      inputDir: String,
      deliveryDir: String,
      checkpointDir: String
  ): Unit = {
    val stream = spark.readStream.schema(transcriptSchema).parquet(inputDir)
    val extracted = ExtractPipeline.extract(spark, stream)
    val q = extracted.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[ExtractPipeline.Extracted], batchId: Long) =>
          val s = batch.sparkSession
          import s.implicits._
          batch
            .map { e =>
              val failures = ((e.turn_idx % 5) + 5) % 5
              val (attempts, delivered, backoff) =
                graft.core.Delivery.postbackOutcome(failures)
              (e.conv_id, e.turn_idx, e.status, attempts, delivered, backoff,
                "X-open-ocr-reply-type: json")
            }
            .toDF("conv_id", "turn_idx", "status", "attempts", "delivered",
              "backoff_s", "reply_header")
            .write.mode("overwrite").parquet(s"$deliveryDir/b$batchId")
          ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Watermarked per-minute turn counts by role — the event-time metrics
    * window the reference lacks (its histograms are processing-time only,
    * `prometheus_metrics.go:25-32`).
    */
  def windowedCounts(transcriptStream: DataFrame): DataFrame =
    transcriptStream
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("role"))
      .agg(count(lit(1)).as("n_turns"))
}
