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

  final case class TurnLite(conv_id: String, turn_idx: Int, role: String, text: String)
  final case class ConvState(turns: List[(Int, String, String)])
  final case class RenderedConv(conv_id: String, n_turns: Long, sample: String,
      trainable_chars: Long, total_chars: Long)

  /** STREAMING chat-template rendering with custom state — conversations
    * arrive turn by turn (the agent-pipeline reality: a conversation is
    * open until its last turn lands) and `flatMapGroupsWithState`
    * accumulates each conv's turns, re-emitting the conv's CURRENT
    * rendered sample every batch that touches it (Update mode; the
    * [[graft.operators.Events.sessionizeWithState]] custom-state path
    * applied to [[graft.spark.Transcripts.convRender]]'s semantics —
    * same template, same trainable accounting, spec-pinned equal to the
    * batch render). Per-conv state is the turn list — bounded by the
    * conv-cap curation upstream, the same bound the batch render's
    * collect_list relies on. Readers keep the LAST emission per conv
    * ([[runStreamingRender]] selects max batch_id), so any batch split
    * converges to the batch result.
    */
  def renderWithState(spark: SparkSession,
      stream: DataFrame): org.apache.spark.sql.Dataset[RenderedConv] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    stream
      .select(col("conv_id"), col("turn_idx"), col("role"), col("text"))
      .as[TurnLite]
      .groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, RenderedConv](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (cid: String, rows: Iterator[TurnLite], state: GroupState[ConvState]) =>
          val st = state.getOption.getOrElse(ConvState(Nil))
          val all = st.turns ++ rows.map(t => (t.turn_idx, t.role, t.text))
          state.update(ConvState(all))
          val rendered = all.sortBy(_._1)
            .map { case (_, r, tx) => (r, s"<|$r|>\n$tx\n") }
          val sample = rendered.map(_._2).mkString
          val trainable = rendered.collect {
            case ("assistant", rr) => rr.length.toLong
          }.sum
          Iterator(RenderedConv(cid, all.size.toLong, sample, trainable,
            sample.length.toLong))
      }
  }

  /** Driver runner for [[renderWithState]]: stages the raw turns as ONE
    * file, drains an AvailableNow stream through the stateful render,
    * writes each batch's emissions to a batchId-scoped directory
    * (idempotent under checkpoint replay), and returns the LAST emission
    * per conversation.
    */
  def runStreamingRender(spark: SparkSession, sfDir: String,
      maxFilesPerTrigger: Option[Int] = None,
      stagedIn: Option[String] = None): DataFrame = {
    val base = graft.spark.TmpDirs.create("graft_srender_")
    val out = s"$base/out"; val cp = s"$base/cp"
    val in = stagedIn.getOrElse {
      val p = s"$base/in"
      graft.spark.Transcripts.rawTurns(spark, sfDir)
        .coalesce(1).write.parquet(p)
      p
    }
    val schema = StructType(Seq(
      StructField("conv_id", StringType), StructField("turn_idx", IntegerType),
      StructField("role", StringType), StructField("text", StringType)))
    val reader = spark.readStream.schema(schema)
    val q = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n.toString))
      .parquet(in)
      .transform(s => renderWithState(spark, s).toDF())
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").parquet(s"$out/b$batchId")
        ()
      }
      .outputMode("update")
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy(col("batch_id").desc)
    spark.read.option("recursiveFileLookup", "true").parquet(out)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "batch_id")
  }
}
