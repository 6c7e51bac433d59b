package graft.spark

import graft.core.{Engines, Extractor}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The Spark-native extraction pipeline — the whole reference request
  * lifecycle (`/root/reference/ocr_rpc_client.go` + `ocr_rpc_worker.go` +
  * the preprocessor workers) as ONE fused typed stage:
  *
  *   scan -> salted repartition (replaces the RabbitMQ work queue, O16) ->
  *   mapPartitions(parse + chain + engine, O5-O15/O17) -> write (O18).
  *
  * Scale design notes (100 TB / 10^12 turns):
  *   - The per-turn path is a NARROW map: exactly one shuffle (the salted
  *     repartition), no joins, no aggregation. Throughput scales linearly
  *     with executors as long as partitions are balanced.
  *   - Skew: the reference has none ("one doc = one worker message"); at
  *     10^12 turns heavy-tailed payloads would stall partitions. Rows whose
  *     payload exceeds [[heavyThreshold]] get a PER-ROW salt (uniform
  *     spread), light rows salt by conv_id (locality for downstream
  *     conversation-level consumers).
  *   - Correlation-id matching (O17) is row identity through the map — no
  *     result join needed.
  */
object ExtractPipeline {

  /** Input projection of the transcript table (only the columns the kernel
    * needs — lets Parquet prune `role`/`ts`).
    */
  final case class TurnLite(conv_id: String, turn_idx: Int, text: String, tool: String)

  /** Output row + per-row micro-metrics (O22 analog). */
  final case class Extracted(
      conv_id: String,
      turn_idx: Int,
      text: String,
      status: String,
      engine: String,
      n_chars_in: Int,
      n_chars_out: Int
  )

  /** Payloads above this many chars are considered skew-heavy and get a
    * per-row salt (long-document salting per the north rule).
    */
  val heavyThreshold: Int = 1 << 20

  /** Distribution key for the salted repartition. Full-width hashes, NEVER
    * pre-modded: collapsing to [0, parts) before `repartition` feeds only
    * `parts` distinct values into Spark's murmur3-mod-parts partitioner —
    * balls-in-bins collisions then leave ~1/e of partitions empty and the
    * busiest with 3-4x the load, which caps scaling at ~25% efficiency the
    * moment the stage runs in a single wave (measured: 5M turns, local[32],
    * 75s pre-modded vs 13s full-width). Light rows key by conv_id (locality
    * for conversation-level consumers), heavy rows by (conv_id, turn_idx) —
    * per-row spread for the long-document tail.
    */
  def saltColumn(): org.apache.spark.sql.Column = {
    val payloadLen = length(coalesce(col("text"), lit(""))) +
      length(coalesce(col("tool"), lit("")))
    when(payloadLen > heavyThreshold, xxhash64(col("conv_id"), col("turn_idx")))
      .otherwise(xxhash64(col("conv_id")))
  }

  /** Run the extraction over a transcript-shaped DataFrame.
    *
    * `distribution`:
    *   - `"salted"` (default, the north-rule shape): one full salted
    *     repartition replaces the reference's work queue — every row
    *     shuffles once on [[saltColumn]].
    *   - `"heavy-only"`: the 100 TB-optimal variant — light rows are mapped
    *     IN PLACE on their scan splits (the scan already distributes; no
    *     reason to move 100 TB through a shuffle), only the skew-heavy tail
    *     (payload > [[heavyThreshold]]) is salted-repartitioned per row and
    *     unioned back. Costs a second pushed-down scan of the predicate
    *     instead of a full-corpus shuffle write+read. Output is identical
    *     (pinned by spec) — partitioning never changes per-turn results.
    */
  /** O14 with an actual SCHEDULING effect (the reference publishes each
    * message with a priority 0-9 onto an `x-max-priority` queue so
    * high-priority documents are decoded first — `ocr_rpc_client.go:74-85,
    * 294-340`): when `priorityOrdered` is true, rows are sorted within each
    * post-shuffle partition by descending doc_type priority before the
    * kernel runs, so high-priority work completes first inside every task.
    * NO extra shuffle — `sortWithinPartitions` sorts the existing
    * distribution in place (plan-tested: still exactly one Exchange).
    * Cross-job preemption (the other half of queue priority) maps to Spark
    * FAIR scheduler pools at submission time, not to the plan.
    */
  def extract(
      spark: SparkSession,
      transcripts: DataFrame,
      numPartitions: Int = 0,
      config: Engines.CoreConfig = Engines.CoreConfig(),
      distribution: String = "salted",
      priorityOrdered: Boolean = false
  ): Dataset[Extracted] = {
    import spark.implicits._
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = transcripts
      .select(col("conv_id"), col("turn_idx").cast("int").as("turn_idx"),
        col("text"), col("tool"))
    val payloadLen = length(coalesce(col("text"), lit(""))) +
      length(coalesce(col("tool"), lit("")))
    val prepared = distribution match {
      case "heavy-only" =>
        val light = base.filter(payloadLen <= heavyThreshold)
        val heavy = base.filter(payloadLen > heavyThreshold)
          .repartition(parts, xxhash64(col("conv_id"), col("turn_idx")))
        light.unionByName(heavy)
      case _ =>
        base.repartition(parts, saltColumn()) // O16: the only shuffle
    }
    val ordered =
      if (!priorityOrdered) prepared
      else {
        val prio = graft.functions.GraftFunctions.priorityFor(
          coalesce(get_json_object(col("tool"), "$.doc_type"), lit("")),
          config.prioMap)
        prepared.sortWithinPartitions(prio.desc)
      }
    ordered
      .as[TurnLite]
      .mapPartitions { rows =>
        // one fused iterator: deserialize once, run chain+engine, serialize
        // once (SURVEY.md §4 whole-stage note)
        rows.map { t =>
          val r = Extractor.extractTurn(t.conv_id, t.turn_idx, t.text, t.tool, config)
          Extracted(
            t.conv_id, t.turn_idx, r.text, r.status, r.engine,
            (if (t.text == null) 0 else t.text.length) + (if (t.tool == null) 0 else t.tool.length),
            if (r.text == null) 0 else r.text.length)
        }
      }
  }

  /** O14's CROSS-JOB half — the reference's `x-max-priority` queue also
    * reorders work ACROSS requests (`ocr_rpc_client.go:74-85,294-340`): a
    * later high-priority request's messages preempt queued low-priority
    * ones. The Spark analog is FAIR scheduler pools at SUBMISSION time:
    * every job a batch submits while inside [[withPriorityPool]] lands in
    * the pool named for its doc_type's priority class. The pool name ALONE
    * does nothing — the weighting only takes effect when the session runs
    * with `spark.scheduler.mode=FAIR` plus an allocation file giving prio-N
    * pools ascending weights (on-demand pools otherwise get default weight
    * 1, making all priorities equal shares). [[writeFairSchedulerXml]] +
    * [[fairSchedulerConf]] produce exactly that deployment configuration;
    * with them an egov (prio 9, weight 10) batch submitted mid-flight gets
    * ~5x the task share of queued standard (prio 1, weight 2) work — and
    * ~10x vs prio-0 (weight 1) — the queue semantics.
    * (In-task ordering — the other half — is `priorityOrdered` above.)
    * Pool assignment is a thread-local SparkContext property, which is why
    * this is an around-submission combinator rather than a plan node.
    */
  def poolFor(docType: String, config: Engines.CoreConfig = Engines.CoreConfig()): String =
    s"prio-${Extractor.priority(docType, config)}"

  /** Write the FAIR-scheduler allocation file that REALIZES the cross-job
    * priority semantics: one pool per reference priority class 0-9, weight
    * = priority + 1 (monotone, nonzero — a raw weight of 0 for prio-0
    * would starve it entirely, which the reference's queue does not do),
    * FIFO within a pool (matches in-queue arrival order). Returns the path
    * for `spark.scheduler.allocation.file`.
    */
  def writeFairSchedulerXml(path: String): String = {
    val pools = (0 to 9).map { p =>
      s"""  <pool name="prio-$p">
         |    <schedulingMode>FIFO</schedulingMode>
         |    <weight>${p + 1}</weight>
         |    <minShare>0</minShare>
         |  </pool>""".stripMargin
    }.mkString("\n")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path),
      s"<?xml version=\"1.0\"?>\n<allocations>\n$pools\n</allocations>\n")
    path
  }

  /** The session config activating [[writeFairSchedulerXml]]'s pools —
    * apply at SparkSession build time (scheduler mode is a context-level
    * setting; it cannot be flipped on a live session).
    */
  def fairSchedulerConf(allocationFile: String): Seq[(String, String)] = Seq(
    "spark.scheduler.mode" -> "FAIR",
    "spark.scheduler.allocation.file" -> allocationFile)

  def withPriorityPool[T](
      spark: SparkSession,
      docType: String,
      config: Engines.CoreConfig = Engines.CoreConfig()
  )(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.scheduler.pool")
    sc.setLocalProperty("spark.scheduler.pool", poolFor(docType, config))
    try body
    finally sc.setLocalProperty("spark.scheduler.pool", prev)
  }

  /** Extraction + stable-ordered write (the equality contract orders by
    * (conv_id, turn_idx); we sort within partitions for run-length locality
    * and deterministic files).
    */
  def run(
      spark: SparkSession,
      transcripts: DataFrame,
      outDir: String,
      numPartitions: Int = 0
  ): Unit =
    extract(spark, transcripts, numPartitions)
      .sortWithinPartitions("conv_id", "turn_idx")
      .write.mode("overwrite").parquet(outDir)

  /** Per-partition extraction metrics (O22: the Prometheus counters as a
    * metrics table): rows, errors, chars in/out per status+engine.
    */
  def metrics(extracted: Dataset[Extracted]): DataFrame =
    extracted
      .groupBy(col("status"), col("engine"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("n_chars_in")).cast("long").as("chars_in"),
        sum(col("n_chars_out")).cast("long").as("chars_out"))

  /** O22 histogram analog — the reference's latency and request-size
    * histograms (`prometheus_metrics.go:25-41`: duration buckets .01–10 s,
    * size buckets 100–50M) as cumulative bucket counts per (status, engine).
    *
    * The duration proxy is DETERMINISTIC — request chars /
    * [[histogramCharsPerSecond]] — so bucket counts are reproducible and
    * oracle-checkable (the reference observes wall time, which no
    * cross-engine oracle could verify; a production deployment would
    * `observe` wall time into the same bucket layout). Plan shape: ONE
    * shuffle (the groupBy with map-side partial agg); the unpivot explodes
    * over the handful of (status, engine) groups, not the corpus.
    */
  val durationBuckets: Seq[Double] = Seq(0.01, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)
  val sizeBuckets: Seq[Long] = Seq(100L, 1500L, 5000000L, 10000000L, 25000000L, 50000000L)
  val histogramCharsPerSecond = 100000.0

  def histograms(extracted: Dataset[Extracted]): DataFrame = {
    val dur = col("n_chars_in").cast("double") / lit(histogramCharsPerSecond)
    val durAggs = durationBuckets.zipWithIndex.map { case (v, i) =>
      sum(when(dur <= lit(v), 1L).otherwise(0L)).as(s"d$i")
    }
    val sizeAggs = sizeBuckets.zipWithIndex.map { case (v, i) =>
      sum(when(col("n_chars_in") <= lit(v), 1L).otherwise(0L)).as(s"s$i")
    }
    val aggs = durAggs ++ sizeAggs
    val g = extracted.groupBy(col("status"), col("engine"))
      .agg(count(lit(1)).as("total"), aggs: _*)
    val entries =
      durationBuckets.zipWithIndex.map { case (v, i) =>
        struct(lit("duration_seconds").as("metric"), lit(v.toString).as("le"),
          col(s"d$i").as("n"))
      } ++ Seq(struct(lit("duration_seconds").as("metric"), lit("+Inf").as("le"),
        col("total").as("n"))) ++
        sizeBuckets.zipWithIndex.map { case (v, i) =>
          struct(lit("request_size_bytes").as("metric"), lit(v.toString).as("le"),
            col(s"s$i").as("n"))
        } ++ Seq(struct(lit("request_size_bytes").as("metric"), lit("+Inf").as("le"),
        col("total").as("n")))
    g.select(col("status"), col("engine"), explode(array(entries: _*)).as("h"))
      .select(col("status"), col("engine"),
        col("h.metric").as("metric"), col("h.le").as("le"), col("h.n").as("n"))
  }
}
