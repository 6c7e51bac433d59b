package graft

import graft.spark.{ExtractPipeline, Lineage, Transcripts}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** spark-submit entrypoint for the extraction job (north rule: "runs via
  * spark-submit on a multi-executor cluster"). Batch, resumable, metriced:
  *
  * {{{
  * spark-submit --class graft.Main <jar> \
  *   --input  /data/transcripts          \  (parquet dir, or table:NAME for a
  *                                           catalog table — Iceberg when the
  *                                           runtime is on the cluster)
  *   --output /data/extracted            \  (parquet dir; or
  *                                           table:DATA[,LINEAGE] to commit
  *                                           into catalog tables — Iceberg
  *                                           when the runtime is on the
  *                                           cluster; bucket is a real
  *                                           partition column either way)
  *   --buckets 256                       \  (lineage/commit granularity)
  *   --max-buckets 0                     \  (0 = all pending; >0 = partial run)
  *   --parallelism 0                     \  (0 = spark.sql.shuffle.partitions)
  *   --distribution salted               \  (or heavy-only: light rows are
  *                                           mapped in place on their scan
  *                                           splits and only the skew-heavy
  *                                           payload tail is repartitioned —
  *                                           the 100 TB-optimal variant; see
  *                                           ExtractPipeline.extract)
  * }}}
  *
  * Rerunning with the same --output resumes: completed buckets are skipped
  * (exactly-once via per-bucket idempotent overwrite — SURVEY.md §7.5). Each
  * run appends per-bucket rows to `<output>/_lineage` and writes the
  * aggregated per-status/engine metrics table to `<output>/_metrics`.
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect { case Array(k, v) if k.startsWith("--") =>
      k.stripPrefix("--") -> v
    }.toMap

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val input = opts.getOrElse("input", sys.error("--input required"))
    val output = opts.getOrElse("output", sys.error("--output required"))
    val buckets = opts.getOrElse("buckets", "256").toInt
    val maxBuckets = opts.getOrElse("max-buckets", "0").toInt
    val parallelism = opts.getOrElse("parallelism", "0").toInt
    val distribution = opts.getOrElse("distribution", "salted")
    require(Set("salted", "heavy-only")(distribution),
      s"--distribution must be salted or heavy-only (got $distribution)")

    val builder = SparkSession.builder().appName("graft-extract")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
    // local fallback so the job also runs outside spark-submit
    val spark =
      if (sys.env.contains("SPARK_GRAFT_LOCAL"))
        builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
          .config("spark.sql.shuffle.partitions",
            sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
          .getOrCreate()
      else builder.getOrCreate()

    graft.operators.Dedup.registerCapLogger(spark) // cap drops are never silent

    val transcripts =
      if (input.startsWith("table:")) spark.read.table(input.stripPrefix("table:"))
      else if (input.startsWith("derive:"))
        // synthesize deterministically from a testdata sf dir (sandbox mode)
        Transcripts.fromDocuments(spark, input.stripPrefix("derive:"))
      else spark.read.parquet(input)

    if (parallelism > 0)
      spark.conf.set("spark.sql.shuffle.partitions", parallelism.toString)

    val maxB = if (maxBuckets > 0) maxBuckets else Int.MaxValue
    // `--output table:DATA[,LINEAGE]` runs the same exactly-once protocol
    // against catalog tables (bucket = a real partition column; on an
    // Iceberg-equipped cluster the catalog makes these Iceberg tables).
    // Default (path) mode writes parquet dirs.
    val tables: Option[(String, String)] =
      if (!output.startsWith("table:")) None
      else output.stripPrefix("table:").split(",") match {
        case Array(data) => Some((data, s"${data}_lineage"))
        case Array(data, lineage, _*) => Some((data, lineage))
      }
    val (lineage, pending) = tables match {
      case Some((dataTable, lineageTable)) =>
        val l = Lineage.runTable(spark, transcripts, dataTable, lineageTable,
          buckets, maxB, distribution)
        val done = l.select("bucket").distinct().collect().map(_.getLong(0)).toSet
        (l, (0L until buckets.toLong).filterNot(done))
      case None =>
        val l = Lineage.run(spark, transcripts, output, buckets, maxB, distribution)
        (l, Lineage.pendingBuckets(spark, output, buckets))
    }
    if (pending.isEmpty) {
      // all buckets committed: publish the aggregated metrics table (O22)
      val out = tables match {
        case Some((dataTable, _)) => spark.table(dataTable)
        case None => Lineage.readOutput(spark, output)
      }
      val metrics = out.groupBy(col("status"), col("engine"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_chars_in")).cast("long").as("chars_in"),
          sum(col("n_chars_out")).cast("long").as("chars_out"))
      import spark.implicits._
      val histos = ExtractPipeline.histograms(
        out.select("conv_id", "turn_idx", "text", "status", "engine",
          "n_chars_in", "n_chars_out").as[ExtractPipeline.Extracted])
      tables match {
        case Some((dataTable, _)) =>
          metrics.write.mode("overwrite").format("parquet")
            .saveAsTable(s"${dataTable}_metrics")
          histos.write.mode("overwrite").format("parquet")
            .saveAsTable(s"${dataTable}_histograms")
        case None =>
          metrics.write.mode("overwrite").parquet(s"$output/_metrics")
          histos.write.mode("overwrite").parquet(s"$output/_histograms")
      }
    }
    val done = lineage.agg(
      count(lit(1)).as("buckets"),
      coalesce(sum(col("n_rows")), lit(0L)).as("rows")).collect()(0)
    // scalastyle:off println
    println(s"[graft] buckets committed: ${done.getLong(0)}/$buckets, " +
      s"rows: ${done.getLong(1)}, pending: ${pending.size}")
    // scalastyle:on println
    spark.stop()
  }
}
