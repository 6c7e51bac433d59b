package graft

import org.apache.spark.sql.{functions => F, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway optimization-round probe: time sub-steps of slow queries to
  * attribute fixed overhead (codegen/planning/jobs) vs data compute.
  * Not part of the driver contract; removed or kept as a diagnostic.
  */
object ProbeR07 {
  def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.TextAnalysis
    import graft.spark.Transcripts

    val doc = Transcripts.documents(spark, sfDir)
    t("warmup scan count")(doc.count())
    t("scan count again")(doc.count())

    args.headOption.getOrElse("classifier") match {
      case "classifier" =>
        t("trainClassifier cold")(TextAnalysis.trainClassifier(doc))
        t("trainClassifier warm")(TextAnalysis.trainClassifier(doc))
        val w = TextAnalysis.trainClassifier(doc)
        t("scoreTrained count cold")(TextAnalysis.classifierScoreTrained(doc, w).count())
        t("scoreTrained count warm")(TextAnalysis.classifierScoreTrained(doc, w).count())
        t("classifierTrain df cold")(TextAnalysis.classifierTrain(doc).orderBy("bucket").count())
        t("classifierTrain df warm")(TextAnalysis.classifierTrain(doc).orderBy("bucket").count())
      case "classifier2" =>
        val inList = Seq("slow", "crash", "deadlock").map(t => s"'$t'").mkString(", ")
        val blocked = size(expr(s"filter(split(text, ' '), t -> t IN ($inList))"))
        val keep = !col("source").isInCollection(Seq("src7", "src13")) && blocked === 0
        val bucket = pmod(conv(substring(md5(col("t")), 1, 4), 16, 10).cast("int"), lit(64)).cast("int")
        def run(label: String, pos: org.apache.spark.sql.Column): Unit = {
          val q = doc.select(pos.as("pos"), explode(split(col("text"), " ")).as("t"))
            .groupBy(bucket.as("bucket"))
            .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("n_pos"),
              sum(when(!col("pos"), 1L).otherwise(0L)).as("n_neg"))
          t(label + " cold")(q.collect())
          t(label + " warm")(q.collect())
        }
        run("lit true pos", lit(true))
        run("full blocklist pos", keep)
        // explode only, no groupBy
        val e = doc.select(keep.as("pos"), explode(split(col("text"), " ")).as("t"))
        t("explode+pos count cold")(e.count())
        t("explode+pos count warm")(e.count())
        val e2 = doc.select(lit(true).as("pos"), explode(split(col("text"), " ")).as("t"))
        t("explode+littrue count warm")(e2.count())
        t("explode+littrue count warm2")(e2.count())
      case "bpe" =>
        t("trainBpeMerges cold")(TextAnalysis.trainBpeMerges(doc))
        t("trainBpeMerges warm")(TextAnalysis.trainBpeMerges(doc))
        t("bpeApply count cold")(TextAnalysis.bpeApply(doc).count())
        t("bpeApply count warm")(TextAnalysis.bpeApply(doc).count())
      case "containment" =>
        import graft.operators.Dedup
        val d = doc.select(col("doc_id"), col("text"))
        t("containment cold")(Dedup.containmentPairs(d).count())
        t("containment warm")(Dedup.containmentPairs(d).count())
      case "epoch" =>
        import graft.operators.Dedup
        val base = doc.select(col("doc_id"), col("text"))
        val existing = base.filter(pmod(col("doc_id"), lit(3)) === 1)
        val epoch1 = base.filter(pmod(col("doc_id"), lit(3)) === 2)
        val epoch2 = base.filter(pmod(col("doc_id"), lit(3)) === 0)
        val art0 = t("corpusArtifacts (eager)")(Dedup.corpusArtifacts(existing))
        val art0b = t("corpusArtifacts again")(Dedup.corpusArtifacts(existing))
        val kept1 = Dedup.incrementalDedupWith(art0, epoch1)
        val art1 = t("updateArtifacts (eager)")(Dedup.updateArtifacts(art0, kept1))
        t("final ingest count")(Dedup.incrementalDedupWith(art1, epoch2).count())
        t("final ingest count warm")(Dedup.incrementalDedupWith(art1, epoch2).count())
      case "simhashpairs" =>
        import graft.operators.Dedup
        val d = doc.select(col("doc_id"), col("text"))
        t("simhashPairs cold")(Dedup.simhashPairs(d).count())
        t("simhashPairs warm")(Dedup.simhashPairs(d).count())
      case "kmeans" =>
        import graft.operators.Similarity
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        t("emb count")(emb.count())
        val step1 = t("kmeansStep build+collect cold")(Similarity.kmeansStep(emb).collect())
        t("kmeansStep build+collect again")(Similarity.kmeansStep(emb).collect())
        val df = Similarity.kmeansStep(emb)
        t("same-DF collect 1")(df.collect())
        t("same-DF collect 2")(df.collect())
        println(s"[probe] rows=${step1.length}")
      case "streamfloor" =>
        // cost floor of one AvailableNow parquet->parquet stream on tmpfs
        import org.apache.spark.sql.streaming.Trigger
        val base = graft.spark.TmpDirs.create("graft_floor_")
        doc.select(col("doc_id")).repartition(1)
          .write.mode("overwrite").parquet(s"$base/in")
        val schema = org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType)))
        def once(i: Int): Unit = t(s"noop stream $i") {
          val q = spark.readStream.schema(schema).parquet(s"$base/in")
            .writeStream.format("parquet")
            .option("path", s"$base/out$i")
            .option("checkpointLocation", s"$base/cp$i")
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        once(1); once(2); once(3)
      case other => println(s"unknown probe: $other")
    }
    spark.stop()
  }
}
