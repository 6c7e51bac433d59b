package graft

import graft.core.Extractor
import graft.spark.{ExtractPipeline, Transcripts}
import org.apache.spark.sql.{functions => F, SparkSession}

/** Performance probe (not part of the driver contract) — isolates where the
  * extraction wall-clock goes so the bench configuration is evidence-based.
  *
  *   kernel <n>              — single-thread kernel loop over n synthetic turns
  *   spark <cores> <parts> <mpb> <amplify> [corpusDir]
  *                           — one timed scan->shuffle->extract->agg pass
  *   corpus <amplify> <dir>  — materialize the amplified corpus
  */
object Probe {

  private def syntheticTurn(i: Long): (String, Int, String, String) = {
    val cls = (i % 10).toInt
    val text = s"token$i alpha beta gamma delta epsilon zeta eta theta " * 4
    val (t, tool) = cls match {
      case c if c <= 3 =>
        (s"<html><body><nav>b</nav><div id='m'><p>$text</p></div></body></html>",
          """{"engine":"tesseract"}""")
      case 4 | 5 => (text, """{"engine":"mock"}""")
      case 6     => (text, "")
      case _ =>
        val pdf = graft.core.Pdf.synthesize(text)
        (text,
          s"""{"engine":"sandwich","img_base64":"${graft.core.Payload.encodeBase64(pdf)}","engine_args":{"ocr_type":"txt"}}""")
    }
    (s"conv-${i % 50}", (i / 50).toInt, t, tool)
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "kernel" =>
      val n = args(1).toInt
      val turns = (0L until n.toLong).map(syntheticTurn)
      // warmup
      turns.take(n / 10).foreach { case (c, ti, t, tool) => Extractor.extractTurn(c, ti, t, tool) }
      val t0 = System.nanoTime()
      var chars = 0L
      turns.foreach { case (c, ti, t, tool) =>
        chars += Extractor.extractTurn(c, ti, t, tool).text.length
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] kernel: $n turns in $sec%.2f s = ${n / sec}%.0f turns/sec/core (${sec / n * 1e6}%.1f us/turn), chars=$chars")

    case "kernelloop" =>
      // small distinct set looped `reps` times: distinguishes retained-set
      // effects (cache/GC) from cumulative-state effects
      val n = args(1).toInt
      val reps = args(2).toInt
      val turns = (0L until n.toLong).map(syntheticTurn).toArray
      turns.foreach { case (c, ti, t, tool) => Extractor.extractTurn(c, ti, t, tool) }
      val t0 = System.nanoTime()
      var acc = 0L
      var r = 0
      while (r < reps) {
        var i = 0
        while (i < n) {
          val (c, ti, t, tool) = turns(i)
          acc += Extractor.extractTurn(c, ti, t, tool).text.length
          i += 1
        }
        r += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] kernelloop: ${n.toLong * reps} extractions in $sec%.2f s = ${n.toLong * reps / sec}%.0f turns/sec ($acc)")

    case "kernelmt" =>
      // multithreaded kernel loop, no Spark: isolates raw CPU scaling.
      // args(1) may be a comma-separated thread-count list: all levels run
      // back-to-back inside THIS one JVM — the tightest same-window pairing
      // for ceiling ratios (two separate short spawns let a seconds-scale
      // burst hit one level only, which reads as a wild ceiling), and the
      // JIT is shared so neither level pays compilation in its timed loop.
      val levelList = args(1).split(",").map(_.toInt)
      val n = args(2).toInt
      // FIXED distinct working set across levels: if the input array size
      // tracks the per-thread count, the higher-thread level iterates a
      // smaller (cache-resident) array while the low level streams hundreds
      // of MB from DRAM — a built-in "super-linear scaling" bias (measured
      // ~+15%). Every level loops over the SAME ~20k-turn array.
      val distinctN = 20000
      val turns = (0L until distinctN.toLong).map(syntheticTurn).toArray
      def runLevel(threads: Int, perThread: Int): Double = {
        val t0 = System.nanoTime()
        val pool = (0 until threads).map { _ =>
          new Thread(() => {
            var i = 0
            var acc = 0L
            while (i < perThread) {
              val (c, ti, t, tool) = turns(i % distinctN)
              acc += Extractor.extractTurn(c, ti, t, tool).text.length
              i += 1
            }
            if (acc == -1) println("?")
          })
        }
        pool.foreach(_.start()); pool.foreach(_.join())
        (System.nanoTime() - t0) / 1e9
      }
      // FULL multithreaded warmup pass: a single-threaded JIT loop is not
      // enough — the first measured level otherwise runs 20-40% slow
      // (remaining C2 tiers/code-cache/TLAB ramp land on it; measured
      // t2 332k -> t8 1303k -> t2 398k in one JVM), which reads as a
      // spurious super-linear ceiling when the low level runs first
      runLevel(levelList.head, n / levelList.head)
      for (threads <- levelList) {
        val per = n / threads
        val sec = runLevel(threads, per)
        println(f"[probe] kernelmt threads=$threads: ${per * threads} turns in $sec%.2f s = ${per * threads / sec}%.0f turns/sec")
      }

    case "memmt" =>
      // DRAM-BANDWIDTH gauge (the pure-CPU kernelmt's companion): a
      // work-conserving streaming sum over a fixed multi-GiB working set,
      // run at each comma-separated thread count inside ONE pinned JVM so
      // the levels share the tightest possible weather window. The working
      // set is allocated once as maxThreads chunks (each far beyond LLC)
      // and every level streams the SAME total bytes, threads dividing the
      // chunks — so the N->4N throughput ratio measures how much ADDITIONAL
      // memory bandwidth the window lets 4N cores pull, which a pure-CPU
      // loop cannot see (r04: a DRAM-bandwidth co-tenant burst crushed the
      // Spark job ~2.5x harder than the CPU gauge in the same window).
      val levels = args(1).split(",").map(_.toInt)
      val totalMb = if (args.length > 2) args(2).toInt else 4096
      val maxT = levels.max
      val chunkLongs = (totalMb.toLong * 1024 * 1024 / 8 / maxT).toInt
      val chunks = Array.tabulate(maxT) { c =>
        val a = new Array[Long](chunkLongs)
        var i = 0
        while (i < chunkLongs) { a(i) = i + c; i += 1 } // pre-touch + fill
        a
      }
      val passes = 6
      for (t <- levels) {
        def run(np: Int): Double = {
          val t0 = System.nanoTime()
          val pool = (0 until t).map { ti =>
            new Thread(() => {
              var p = 0
              var acc = 0L
              while (p < np) {
                var c = ti
                while (c < maxT) {
                  val a = chunks(c)
                  var i = 0
                  while (i < a.length) { acc += a(i); i += 1 }
                  c += t
                }
                p += 1
              }
              if (acc == 42) println("?") // keep the sum live past the JIT
            })
          }
          pool.foreach(_.start()); pool.foreach(_.join())
          (System.nanoTime() - t0) / 1e9
        }
        run(1) // untimed warmup pass per level
        val sec = run(passes)
        val gib = totalMb.toDouble * passes / 1024
        println(f"[probe] memmt threads=$t: $gib%.1f GiB in $sec%.2f s = ${gib / sec}%.2f GB/s")
      }

    case "steal" =>
      val a = scala.io.Source.fromFile("/proc/stat").getLines().next().split("\\s+")
      println(a.mkString(" "))

    case "corpus" =>
      val amplify = args(1).toInt
      val dir = args(2)
      val files = if (args.length > 3) args(3).toInt else 256
      val spark = session(32, files, "128m")
      Transcripts.amplified(spark, "/root/testdata/sf0.1", amplify, parts = files)
        .write.mode("overwrite").parquet(dir)
      spark.stop()

    case "scan" =>
      // scan + agg only: the I/O/decode floor, no kernel, no shuffle
      val spark = session(args(1).toInt, args(2).toInt, args(3))
      val t0 = System.nanoTime()
      val row = spark.read.parquet(args(4))
        .agg(F.count(F.lit(1)).as("n"),
          F.sum(F.length(F.col("text")) + F.length(F.col("tool"))).as("chars")).collect()(0)
      println(f"[probe] scan: ${row.getLong(0)} rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()

    case "narrow" =>
      // scan -> kernel -> agg WITHOUT the salted repartition (no shuffle)
      import org.apache.spark.sql.Encoders
      val spark = session(args(1).toInt, args(2).toInt, args(3))
      implicit val enc = Encoders.product[ExtractPipeline.Extracted]
      implicit val encIn = Encoders.product[ExtractPipeline.TurnLite]
      val t0 = System.nanoTime()
      val row = spark.read.parquet(args(4))
        .select(F.col("conv_id"), F.col("turn_idx").cast("int").as("turn_idx"),
          F.col("text"), F.col("tool"))
        .as[ExtractPipeline.TurnLite]
        .mapPartitions { rows =>
          rows.map { t =>
            val r = Extractor.extractTurn(t.conv_id, t.turn_idx, t.text, t.tool)
            ExtractPipeline.Extracted(t.conv_id, t.turn_idx, r.text, r.status, r.engine, 0, 0)
          }
        }
        .agg(F.count(F.lit(1)).as("n"), F.sum(F.length(F.col("text"))).as("chars")).collect()(0)
      println(f"[probe] narrow: ${row.getLong(0)} rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.stop()

    case "spark" =>
      val cores = args(1).toInt
      val parts = args(2).toInt
      val mpb = args(3)
      val amplify = args(4).toInt
      val corpus = if (args.length > 5) Some(args(5)) else None
      val spark = session(cores, parts, mpb)
      spark.sparkContext.setLogLevel("WARN")
      // warmup
      ExtractPipeline.extract(spark, Transcripts.fromDocuments(spark, "/root/testdata/sf0.1"))
        .agg(F.count(F.lit(1))).collect()
      val input = corpus match {
        case Some(dir) => spark.read.parquet(dir)
        case None      => Transcripts.amplified(spark, "/root/testdata/sf0.1", amplify)
      }
      val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val row = ExtractPipeline.extract(spark, input, numPartitions = parts)
        .agg(F.count(F.lit(1)).as("n"), F.sum(F.length(F.col("text"))).as("chars")).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val cpuSec = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"[probe] spark cores=$cores parts=$parts mpb=$mpb: ${row.getLong(0)} turns in $sec%.2f s = ${row.getLong(0) / sec}%.0f turns/sec, cpu=$cpuSec%.1f s (${cpuSec * 1e6 / row.getLong(0)}%.1f us/turn)")
      spark.stop()
  }

  private def session(cores: Int, parts: Int, mpb: String): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.files.maxPartitionBytes", mpb)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
