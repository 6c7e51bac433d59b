package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`embedding: array<float>[64]`).
  *
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness baseline.
  *     At scale this is query-batch x broadcast(candidate-partition), only
  *     viable for small query sets.
  *   - [[lshBuckets]] / [[lshTopK]]: random-hyperplane LSH — the scale path.
  *     Bucketing is a narrow map; search becomes an equi-join on bucket id,
  *     so candidate comparisons drop from O(Q*N) to O(Q*N/2^planes) with a
  *     plain shuffle join Spark already optimizes (AQE handles hot buckets).
  *
  * Hyperplane signs are a deterministic arithmetic pattern (not RNG — keeps
  * the DuckDB oracle twin exact): sign(plane j, dim n[1-based]) =
  * +1 if (n * (j + 3)) % 7 <= 3 else -1.
  */
object Similarity {

  val dims = 64
  val planes = 8

  /** Plane-j dot product via the native [[graft.spark.VecDot]] expression
    * (same sequential double-sum order as the DuckDB twin); the ±1 signs of
    * the `(n*(j+3)) % 7` family are materialized as a literal array.
    */
  private def planeDot(j: Int): Column = {
    val signs = (1 to dims).map(n => if ((n * (j + 3)) % 7 <= 3) 1d else -1d)
    graft.spark.VectorFunctions.vecDot(col("embedding"), typedlit(signs))
  }

  /** Assign every vector to its LSH bucket (bit j = plane-j dot > 0). */
  def lshBuckets(emb: DataFrame): DataFrame = {
    val bits = (0 until planes).map { j =>
      when(planeDot(j) > 0d, 1 << j).otherwise(0)
    }
    emb.select(col("vec_id"), col("embedding"),
      bits.reduce(_ + _).cast("int").as("bucket"))
  }

  /** Exact cosine top-k for a small query set (vec_id < nQueries). */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = q.join(broadcast(c), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Dedup.cosineExpr(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** IVF coarse quantizer: the first [[ivfCells]] vectors (by vec_id) are
    * the cell centroids — deterministic (no RNG/k-means, so the DuckDB twin
    * is exact); every vector is assigned to its max-cosine centroid
    * (rounded to 6 before ranking, centroid-id tiebreak).
    *
    * The centroid table is tiny, so the assignment is a PURE NARROW MAP:
    * the centroids are collected once (a 16-row driver fetch — the
    * "broadcast" of the inverted-file shape) and inlined as array literals;
    * each row scores all cells inside one codegen'd projection and takes
    * the argmax with `array_position(scores, array_max(scores))` (first
    * occurrence = lowest centroid id, the same tiebreak as the previous
    * `row_number` form). Zero Exchange before cell assignment — the
    * previous implementation shuffled the full corpus (16 scored rows per
    * vector) through a `row_number() over (partition by vec_id)` window,
    * which at 100 TB is a cluster-wide shuffle of 16x the corpus. Pinned by
    * a plan test (no Exchange, no Window).
    */
  val ivfCells = 16

  /** Test hook: number of [[collectCentroids]] driver fetches — pins the
    * "collect centroids ONCE per query" contract (each fetch is a Spark job
    * plus a scan; the earlier code ran one per assignment call, so
    * `ivfTopKProbe2` paid two and `annRecall` four).
    */
  private[graft] val centroidCollects = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Collect the [[ivfCells]] centroid vectors ONCE (a 16-row driver fetch —
    * the "broadcast" of the inverted-file shape). Callers composing several
    * IVF methods over the same corpus share one result.
    * float->double is exact, so the JVM-side cast equals SQL CAST(AS DOUBLE).
    */
  private[graft] def collectCentroids(emb: DataFrame): Array[(Long, Array[Double])] = {
    centroidCollects.incrementAndGet()
    emb.filter(col("vec_id") < ivfCells)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("ce"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
  }

  /** The shared map-side scoring machinery: per-cell cosine array + the
    * centroid-id lookup array, from an already-collected centroid table.
    * Same op order as Dedup.cosineExpr / the DuckDB twin:
    * round(dot / sqrt(na * nb), 6); nb folds sequentially like `aggregate`.
    */
  private def cellScores(cents: Array[(Long, Array[Double])]): (DataFrame => DataFrame, Column) = {
    import graft.spark.VectorFunctions.vecDot
    val scores = cents.map { case (_, ce) =>
      val nb = ce.foldLeft(0d)((acc, x) => acc + x * x)
      round(vecDot(col("embedding"), typedlit(ce.toSeq)) / sqrt(col("na") * lit(nb)), 6)
    }
    val withScores = (emb: DataFrame) =>
      emb.select(col("vec_id"), col("embedding"))
        .withColumn("na", vecDot(col("embedding"), col("embedding")))
        .withColumn("ccos_arr", array(scores.toIndexedSeq: _*))
    (withScores, typedlit(cents.map(_._1).toSeq))
  }

  def ivfAssign(emb: DataFrame): DataFrame = ivfAssignWith(emb, collectCentroids(emb))

  /** Cell assignment from pre-collected centroids: a PURE NARROW MAP — each
    * row scores all cells inside one codegen'd projection and takes the
    * argmax with `array_position(scores, array_max(scores))` (first
    * occurrence = lowest centroid id, the same tiebreak as a `row_number`
    * form). Zero Exchange before cell assignment (plan-pinned) — shuffling
    * the corpus through a 16-rows-per-vector window would be a cluster-wide
    * shuffle of 16x the corpus at 100 TB.
    */
  def ivfAssignWith(emb: DataFrame, cents: Array[(Long, Array[Double])]): DataFrame = {
    val (withScores, ids) = cellScores(cents)
    withScores(emb)
      .select(col("vec_id"), col("embedding"),
        element_at(ids,
          array_position(col("ccos_arr"), array_max(col("ccos_arr"))).cast("int"))
          .as("cell"))
  }

  /** [[ivfAssignWith]] plus the assigned cell's centroid cosine and the
    * per-row squared norm — the inputs [[Dedup.semanticDedup]] needs (its
    * keep-the-boundary-example rule compares centroid cosines, and the
    * in-cell pair cosine reuses `na`). Same zero-Exchange narrow-map shape:
    * the score array is computed once per row and both the argmax and its
    * value (`array_max` — entries are already rounded to 6) read it.
    */
  def ivfAssignScoredWith(emb: DataFrame, cents: Array[(Long, Array[Double])]): DataFrame = {
    val (withScores, ids) = cellScores(cents)
    withScores(emb).select(
      col("vec_id"), col("embedding"), col("na"),
      element_at(ids,
        array_position(col("ccos_arr"), array_max(col("ccos_arr"))).cast("int"))
        .as("cell"),
      array_max(col("ccos_arr")).as("centroid_cos"))
  }

  /** Top-2 cells per vector (nprobe=2 probing side), same map-side argmax
    * machinery as [[ivfAssignWith]]: the runner-up cell is the argmax of the
    * score array with the winner's slot nulled out (`array_max` skips
    * nulls; first-occurrence position preserves the lowest-centroid-id
    * tiebreak, i.e. the `row_number` ordering of the oracle). Still zero
    * Exchange.
    */
  def ivfAssignProbe2(emb: DataFrame): DataFrame =
    ivfAssignProbe2With(emb, collectCentroids(emb))

  def ivfAssignProbe2With(emb: DataFrame, cents: Array[(Long, Array[Double])]): DataFrame = {
    val (withScores, ids) = cellScores(cents)
    withScores(emb)
      .withColumn("i1",
        array_position(col("ccos_arr"), array_max(col("ccos_arr"))))
      .withColumn("arr2",
        expr("transform(ccos_arr, (x, i) -> IF(i + 1 = i1, CAST(NULL AS DOUBLE), x))"))
      .withColumn("i2", array_position(col("arr2"), array_max(col("arr2"))))
      .select(col("vec_id"), col("embedding"),
        element_at(ids, col("i1").cast("int")).as("cell1"),
        element_at(ids, col("i2").cast("int")).as("cell2"))
  }

  /** IVF top-k with nprobe=2: candidates keep their single home cell, each
    * query probes its TWO nearest cells (explode -> the same equi-join on
    * cell). A neighbor lives in exactly one cell, so no pair dedup is
    * needed. Strictly better recall than [[ivfTopK]] at 2x the candidate
    * fan-in — the standard IVF quality/cost dial.
    */
  def ivfTopKProbe2(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    // ONE centroid collect shared by the candidate and probing sides
    val cents = collectCentroids(emb)
    ivfTopKProbe2From(ivfAssignWith(emb, cents), ivfAssignProbe2With(emb, cents),
      nQueries, k)
  }

  /** Probe-2 ranking over prebuilt assignment tables — exposed so
    * [[annRecall]] can reuse ONE assigned candidates table across methods.
    */
  private def ivfTopKProbe2From(
      assigned: DataFrame, probes: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val c = assigned.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce"), col("cell"))
    val q = probes.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        explode(array(col("cell1"), col("cell2"))).as("cell"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Dedup.cosineExpr(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** IVF top-k: candidates restricted to the query's cell (nprobe=1). */
  def ivfTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame =
    ivfTopKFrom(ivfAssign(emb), nQueries, k)

  private def ivfTopKFrom(assigned: DataFrame, nQueries: Int, k: Int): DataFrame = {
    val q = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("cell"))
    val c = assigned.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      col("cell"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Dedup.cosineExpr(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cos"))
  }

  /** Recall@k of each ANN method against the exact brute-force top-k — the
    * measured form of the recall/cost dial the probing docs describe
    * (nprobe=2 probes 2x the candidates for strictly-no-worse recall).
    * Output: one row per (method, query) with n_hit of n_true exact
    * neighbors recovered. All inputs are the deterministic rankings above
    * (cos rounded to 6, neighbor-id tiebreak), so recall itself is
    * oracle-exact. Plan shape: the truth table is tiny (nQueries*k rows);
    * each method joins it once — broadcast-grade at any corpus size. The
    * IVF methods share ONE centroid collect and ONE assigned candidates
    * table (the earlier from-scratch composition collected the centroids
    * four times and re-scored the corpus per method).
    */
  /** Per-query recall of `ann`'s (query_id, neighbor_id) pairs against a
    * ground-truth top-k table — shared by [[annRecall]] and [[pqRecall]].
    */
  private def recallAgainst(truth: DataFrame)(
      method: String, ann: DataFrame): DataFrame =
    truth.join(
        ann.select(col("query_id"), col("neighbor_id"), lit(1).as("hit")),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).cast("long").as("n_true"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .select(lit(method).as("method"), col("query_id"), col("n_true"),
        col("n_hit"),
        round(col("n_hit").cast("double") / col("n_true").cast("double"), 4)
          .as("recall"))

  def annRecall(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val cents = collectCentroids(emb)
    val assigned = ivfAssignWith(emb, cents)
    val recallOf = recallAgainst(bruteForceTopK(emb, nQueries, k)
      .select(col("query_id"), col("neighbor_id"))) _
    recallOf("lsh", lshTopK(emb, nQueries, k))
      .unionByName(recallOf("ivf", ivfTopKFrom(assigned, nQueries, k)))
      .unionByName(recallOf("ivf_probe2", ivfTopKProbe2From(assigned,
        ivfAssignProbe2With(emb, cents), nQueries, k)))
  }

  /** Exact squared-L2 top-k — the ground truth for the metric PQ
    * approximates (ADC is an L2 estimator; ranking it against the COSINE
    * truth would conflate metric mismatch with quantization error). Same
    * broadcast cross-join + per-query window shape as
    * [[bruteForceTopK]]; the `(x2 - 2*dot) + c2` expansion mirrors
    * [[pqDistArr]] and the DuckDB twin op-for-op.
    */
  def exactL2TopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.spark.VectorFunctions.vecDot
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"))
    val scored = q.join(broadcast(c), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        ((vecDot(col("qe"), col("qe")) - lit(2.0) * vecDot(col("qe"), col("ce")))
          + vecDot(col("ce"), col("ce"))).as("l2"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("l2"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("l2"))
  }

  /** Recall@k of ADC over PQ codes against the exact-L2 truth — the
    * number a production corpus tracks when tuning subspace/code counts
    * (here the untrained first-K codebook on synthetic vectors distorts
    * heavily; the OPERATOR is the deliverable, the measured recall is its
    * honest output).
    */
  def pqRecall(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame =
    recallAgainst(exactL2TopK(emb, nQueries, k)
      .select(col("query_id"), col("neighbor_id")))(
      "pq_adc", pqTopK(emb, nQueries, k))

  /** Fixed-point scale for [[kmeansStep]]'s centroid accumulation: each
    * embedding dimension is quantized to `floor(x * 2^20)` (a BIGINT)
    * before summing. Integer sums are ORDER-INDEPENDENT, so the recomputed
    * centroids are bit-identical under any partitioning, task order, or
    * cluster size — float sums across rows are not (Spark's groupBy sums
    * in shuffle-arrival order). `floor` (not round) because float inputs
    * are dyadic rationals: `x * 2^20` can land exactly on .5, where
    * Spark's HALF_UP and DuckDB's C-style tie rounding diverge.
    */
  val kmeansScale = 1L << 20

  /** One Lloyd iteration of k-means over the embeddings: assign every
    * vector to its max-cosine centroid (the zero-Exchange narrow map from
    * [[ivfAssignWith]], centroids collected once), then recompute each
    * cell's centroid as the mean of its members — the step that turns the
    * deterministic first-K quantizer into TRAINED centroids (iterate:
    * collect the 16-row output, feed it back as the next step's centroid
    * table). Accumulation is fixed-point ([[kmeansScale]]) so the result
    * is reproducible to the bit across partitionings and cluster sizes —
    * at 10^12 rows a float-sum centroid differs run to run and N-vs-4N,
    * which would break both the DuckDB twin and the north rule's
    * two-cluster-size equality.
    *
    * Plan shape: narrow assignment map -> ONE groupBy(cell) with 64+1
    * map-side-combined aggregates (shuffle = O(cells) rows) -> a narrow
    * posexplode to long format. Output: `(cell, dim, n_vecs, mean)` —
    * mean = sum_q / (n * 2^20), exact integer inputs to one double
    * division, so no rounding is needed anywhere.
    */
  def kmeansStep(emb: DataFrame): DataFrame =
    kmeansStepWith(emb, collectCentroids(emb))

  /** [[kmeansStep]] from an explicit centroid table — the form the training
    * loop ([[trainCentroids]]) iterates: each round's recomputed centroids
    * feed the next round's assignment.
    */
  def kmeansStepWith(emb: DataFrame, cents: Array[(Long, Array[Double])]): DataFrame = {
    val assigned = ivfAssignWith(emb, cents)
    // ONE vec_sum_quant aggregate replaces the quantize-transform + 64
    // separate sum(element_at(q, i)) slots: identical element-wise BIGINT
    // sums (integer addition is order-independent — the fixed-point
    // reproducibility argument is unchanged), identical shuffle bytes
    // (one (cell, long[64]) partial row either way), but the fresh
    // 65-aggregate plan cost ~0.7 s of Catalyst planning/codegen PER
    // LLOYD ITERATION (measured; same-DF re-collect is 0.10 s)
    assigned.groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"),
        graft.spark.VectorFunctions.vecSumQuant(
          col("embedding"), dims, kmeansScale.toDouble).as("s"))
      .select(col("cell"), col("n_vecs"), posexplode(col("s")).as(Seq("d0", "s")))
      .select(col("cell"), (col("d0") + 1).cast("int").as("dim"),
        col("n_vecs").cast("long").as("n_vecs"),
        (col("s").cast("double") / (col("n_vecs").cast("double") * lit(kmeansScale.toDouble)))
          .as("mean"))
  }

  /** Group-MEAN embedding pooling with the [[kmeansScale]] fixed-point
    * accumulation — "one embedding per conversation/document from its
    * member vectors", the standard turn→conversation (or chunk→document)
    * lift before group-level semantic dedup or retrieval. Integer sums
    * make the pooled vectors bit-reproducible under any partitioning
    * (the [[kmeansStep]] argument — a float mean is shuffle-order-
    * dependent); ONE partial-agg groupBy(key) whose shuffle carries
    * (key, 64 BIGINT partial sums, count) rows, never the member
    * vectors. Output: `(vec_id = key, n_vecs, embedding: array<double>)`
    * — shaped to feed [[Dedup.semanticDedup]] / [[ivfAssignWith]]
    * directly.
    */
  def pooledEmbeddings(emb: DataFrame, key: Column): DataFrame = {
    // same vec_sum_quant swap as [[kmeansStepWith]]; the per-element mean
    // keeps the exact op order of the 64-column form:
    // s_i.cast(double) / (n_vecs.cast(double) * scale)
    emb.select(key.cast("long").as("vec_id"), col("embedding"))
      .groupBy("vec_id")
      .agg(count(lit(1)).as("n_vecs"),
        graft.spark.VectorFunctions.vecSumQuant(
          col("embedding"), dims, kmeansScale.toDouble).as("s"))
      .select(col("vec_id"), col("n_vecs").cast("long").as("n_vecs"),
        array((1 to dims).map(i =>
          element_at(col("s"), i).cast("double")
            / (col("n_vecs").cast("double") * lit(kmeansScale.toDouble))): _*)
          .as("embedding"))
  }

  /** TRAINED k-means centroids: iterate the fixed-point Lloyd step `iters`
    * times from the deterministic first-K seed — the loop
    * [[kmeansStep]]'s scaladoc declares ("collect the 16-row output, feed
    * it back"). A cell that captures no member in a round KEEPS its
    * previous centroid (the standard empty-cell rule, and the one an SQL
    * twin can express as a left-join fallback). Each round is one
    * full-corpus narrow assignment map + one O(cells)-row shuffle + a
    * cells×dims driver fetch (1,024 doubles here — the same driver
    * footprint as [[collectCentroids]]), so the loop scales exactly as the
    * step does; the fixed-point accumulation makes every round — and thus
    * the trained table — bit-reproducible under any partitioning or
    * cluster size (the north rule's N-vs-4N equality).
    */
  def trainCentroids(emb: DataFrame, iters: Int): Array[(Long, Array[Double])] = {
    var cents = collectCentroids(emb)
    var it = 0
    while (it < iters) {
      val byCell = kmeansStepWith(emb, cents).collect()
        .groupBy(_.getAs[Long]("cell"))
        .map { case (c, rs) =>
          val arr = new Array[Double](dims)
          rs.foreach(r => arr(r.getAs[Int]("dim") - 1) = r.getAs[Double]("mean"))
          (c, arr)
        }
      cents = cents.map { case (id, old) => (id, byCell.getOrElse(id, old)) }
      it += 1
    }
    cents
  }

  /** The trained centroid table as a DataFrame `(cell, dim, mean)` — the
    * queryable artifact of [[trainCentroids]] (driver-built: cells×dims
    * rows, the size of one collected step output).
    */
  def kmeansTrain(emb: DataFrame, iters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    trainCentroids(emb, iters)
      .flatMap { case (cell, arr) =>
        arr.iterator.zipWithIndex.map { case (m, i) => (cell, i + 1, m) }
      }.toSeq.toDF("cell", "dim", "mean")
  }

  /** Product-quantization geometry: [[dims]]=64 split into 8 subspaces of
    * 8 dims, 16 codes per subspace — so a vector compresses to 8 nibbles
    * (one BIGINT), a 64x reduction over raw float32. At 100 TB of
    * embeddings this is THE storage/scan shape real ANN serving uses
    * (FAISS IVF+PQ): the codes table fits where the vectors cannot.
    */
  val pqSubspaces = 8
  val pqSubDim: Int = dims / pqSubspaces
  val pqCodes = 16

  /** Per-row distance array (16 entries, code order) for subspace `j`:
    * squared L2 between the row's subvector and each sub-centroid, via the
    * expansion ||x||^2 - 2 x.c + ||c||^2 with the native [[VecKernel]]
    * sequential dot — op order `(x2 - (2 * dot)) + c2` mirrored exactly in
    * the DuckDB twin, so argmins agree bit-for-bit. The codebook rides the
    * plan as literals (sub-slices of the SAME 16 collected vectors the IVF
    * quantizer uses — one driver fetch serves both).
    */
  private def pqDistArr(cents: Array[(Long, Array[Double])], j: Int): Column =
    graft.spark.VectorFunctions.pqSubDists(col("embedding"), j * pqSubDim,
      (0 until pqCodes).map(c =>
        cents(c)._2.slice(j * pqSubDim, (j + 1) * pqSubDim).toSeq))

  /** The interpreted expression twin of [[pqDistArr]] — kept for the parity
    * spec pinning the native [[graft.spark.PqKernel]] to the SQL form (the
    * expression tree carried 16 branches per subspace, twice per PQ query —
    * the dominant Catalyst planning/codegen cost of the PQ family).
    */
  private[graft] def pqDistArrHof(cents: Array[(Long, Array[Double])], j: Int): Column = {
    import graft.spark.VectorFunctions.vecDot
    val xs = pqSubvector(j)
    val x2 = vecDot(xs, xs)
    val ds = (0 until pqCodes).map { c =>
      val cs = cents(c)._2.slice(j * pqSubDim, (j + 1) * pqSubDim)
      val c2 = cs.foldLeft(0d)((acc, x) => acc + x * x)
      (x2 - lit(2.0) * vecDot(xs, typedlit(cs.toSeq))) + lit(c2)
    }
    array(ds: _*)
  }

  private def pqSubvector(j: Int): Column =
    slice(col("embedding"), j * pqSubDim + 1, pqSubDim)

  /** Test hooks for the PqSubDists parity spec. */
  private[graft] def collectCentroidsForTest(emb: DataFrame): Array[(Long, Array[Double])] =
    collectCentroids(emb)
  private[graft] def pqDistArrForTest(cents: Array[(Long, Array[Double])], j: Int): Column =
    pqDistArr(cents, j)
  private[graft] def pqDistArrHofForTest(cents: Array[(Long, Array[Double])], j: Int): Column =
    pqDistArrHof(cents, j)

  /** The 8 per-subspace codes of each row as `array<int>` — argmin with
    * first-occurrence (= lowest code) tiebreak, the [[ivfAssignWith]]
    * `array_position(array_min)` idiom.
    */
  private def pqCodesCol(cents: Array[(Long, Array[Double])]): Column = {
    require(cents.length >= pqCodes,
      s"PQ codebook needs $pqCodes centroid vectors, got ${cents.length}")
    val codes = (0 until pqSubspaces).map { j =>
      val darr = pqDistArr(cents, j)
      (array_position(darr, array_min(darr)) - 1).cast("int")
    }
    array(codes: _*)
  }

  /** PQ ENCODING as a zero-Exchange narrow map: each row computes its
    * 8x16 distance table against the plan-literal codebook (136 native
    * vecDot kernels per row, all inside one codegen'd projection) and
    * emits its code word. Carrying `codes` as array<int> feeds [[pqTopK]];
    * the query surface packs it ([[pqEncode]]).
    */
  def pqEncodeWith(emb: DataFrame,
      cents: Array[(Long, Array[Double])]): DataFrame =
    emb.select(col("vec_id"), pqCodesCol(cents).as("codes"))

  /** Query form of PQ encoding: the human-readable dashed code string plus
    * the packed nibble BIGINT (`code64` — the 8-byte-per-vector artifact a
    * 100 TB corpus actually persists).
    */
  def pqEncode(emb: DataFrame): DataFrame = {
    val packed = (0 until pqSubspaces).map { j =>
      element_at(col("codes"), j + 1).cast("long") * lit(1L << (4 * j))
    }.reduceLeft(_ + _)
    pqEncodeWith(emb, collectCentroids(emb))
      .select(col("vec_id"),
        array_join(transform(col("codes"), c => c.cast("string")), "-").as("code"),
        packed.as("code64"))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: queries keep their
    * full vector and precompute an 8x16 lookup table ONCE (on the tiny
    * broadcast side); every database vector then costs 8 array lookups +
    * 7 adds — no float dot against raw vectors anywhere, which is why PQ
    * scan throughput beats brute force by the compression factor at scale.
    * The left-assoc 8-term sum mirrors the twin's `list_sum` of the
    * j-ordered contribution list. Candidate generation composes with the
    * IVF cell equi-join ([[ivfTopK]]) at 10^12 vectors; here the full scan
    * IS the correctness harness (same shape as [[bruteForceTopK]]).
    */
  def pqTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 5): DataFrame = {
    import graft.spark.VectorFunctions.vecDot
    val cents = collectCentroids(emb)
    require(cents.length >= pqCodes,
      s"PQ codebook needs $pqCodes centroid vectors, got ${cents.length}")
    val enc = pqEncodeWith(emb, cents)
      .select(col("vec_id").as("neighbor_id"), col("codes"))
    val luts = (0 until pqSubspaces).map(j => pqDistArr(cents, j))
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), array(luts: _*).as("lut"))
    val adist = (0 until pqSubspaces).map { j =>
      element_at(element_at(col("lut"), j + 1), element_at(col("codes"), j + 1) + 1)
    }.reduceLeft(_ + _)
    val scored = enc.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), adist.as("adist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("adist"))
  }

  /** LSH-bucketed top-k: same ranking but candidates restricted to the
    * query's bucket (equi-join on bucket — the 100 TB shape).
    */
  def lshTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 3): DataFrame = {
    val b = lshBuckets(emb)
    val q = b.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
    val c = b.select(col("vec_id").as("neighbor_id"), col("embedding").as("ce"),
      col("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(Dedup.cosineExpr(col("qe"), col("ce")), 6).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("int").as("rank"),
        col("neighbor_id"), col("cos"))
  }
}
