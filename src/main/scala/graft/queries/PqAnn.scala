package graft.queries

import graft.{QE, Tables}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, FloatType}

/** Product quantization (PQ) — the third ANN family next to hyperplane LSH
  * (p07) and IVF cells (p22), and the one that actually makes 100 TB of
  * embeddings searchable in memory: each 64-dim vector is split into 8
  * subvectors of 8 dims, each subvector quantized to one of 16 per-subspace
  * centroids, so a vector becomes 8 small codes (4 bits each here) plus an
  * exact reconstruction error. Production IVF-PQ = p22's cell routing with
  * these codes as the in-cell representation; this module keeps the two
  * orthogonal pieces separately testable.
  *
  * Scale posture: codebooks are (8 x 16) rows — broadcast everywhere, like
  * IVF's centroid set. Encoding is one corpus scan (subvector explode ->
  * broadcast-join argmin -> regroup); no shuffle keyed on the corpus except
  * the per-vector regroup. ADC search (p28) never touches raw corpus
  * vectors: the query precomputes its 8x16 distance table (640 doubles for
  * 5 queries), the shortlist is a broadcast-join + sum over codes, and only
  * the top shortlist rows are reranked with the exact codegen cosine.
  *
  * Training mirrors IvfAnn: a deterministic 1-in-2 sample, 2 Lloyd passes
  * per subspace, exact-decimal elementwise means (bit-stable under any
  * partitioning), empty cells keep their previous centroid. Codebook
  * geometry is engine-specific -> rows-only driver check; determinism,
  * code-range, objective-improvement, and recall properties live in
  * PipelineSpec.
  */
object PqAnn {
  private val M = 8          // subspaces
  private val SubDim = 8     // dims per subspace (8 x 8 = 64)
  private val K = 16         // centroids per subspace (4-bit codes)
  private val TrainIters = 2
  private val TrainSampleEvery = 2
  private val NumQueries = 5
  private val Shortlist = 20 // ADC candidates kept for exact rerank
  private val TopK = 3
  private val IvfProbe = 4   // coarse cells probed per query in p29

  val entries: Seq[QE] = Seq(
    QE("p27_pq_encode", None, (s, d) => encode(s, d)),
    QE("p28_ann_pq", None, (s, d) => query(s, d)),
    QE("p29_ann_ivfpq", None, (s, d) => ivfPqQuery(s, d)))

  /** Squared L2 between two float vectors, as a deterministic left-to-right
    * fold (0.0-seeded; 0.0 + x is exact, so the fold order is the array
    * order on both engines).
    */
  private[queries] def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** (vec_id, m, sub): each vector exploded into its M subvectors. */
  private[queries] def subvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
      posexplode(array((0 until M).map(m =>
        slice(col("embedding"), m * SubDim + 1, SubDim)): _*)).as(Seq("m", "sub")))

  /** Deterministic seed codebook: subspace m's centroids are the first K
    * vectors' m-th subvectors.
    */
  private def seedCodebooks(e: DataFrame): DataFrame =
    subvectors(e.filter(col("vec_id") < K))
      .select(col("m"), col("vec_id").cast("int").as("cid"), col("sub").as("ce"))

  /** Per-(vector, subspace) nearest centroid: broadcast codebook join,
    * argmin by (distance, cid) — fully deterministic ties.
    */
  private[queries] def assign(subs: DataFrame, books: DataFrame): DataFrame =
    subs.join(broadcast(books), Seq("m"))
      .select(col("vec_id"), col("m"), col("sub"), col("cid"),
        l2sq(col("sub"), col("ce")).as("dist"))
      .groupBy("vec_id", "m")
      .agg(min_by(struct(col("cid"), col("dist"), col("sub")),
        struct(col("dist"), col("cid"))).as("best"))
      .select(col("vec_id"), col("m"), col("best.cid").as("cid"),
        col("best.dist").as("dist"), col("best.sub").as("sub"))

  /** Trained codebooks are a build-once artifact (fit offline, shipped
    * with the index — never re-fit per query); memoized per dataset dir
    * exactly like IvfAnn's coarse quantizer. Training is deterministic,
    * so the memo changes no result.
    */
  private val bookCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, Int, List[Float])]]

  private def trainedBooks(s: SparkSession, d: String): DataFrame = {
    val rows = bookCache.getOrElseUpdate(d,
      trainCodebooks(s, Tables.df(s, d, "embeddings")).collect().toSeq
        .map(r => (r.getAs[Int]("m"), r.getAs[Int]("cid"),
          r.getSeq[Float](r.fieldIndex("ce")).toList)))
    import s.implicits._
    rows.toDF("m", "cid", "ce")
  }

  /** Sampled per-subspace Lloyd fit (k-means proper: L2 assignment, plain
    * elementwise means in exact decimal).
    */
  def trainCodebooks(s: SparkSession, e: DataFrame,
      iters: Int = TrainIters): DataFrame = {
    val sample = subvectors(e.filter(pmod(col("vec_id"), lit(TrainSampleEvery)) === 0))
    var books = seedCodebooks(e)
    for (_ <- 1 to iters) {
      val assigned = assign(sample, books)
      val means = assigned
        .select(col("m"), col("cid"),
          posexplode(transform(col("sub"), x => x.cast("double"))).as(Seq("pos", "v")))
        .groupBy("m", "cid", "pos")
        .agg(avg(col("v").cast(DecimalType(27, 12))).as("mv"))
        .groupBy("m", "cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mv")))),
          x => x.getField("mv").cast(FloatType)).as("ce"))
      val kept = books.join(means, Seq("m", "cid"), "left_anti")
      books = means.select("m", "cid", "ce").unionByName(kept.select("m", "cid", "ce"))
        .localCheckpoint()
    }
    books
  }

  /** p27: every vector as its 8 codes + exact reconstruction error (the sum
    * of per-subspace quantization errors, folded in subspace order so the
    * double is bit-stable run to run). `codes` is emitted as the
    * comma-joined string "c0,c1,...,c7" rather than a raw array column —
    * the driver's rows-only checker sorts output columns and a numpy array
    * cell is unhashable/unsortable there (CORRECTNESS_r05 p27 err), while
    * the string is lossless for fixed M and deterministic.
    */
  def encode(s: SparkSession, d: String): DataFrame =
    encodeWith(s, Tables.df(s, d, "embeddings"), trainedBooks(s, d))

  def encode(s: SparkSession, e: DataFrame, trained: Boolean): DataFrame =
    encodeWith(s, e, if (trained) trainCodebooks(s, e) else seedCodebooks(e))

  private def encodeWith(s: SparkSession, e: DataFrame, books: DataFrame): DataFrame = {
    assign(subvectors(e), books)
      .groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("m"), col("cid"), col("dist")))).as("parts"))
      .select(col("vec_id"),
        concat_ws(",",
          transform(col("parts"), p => p.getField("cid").cast("string"))).as("codes"),
        aggregate(transform(col("parts"), p => p.getField("dist")),
          lit(0.0), (acc, v) => acc + v).as("recon_err"))
      .orderBy("vec_id")
  }

  /** p28: asymmetric-distance (ADC) search. The query side precomputes its
    * distance to every codebook centroid (M x K rows per query, broadcast);
    * each corpus vector's approximate distance is then just the sum of M
    * table lookups through its codes — the corpus embedding column is never
    * read again. The ADC shortlist is exact-reranked with the codegen
    * cosine.
    */
  def query(s: SparkSession, d: String): DataFrame =
    query(s, d, trained = true, (0L, NumQueries.toLong))

  def query(s: SparkSession, d: String, trained: Boolean,
      queryRange: (Long, Long)): DataFrame = {
    val e = Tables.df(s, d, "embeddings")
    val books = if (trained) trainedBooks(s, d) else seedCodebooks(e)
    val codes = assign(subvectors(e), books)
      .select(col("vec_id"), col("m"), col("cid"))
    val queries = e.filter(col("vec_id") >= queryRange._1 && col("vec_id") < queryRange._2)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    // per-query ADC table: distance from the query's m-th subvector to every
    // centroid of subspace m  (|queries| x M x K rows — broadcast-sized)
    val qtab = subvectors(queries.select(col("qid").as("vec_id"), col("qe").as("embedding")))
      .select(col("vec_id").as("qid"), col("m"), col("sub").as("qsub"))
      .join(broadcast(books), Seq("m"))
      .select(col("qid"), col("m"), col("cid"), l2sq(col("qsub"), col("ce")).as("qdist"))
    // approx distance = ordered fold of the M looked-up entries (sorted by
    // subspace, so the double sum is deterministic under any shuffle order)
    val adc = codes.join(broadcast(qtab), Seq("m", "cid"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id")
      .agg(array_sort(collect_list(struct(col("m"), col("qdist")))).as("parts"))
      .select(col("qid"), col("vec_id"),
        aggregate(transform(col("parts"), p => p.getField("qdist")),
          lit(0.0), (acc, v) => acc + v).as("adist"))
    val wShort = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    val shortlist = adc.withColumn("_rn", row_number().over(wShort))
      .filter(col("_rn") <= Shortlist).select("qid", "vec_id")
    // exact rerank of the shortlist only
    val wTop = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    shortlist.join(queries, Seq("qid")).join(e, Seq("vec_id"))
      .select(col("qid"), col("vec_id"),
        graft.functions.CosineSimilarity(s, col("qe"), col("embedding")).as("cos"))
      .withColumn("_rn", row_number().over(wTop))
      .filter(col("_rn") <= TopK).drop("_rn")
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
  }

  /** Mean reconstruction error over the TRAINING sample — the objective the
    * Lloyd passes minimize; exposed for the property test (trained <= seed
    * is guaranteed on the sample by k-means monotonicity).
    */
  def sampleObjective(s: SparkSession, d: String, trained: Boolean): Double = {
    val e = Tables.df(s, d, "embeddings")
    val sample = e.filter(pmod(col("vec_id"), lit(TrainSampleEvery)) === 0)
    encode(s, sample, trained)
      .agg(avg(col("recon_err"))).head().getDouble(0)
  }

  /** p29: IVF-PQ — the composed architecture a 100 TB vector store actually
    * deploys, assembled from the two independently-tested halves. The IVF
    * coarse quantizer (p22's trained centroids) routes each query to its
    * `NProbe` nearest cells; within those cells only, vectors are scored by
    * PQ asymmetric distance through their 8 codes (this is the flat-codebook
    * IVF-PQ variant — production systems often encode residuals against the
    * cell centroid for tighter codes; the routing/scoring plan is identical);
    * the shortlist is exact-cosine reranked. At scale the codes table is
    * bucketed by cell, so a query reads NProbe buckets of 4-byte codewords —
    * neither the full corpus nor any raw embedding outside the final rerank.
    */
  def ivfPqQuery(s: SparkSession, d: String): DataFrame =
    ivfPqQuery(s, d, (0L, NumQueries.toLong))

  def ivfPqQuery(s: SparkSession, d: String, queryRange: (Long, Long)): DataFrame = {
    val e = Tables.df(s, d, "embeddings")
    // coarse routing (IVF): one broadcast-centroid scan assigns cells
    val cents = IvfAnn.trainedCentroids(s, d)
    val scored = IvfAnn.scoreAgainst(s, e, cents)
    val cells = scored.groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cell"))
    val probes = scored
      .filter(col("vec_id") >= queryRange._1 && col("vec_id") < queryRange._2)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))))
      .filter(col("_rn") <= IvfProbe)
      .select(col("vec_id").as("qid"), col("cid").as("cell"))
    // fine scoring (PQ): codes for vectors in the probed cells only
    val books = trainedBooks(s, d)
    val codes = assign(subvectors(e), books)
      .select(col("vec_id"), col("m"), col("cid"))
      .join(cells, Seq("vec_id"))
    val queries = e.filter(col("vec_id") >= queryRange._1 && col("vec_id") < queryRange._2)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val qtab = subvectors(queries.select(col("qid").as("vec_id"), col("qe").as("embedding")))
      .select(col("vec_id").as("qid"), col("m"), col("sub").as("qsub"))
      .join(broadcast(books), Seq("m"))
      .select(col("qid"), col("m"), col("cid"), l2sq(col("qsub"), col("ce")).as("qdist"))
    val adc = codes.join(broadcast(probes), Seq("cell"))
      .join(broadcast(qtab), Seq("qid", "m", "cid"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy("qid", "vec_id")
      .agg(array_sort(collect_list(struct(col("m"), col("qdist")))).as("parts"))
      // qtab holds every (qid, m, cid) combination, so the join scores all M
      // subspaces of each candidate; the fold stays subspace-ordered and
      // bit-stable under any shuffle order
      .select(col("qid"), col("vec_id"),
        aggregate(transform(col("parts"), p => p.getField("qdist")),
          lit(0.0), (acc, v) => acc + v).as("adist"))
    val wShort = Window.partitionBy("qid").orderBy(col("adist"), col("vec_id"))
    val shortlist = adc.withColumn("_rn", row_number().over(wShort))
      .filter(col("_rn") <= Shortlist).select("qid", "vec_id")
    val wTop = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    shortlist.join(queries, Seq("qid")).join(e, Seq("vec_id"))
      .select(col("qid"), col("vec_id"),
        graft.functions.CosineSimilarity(s, col("qe"), col("embedding")).as("cos"))
      .withColumn("_rn", row_number().over(wTop))
      .filter(col("_rn") <= TopK).drop("_rn")
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
  }
}
