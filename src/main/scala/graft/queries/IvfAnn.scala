package graft.queries

import graft.{QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, FloatType}

/** IVF (inverted-file) approximate nearest neighbor — the coarse-quantizer
  * counterpart to the hyperplane-LSH tables of p07. The corpus is
  * partitioned into cells around a small centroid set; a query scores only
  * the vectors in its `NProbe` nearest cells, then reranks them with the
  * exact codegen'd cosine.
  *
  * Scale posture: centroid assignment is ONE broadcast-join scan of the
  * corpus (the centroid set stays tiny — k ~ sqrt(n) even at 100 TB is a
  * few hundred thousand rows, well inside broadcast range); the assigned
  * table would be written `bucketBy(cell)` so a query's candidate fetch is
  * a partition-pruned read of `NProbe` cells, never a full scan.
  *
  * Centroid training (round 5, replacing the first-N seed): a deterministic
  * 1-in-`TrainSampleEvery` sample of the corpus runs `TrainIters` Lloyd
  * iterations — cosine assignment against the current centroids, then
  * per-cell element-wise means. The mean is computed in DECIMAL (exact sum,
  * one deterministic rounding at the division) so training is bit-stable
  * under any partitioning; each refined centroid table is ~NumCells rows
  * and is localCheckpoint'ed, the same tiny-table materialization step
  * every distributed k-means performs between iterations. Empty cells keep
  * their previous centroid.
  *
  * Engine-specific cell geometry -> rows-only driver check; recall vs the
  * p06 brute-force oracle (trained >= seed), run-to-run determinism, and
  * rerank ordering are asserted in PipelineSpec.
  */
object IvfAnn {
  private val NumCells = 16
  private val NProbe = 4
  private val TopK = 3
  private val NumQueries = 5
  /** Lloyd refinement passes over the training sample. */
  private val TrainIters = 2
  /** deterministic 1-in-N training sample (production: tune so the sample
    * is ~1e6 rows regardless of corpus size)
    */
  private val TrainSampleEvery = 2

  val entries: Seq[QE] = Seq(
    QE("p22_ann_ivf", None, (s, d) => query(s, d)))

  def query(s: SparkSession, d: String): DataFrame = query(s, d, trained = true)

  /** `trained = false` uses the raw first-N seed centroids, `nProbe`
    * overrides the probe width, and `queryRange` picks the query vectors —
    * kept callable so the recall property test can compare trained vs seed
    * quantizers at equal NProbe on queries that are NOT seed centroids
    * (the first-N seed contains the default queries themselves, which
    * overfits its cells to them).
    */
  def query(s: SparkSession, d: String, trained: Boolean,
      nProbe: Int = NProbe,
      queryRange: (Long, Long) = (0L, NumQueries.toLong)): DataFrame = {
    val e = Tables.df(s, d, "embeddings")
    val cents = if (trained) trainedCentroids(s, d) else seedCentroids(e)
    // score every vector against every centroid: broadcast cross of a
    // NumCells-row build side, exact cosine, one corpus scan
    val scored = scoreAgainst(s, e, cents)
    // corpus side: each vector lands in exactly one cell (argmax, ties to
    // the lowest centroid id)
    val cells = scored.groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cell"),
        first(col("embedding")).as("embedding"))
    // query side: the NProbe nearest cells per query, multiprobe-style
    val probes = scored
      .filter(col("vec_id") >= queryRange._1 && col("vec_id") < queryRange._2)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))))
      .filter(col("_rn") <= nProbe)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("cid").as("cell"))
    // candidates = probed cells only; exact rerank; a vector is in one cell
    // and probe cells are distinct, so no dedup is needed
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id"))
    broadcast(probes).join(cells, Seq("cell"))
      .filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        graft.functions.CosineSimilarity(s, col("qe"), col("embedding")).as("cos"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= TopK).drop("_rn")
      .orderBy(col("qid"), col("cos").desc, col("vec_id"))
  }

  /** Mean nearest-centroid cosine over the corpus — the spherical-k-means
    * objective the Lloyd iterations climb; exposed for the property test.
    */
  def quantizerObjective(s: SparkSession, d: String, trained: Boolean): Double = {
    val e = Tables.df(s, d, "embeddings")
    val cents = if (trained) trainedCentroids(s, d) else seedCentroids(e)
    scoreAgainst(s, e, cents).groupBy("vec_id").agg(max(col("cos")).as("best"))
      .agg(avg(col("best"))).head().getDouble(0)
  }

  private[queries] def scoreAgainst(s: SparkSession, e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        graft.functions.CosineSimilarity(s, col("embedding"), col("ce")).as("cos"))

  /** Deterministic seed: the first NumCells vectors. */
  private[queries] def seedCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < NumCells)
      .select(col("vec_id").cast("int").as("cid"), col("embedding").as("ce"))

  /** The trained coarse quantizer is a build-once artifact — a real
    * deployment fits it offline and ships it alongside the index, it is
    * not re-fit per query. Memoize the collected NumCells-row table per
    * dataset dir (session-independent plain values) and rebuild a local
    * DataFrame per call; training is deterministic, so the memo cannot
    * change any result — it only stops every entry invocation from
    * re-running the Lloyd passes.
    */
  private val centCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, List[Float])]]

  private[queries] def trainedCentroids(s: SparkSession, d: String): DataFrame = {
    val rows = centCache.getOrElseUpdate(d,
      trainCentroids(s, Tables.df(s, d, "embeddings")).collect().toSeq
        .map(r => (r.getAs[Int]("cid"), r.getSeq[Float](r.fieldIndex("ce")).toList)))
    import s.implicits._
    rows.toDF("cid", "ce")
  }

  /** Sampled Lloyd fit: assignment scan + exact-decimal per-cell means,
    * TrainIters times. Every stage is a distributed aggregate; the only
    * materialized object is the NumCells-row centroid table per iteration.
    */
  private[queries] def trainCentroids(s: SparkSession, e: DataFrame): DataFrame = {
    val sample = e.filter(pmod(col("vec_id"), lit(TrainSampleEvery)) === 0)
    var cents = seedCentroids(e)
    for (_ <- 1 to TrainIters) {
      val assigned = scoreAgainst(s, sample, cents)
        .groupBy("vec_id")
        .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cid"),
          first(col("embedding")).as("embedding"))
      // SPHERICAL mean per cell (assignment is cosine, so points average as
      // unit vectors — a raw mean lets large-magnitude vectors drag the
      // centroid): normalize per row, then element-wise exact-decimal mean
      // — exact sum, one rounding at the divide, bit-stable under any
      // partitioning (a plain double avg is order-dependent)
      val norm = sqrt(aggregate(transform(col("embedding"),
        x => x.cast("double") * x.cast("double")), lit(0.0), (a, b) => a + b))
      val means = assigned
        .select(col("cid"),
          posexplode(transform(col("embedding"),
            x => x.cast("double") / norm)).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(avg(col("v").cast(DecimalType(27, 12))).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m").cast(FloatType)).as("ce"))
      // cells that captured no sample points keep their previous centroid
      val kept = cents.join(means, Seq("cid"), "left_anti")
      cents = means.select("cid", "ce").unionByName(kept.select("cid", "ce"))
        .localCheckpoint()
    }
    cents
  }
}
