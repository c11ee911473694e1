package graft.queries

import graft.{QE, Tables}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  * Centroid training (round 7, replacing the decimal-mean spherical fit):
  * vectors are unit-normalized and quantized to integers
  * (u_i = floor(x_i/||x|| · 2^20 + 0.5) — the scalar-quantized index
  * representation real vector stores ship), and a deterministic
  * 1-in-`TrainSampleEvery` sample runs `TrainIters` Lloyd passes of plain
  * k-means in that integer space: squared-L2 assignment (exact BIGINT
  * arithmetic — L2 on unit vectors is the standard spherical-k-means
  * surrogate, cf. faiss's normalize-then-L2), then round-half-up integer
  * means, floor((2·Σv + n)/(2n)), evaluated in doubles that stay ≤ 2^53 so
  * the division is exact. Every training op is therefore either exact
  * integer (order-free under any partitioning) or a single identically-
  * rounded IEEE op — which is what lets the DuckDB oracle replay the WHOLE
  * pipeline, Lloyd iterations included, and check p22 bit-for-bit
  * ([[AnnSql]]). Empty cells keep their previous centroid. Magnitude
  * bounds: |u_i| ≤ 2^20, so a 64-dim squared distance ≤ 2^46 and a cell
  * sum over N members ≤ N·2^20 — Long-safe to N ~ 2^42 members; past that
  * a production fit would widen the mean accumulator to DECIMAL.
  *
  * Recall vs the p06 brute-force oracle (trained >= seed), run-to-run
  * determinism, objective descent, and rerank ordering are asserted in
  * PipelineSpec.
  */
object IvfAnn {
  private[queries] val NumCells = 16
  private val NProbe = 4
  private val TopK = 3
  private val NumQueries = 5
  /** Lloyd refinement passes over the training sample. */
  private val TrainIters = 2
  /** deterministic 1-in-N training sample (production: tune so the sample
    * is ~1e6 rows regardless of corpus size)
    */
  private val TrainSampleEvery = 2
  /** quantization scale: unit components land in [-2^20, 2^20] */
  private[queries] val QScale = 1L << 20

  val entries: Seq[QE] = Seq(
    QE("p22_ann_ivf", Some(s"""
      WITH ${AnnSql.quantUnitCte(QScale)},
      ${AnnSql.ivfTrainCtes(NumCells, TrainSampleEvery, TrainIters)},
      ${AnnSql.ivfCellsCte},
      ${AnnSql.ivfProbesCte(NumQueries, NProbe)},
      cand AS (
        SELECT p.qid, p.qe, c.vec_id, c.embedding
        FROM probes p JOIN cells c USING (cell) WHERE p.qid <> c.vec_id),
      ${AnnSql.rerankSelect(TopK)}"""),
      (s, d) => query(s, d)))

  /** Unit-normalized integer quantization of a float-array column: the norm
    * is the same ordered double fold the oracle uses, and every op after it
    * (divide, scale, +0.5, floor) rounds once, identically, in any IEEE
    * engine.
    */
  private[queries] def quantizeUnit(c: Column): Column = {
    val norm = sqrt(aggregate(transform(c, x => x.cast("double") * x.cast("double")),
      lit(0.0), (a, b) => a + b))
    transform(c, x => floor(x.cast("double") / norm * lit(QScale.toDouble) + lit(0.5)))
  }

  /** Exact integer squared L2 between two BIGINT-array columns. */
  private[queries] def il2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)

  /** embeddings + their quantized unit vectors `u`. */
  private[queries] def uq(s: SparkSession, d: String): DataFrame =
    Tables.df(s, d, "embeddings")
      .select(col("vec_id"), col("embedding"), quantizeUnit(col("embedding")).as("u"))

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
    val e = uq(s, d)
    val cents = if (trained) trainedCentroids(s, d) else seedCentroids(e)
    // distance of every vector to every centroid: broadcast cross of a
    // NumCells-row build side, exact integer L2, one corpus scan
    val scored = distAgainst(e, cents)
    // corpus side: each vector lands in exactly one cell (argmin, ties to
    // the lowest centroid id)
    val cells = scored.groupBy("vec_id")
      .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cell"),
        first(col("embedding")).as("embedding"))
    // query side: the NProbe nearest cells per query, multiprobe-style
    val probes = scored
      .filter(col("vec_id") >= queryRange._1 && col("vec_id") < queryRange._2)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))))
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

  /** Mean nearest-centroid squared L2 over the TRAINING SAMPLE, in the
    * quantized space — the exact objective the Lloyd passes descend
    * (monotone by k-means theory up to the ±0.5 centroid rounding);
    * exposed for the property test.
    */
  def quantizerObjective(s: SparkSession, d: String, trained: Boolean): Double = {
    val e = uq(s, d)
    val sample = e.filter(pmod(col("vec_id"), lit(TrainSampleEvery)) === 0)
    val cents = if (trained) trainedCentroids(s, d) else seedCentroids(e)
    distAgainst(sample, cents).groupBy("vec_id").agg(min(col("dist")).as("best"))
      .agg(avg(col("best"))).head().getDouble(0)
  }

  /** Every (vector, centroid) integer distance; the centroid side is tiny
    * and broadcast.
    */
  private[queries] def distAgainst(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(e.columns.map(col) :+ col("cid") :+
        il2(col("u"), col("ce")).as("dist"): _*)

  /** Deterministic seed: the first NumCells quantized vectors. */
  private[queries] def seedCentroids(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < NumCells)
      .select(col("vec_id").cast("int").as("cid"), col("u").as("ce"))

  /** The trained coarse quantizer is a build-once artifact — a real
    * deployment fits it offline and ships it alongside the index, it is
    * not re-fit per query. Memoize the collected NumCells-row table per
    * dataset dir (session-independent plain values) and rebuild a local
    * DataFrame per call; training is deterministic, so the memo cannot
    * change any result — it only stops every entry invocation from
    * re-running the Lloyd passes.
    */
  private val centCache =
    scala.collection.concurrent.TrieMap.empty[String, Seq[(Int, List[Long])]]

  private[queries] def trainedCentroids(s: SparkSession, d: String): DataFrame = {
    val rows = centCache.getOrElseUpdate(d,
      trainCentroids(s, uq(s, d)).collect().toSeq
        .map(r => (r.getAs[Int]("cid"), r.getSeq[Long](r.fieldIndex("ce")).toList)))
    import s.implicits._
    rows.toDF("cid", "ce")
  }

  /** Sampled Lloyd fit in the quantized integer space: exact-integer L2
    * assignment + round-half-up integer means, TrainIters times. Every
    * stage is a distributed aggregate over exact arithmetic (bit-stable
    * under ANY partitioning — there is no floating-point accumulation at
    * all); the only materialized object is the NumCells-row centroid table
    * per iteration.
    */
  private[queries] def trainCentroids(s: SparkSession, e: DataFrame): DataFrame = {
    val sample = e.filter(pmod(col("vec_id"), lit(TrainSampleEvery)) === 0)
      .select("vec_id", "u")
    var cents = seedCentroids(e)
    for (_ <- 1 to TrainIters) {
      val assigned = distAgainst(sample, cents)
        .groupBy("vec_id")
        .agg(min_by(col("cid"), struct(col("dist"), col("cid"))).as("cid"),
          first(col("u")).as("u"))
      // round-half-up integer mean per element: floor((2·Σv + n) / (2n)).
      // Σv is an exact Long sum (order-free); the division runs in doubles
      // that stay far under 2^53, so both the quotient and its floor are
      // exact — the identical value in any engine.
      val means = assigned
        .select(col("cid"), posexplode(col("u")).as(Seq("pos", "v")))
        .groupBy("cid", "pos")
        .agg(floor((sum(col("v")) * 2 + count(lit(1))).cast("double") /
          (count(lit(1)) * 2).cast("double")).as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          x => x.getField("m")).as("ce"))
      // cells that captured no sample points keep their previous centroid
      val kept = cents.join(means, Seq("cid"), "left_anti")
      cents = means.select("cid", "ce").unionByName(kept.select("cid", "ce"))
        .localCheckpoint()
    }
    cents
  }
}
