package graft.queries

import graft.{QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * a partition-pruned read of `NProbe` cells, never a full scan. Centroid
  * *training* is pluggable — here the seed centroids are the first
  * `NumCells` vectors (deterministic, which is what the recall/determinism
  * property tests need); a production fit would sample + k-means on the
  * same assignment plan.
  *
  * Engine-specific cell geometry -> rows-only driver check; recall vs the
  * p06 brute-force oracle and run-to-run determinism are asserted in
  * PipelineSpec.
  */
object IvfAnn {
  private val NumCells = 16
  private val NProbe = 4
  private val TopK = 3
  private val NumQueries = 5

  val entries: Seq[QE] = Seq(
    QE("p22_ann_ivf", None, (s, d) => query(s, d)))

  def query(s: SparkSession, d: String): DataFrame = {
    val e = Tables.df(s, d, "embeddings")
    val cents = e.filter(col("vec_id") < NumCells)
      .select(col("vec_id").as("cid"), col("embedding").as("ce"))
    // score every vector against every centroid: broadcast cross of a
    // NumCells-row build side, exact cosine, one corpus scan
    val scored = e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cid"),
        graft.functions.CosineSimilarity(s, col("embedding"), col("ce")).as("cos"))
    // corpus side: each vector lands in exactly one cell (argmax, ties to
    // the lowest centroid id)
    val cells = scored.groupBy("vec_id")
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("cell"),
        first(col("embedding")).as("embedding"))
    // query side: the NProbe nearest cells per query, multiprobe-style
    val probes = scored.filter(col("vec_id") < NumQueries)
      .withColumn("_rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos").desc, col("cid"))))
      .filter(col("_rn") <= NProbe)
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
}
