package graft.queries

/** DuckDB SQL fragments that replay the integer-exact ANN algorithms of
  * [[IvfAnn]] and [[PqAnn]] — Lloyd-trained quantizers included — so the
  * driver's oracle can verify them bit-for-bit.
  *
  * Portability contract (mirrored by the Spark side):
  *   - vectors are quantized to BIGINT lists with `floor(x * S + 0.5)`
  *     (round-half-up); every step of that expression is an IEEE double op
  *     both engines perform identically (float→double widening is exact,
  *     multiply/divide/add round once, floor is exact);
  *   - all distances are integer squared-L2 over the quantized lists —
  *     exact BIGINT arithmetic, so summation order cannot matter (bounds:
  *     |u_i| ≤ 2^20, 64-dim dot ≤ 2^46 « 2^63);
  *   - Lloyd means are `floor((2·Σv + n) / (2n))` — round-half-up integer
  *     division evaluated in doubles that stay ≤ 2^53, hence exact;
  *   - ties (assignment, probe order, ranks) always break on the integer
  *     id, never on a float.
  * The only doubles that survive are the final rerank cosines, computed by
  * the same ordered fold as p06's already-oracle-exact brute force.
  */
object AnnSql {
  /** Exact integer squared L2 between two BIGINT lists (1-indexed refs). */
  def il2(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
        i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (x, y) -> x + y)"""

  /** Ordered double dot product of two float lists (matches the Spark-side
    * left-to-right fold of CosineSimilarity / p06's oracle).
    */
  def oDot(a: String, b: String): String =
    s"""list_reduce(list_transform(generate_series(1, len($a)),
        i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x, y) -> x + y)"""

  /** `uq` CTE: embeddings plus their unit-normalized quantization
    * u_i = floor(x_i / ||x|| · scale + 0.5)  (IVF's spherical geometry).
    */
  def quantUnitCte(scale: Long): String =
    s"""uq AS (
      SELECT vec_id, embedding,
        list_transform(generate_series(1, len(embedding)), i ->
          CAST(floor(CAST(embedding[i] AS DOUBLE) /
            sqrt(${oDot("embedding", "embedding")}) * $scale.0 + 0.5) AS BIGINT)) AS u
      FROM embeddings)"""

  /** `rq` CTE: embeddings plus their raw quantization
    * u_i = floor(x_i · scale + 0.5)  (PQ operates on unnormalized vectors).
    */
  def quantRawCte(scale: Long): String =
    s"""rq AS (
      SELECT vec_id, embedding,
        list_transform(generate_series(1, len(embedding)), i ->
          CAST(floor(CAST(embedding[i] AS DOUBLE) * $scale.0 + 0.5) AS BIGINT)) AS u
      FROM embeddings)"""

  /** One Lloyd iteration over sample CTE `samp(vec_id, u)` against centroid
    * CTE `prev(cid, ce)`, emitting centroid CTE `next(cid, ce)`: integer-L2
    * assignment with ties to the lowest cid, round-half-up integer means,
    * empty cells keep their previous centroid.
    */
  private def ivfIterCtes(samp: String, prev: String, next: String): String =
    s"""${next}_a AS (
      SELECT vec_id, u, cid FROM (
        SELECT s.vec_id, s.u, c.cid,
          row_number() OVER (PARTITION BY s.vec_id
            ORDER BY ${il2("s.u", "c.ce")}, c.cid) AS rn
        FROM $samp s CROSS JOIN $prev c) WHERE rn = 1),
    ${next}_m AS (
      SELECT cid, pos,
        CAST(floor(CAST(2 * SUM(v) + COUNT(*) AS DOUBLE) /
                   CAST(2 * COUNT(*) AS DOUBLE)) AS BIGINT) AS m
      FROM (SELECT cid, unnest(u) AS v,
              unnest(generate_series(1, len(u))) AS pos FROM ${next}_a)
      GROUP BY cid, pos),
    $next AS (
      SELECT cid, list(m ORDER BY pos) AS ce FROM ${next}_m GROUP BY cid
      UNION ALL
      SELECT c.cid, c.ce FROM $prev c
      WHERE NOT EXISTS (SELECT 1 FROM ${next}_m x WHERE x.cid = c.cid))"""

  /** CTE chain training the IVF coarse quantizer exactly as
    * [[IvfAnn.trainCentroids]]: seed = first-`numCells` quantized vectors,
    * 1-in-`sampleEvery` training sample, `iters` Lloyd passes. Emits the
    * final centroid CTE `cents(cid, ce)`; expects `uq` in scope.
    */
  def ivfTrainCtes(numCells: Int, sampleEvery: Int, iters: Int): String = {
    val seed = s"""ivf_c0 AS (
      SELECT CAST(vec_id AS INT) AS cid, u AS ce FROM uq WHERE vec_id < $numCells),
    ivf_samp AS (SELECT vec_id, u FROM uq WHERE vec_id % $sampleEvery = 0)"""
    val steps = (1 to iters).map(k =>
      ivfIterCtes("ivf_samp", s"ivf_c${k - 1}", s"ivf_c$k"))
    (Seq(seed) ++ steps).mkString(",\n    ") +
      s",\n    cents AS (SELECT cid, ce FROM ivf_c$iters)"
  }

  /** One per-subspace Lloyd iteration for PQ: sample CTE
    * `samp(vec_id, m, sub)` against codebook CTE `prev(m, cid, ce)` emits
    * `next(m, cid, ce)`.
    */
  private def pqIterCtes(samp: String, prev: String, next: String): String =
    s"""${next}_a AS (
      SELECT vec_id, m, sub, cid FROM (
        SELECT s.vec_id, s.m, s.sub, c.cid,
          row_number() OVER (PARTITION BY s.vec_id, s.m
            ORDER BY ${il2("s.sub", "c.ce")}, c.cid) AS rn
        FROM $samp s JOIN $prev c USING (m)) WHERE rn = 1),
    ${next}_m AS (
      SELECT m, cid, pos,
        CAST(floor(CAST(2 * SUM(v) + COUNT(*) AS DOUBLE) /
                   CAST(2 * COUNT(*) AS DOUBLE)) AS BIGINT) AS mv
      FROM (SELECT m, cid, unnest(sub) AS v,
              unnest(generate_series(1, len(sub))) AS pos FROM ${next}_a)
      GROUP BY m, cid, pos),
    $next AS (
      SELECT m, cid, list(mv ORDER BY pos) AS ce FROM ${next}_m GROUP BY m, cid
      UNION ALL
      SELECT c.m, c.cid, c.ce FROM $prev c
      WHERE NOT EXISTS (SELECT 1 FROM ${next}_m x
                        WHERE x.m = c.m AND x.cid = c.cid))"""

  /** CTE chain training the PQ codebooks exactly as
    * [[PqAnn.trainCodebooks]]: per-subspace first-`k` seeds, 1-in-
    * `sampleEvery` sample, `iters` Lloyd passes over each subspace. Emits
    * `books(m, cid, ce)` plus `subs(vec_id, m, sub)` (every vector's
    * quantized subvectors); expects `rq` in scope.
    */
  def pqTrainCtes(mSub: Int, subDim: Int, k: Int, sampleEvery: Int,
      iters: Int): String = {
    val base = s"""pq_ms AS (SELECT unnest(generate_series(0, ${mSub - 1})) AS m),
    subs AS (
      SELECT vec_id, m,
        list_transform(generate_series(1, $subDim), i -> u[m * $subDim + i]) AS sub
      FROM rq CROSS JOIN pq_ms),
    pq_c0 AS (
      SELECT m, CAST(vec_id AS INT) AS cid, sub AS ce FROM subs WHERE vec_id < $k),
    pq_samp AS (SELECT vec_id, m, sub FROM subs WHERE vec_id % $sampleEvery = 0)"""
    val steps = (1 to iters).map(j =>
      pqIterCtes("pq_samp", s"pq_c${j - 1}", s"pq_c$j"))
    (Seq(base) ++ steps).mkString(",\n    ") +
      s",\n    books AS (SELECT m, cid, ce FROM pq_c$iters)"
  }

  /** `codes(vec_id, m, cid, dist)` CTE: every vector's per-subspace nearest
    * codebook entry (expects `subs` and `books`).
    */
  def pqCodesCte: String =
    s"""codes AS (
      SELECT vec_id, m, cid, dist FROM (
        SELECT s.vec_id, s.m, c.cid, ${il2("s.sub", "c.ce")} AS dist,
          row_number() OVER (PARTITION BY s.vec_id, s.m
            ORDER BY ${il2("s.sub", "c.ce")}, c.cid) AS rn
        FROM subs s JOIN books c USING (m)) WHERE rn = 1)"""

  /** `cells(vec_id, embedding, cell)` CTE: whole-corpus IVF assignment
    * (expects `uq` and `cents`).
    */
  def ivfCellsCte: String =
    s"""cells AS (
      SELECT vec_id, embedding, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${il2("e.u", "c.ce")}, c.cid) AS rn
        FROM uq e CROSS JOIN cents c) WHERE rn = 1)"""

  /** `probes(qid, qe, cell)` CTE: each query's `nProbe` nearest cells
    * (expects `uq` and `cents`).
    */
  def ivfProbesCte(numQueries: Int, nProbe: Int): String =
    s"""probes AS (
      SELECT vec_id AS qid, embedding AS qe, cid AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cid,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${il2("e.u", "c.ce")}, c.cid) AS rn
        FROM uq e CROSS JOIN cents c WHERE e.vec_id < $numQueries)
      WHERE rn <= $nProbe)"""

  /** Final exact-cosine rerank over `cand(qid, qe, vec_id, embedding)`. */
  def rerankSelect(topK: Int): String =
    s"""scored AS (SELECT qid, vec_id, ${oDot("qe", "embedding")} /
          (sqrt(${oDot("qe", "qe")}) * sqrt(${oDot("embedding", "embedding")})) AS cos
        FROM cand)
      SELECT qid, vec_id, cos FROM scored
      QUALIFY row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) <= $topK
      ORDER BY qid, cos DESC, vec_id"""
}
