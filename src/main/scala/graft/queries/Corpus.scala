package graft.queries

import graft.{QE, Tables}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-engineering operators, continuing the training-data family of
  * `Pipeline`: bloom-prefiltered decontamination (the runtime-filter pattern
  * at corpus scale), sliding-window chunking with overlap (the RAG /
  * long-context counterpart to p21's pack-then-chunk), and corpus-frequency
  * keyword extraction (document-frequency statistics broadcast back over the
  * corpus). All three are exact — the bloom is a prefilter whose survivors
  * are confirmed by an exact join, so every entry is DuckDB-oracle-checkable.
  */
object Corpus {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)
  private def toks(c: Column): Column = split(c, " ")

  /** Bloom sizing for the eval-gram build side. At bench SF the distinct
    * 8-gram count is ~50k; 1M items / 8M bits (1 MiB) keeps the false-positive
    * rate ~1e-4 with headroom. Production sizing is mechanical: items =
    * distinct-gram estimate of the EVAL set (which stays small by
    * construction — it is the benchmark suite, not the corpus), bits ~ 10x.
    */
  private val BloomItems = 1000000L
  private val BloomBits = 8L * 1024 * 1024

  /** p25 chunk geometry: 256-token windows advancing by 192 (64-token
    * overlap) — the standard RAG / long-context chunking shape.
    */
  private val ChunkTokens = 256
  private val ChunkStride = 192

  /** p26: top-k keywords per document. */
  private val TopKeywords = 3

  /** GLOBAL token-budget cut, two-phase (p54): select the document rows
    * whose inclusive cumulative `tok` in (n_chars DESC, doc_id) order fits
    * `budget` — equivalent to the naive whole-corpus window cumsum, but
    * with no global sort: per-score bucket masses are cumsummed (tiny,
    * distinct n_chars values only), full buckets pass a broadcast range
    * check, and only the single boundary bucket gets a per-doc window.
    * `docs` needs (doc_id, n_chars, tok) plus any carry-through columns;
    * `budget` is a 1-row DF with a `budget` column so callers can keep it
    * a broadcast scalar computed in-plan. PipelineSpec pins equivalence
    * with the naive window across edge budgets (0, bucket-edge, total+).
    */
  private[graft] def budgetSelect(docs: DataFrame, budget: DataFrame): DataFrame = {
    val buckets = docs.groupBy("n_chars").agg(sum("tok").as("btok"))
      .withColumn("cumb",
        sum(col("btok")).over(Window.orderBy(col("n_chars").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prevb", col("cumb") - col("btok"))
    val joined = docs.join(broadcast(buckets), "n_chars")
      .crossJoin(broadcast(budget))
    val full = joined.filter(col("cumb") <= col("budget"))
    val boundary = joined
      .filter(col("cumb") > col("budget") && col("prevb") <= col("budget"))
      .withColumn("cumdoc", col("prevb") + sum(col("tok")).over(
        Window.partitionBy("n_chars").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cumdoc") <= col("budget"))
      .drop("cumdoc")
    full.unionByName(boundary)
  }

  val entries: Seq[QE] = Seq(
    // Bloom-prefiltered benchmark decontamination — p18's exact-overlap rule
    // re-planned the way a 100 TB run would actually execute it. p18 ships
    // the full distinct eval-gram set to every task as the broadcast build
    // side of the confirm join; here the corpus side is first screened by a
    // BLOOM FILTER over the eval grams (Spark's own sketch, the same
    // expression pair its runtime row-level filtering injects). The bloom is
    // O(bits) no matter how many grams it summarizes, and only the ~fpp
    // fraction of clean grams (plus true hits) ever reaches the exact
    // confirm join — at corpus scale the join's probe-side input drops by
    // orders of magnitude for one extra codegen'd predicate per gram.
    // The result is still EXACT: false positives are eliminated by the
    // confirm join; a bloom has no false negatives. Output flips p18's view:
    // the contaminated docs with their distinct-overlapping-gram counts.
    QE("p24_bloom_decontaminate", Some(s"""
      WITH tok AS (SELECT doc_id, source, str_split(text, ' ') AS ts FROM documents),
      bench AS (SELECT DISTINCT unnest(${Pipeline.oWordNgrams("ts", 8)}) AS g
                FROM tok WHERE source = 'src0'),
      corpus AS (SELECT doc_id, unnest(${Pipeline.oWordNgrams("ts", 8)}) AS g
                 FROM tok WHERE source <> 'src0')
      SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_bad_grams
      FROM corpus JOIN bench USING (g)
      GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        // token hashes bound to a real column once; grams combine hashes
        // arithmetically (longs end-to-end, same as p18)
        val grams = docs.select(col("doc_id"), col("source"),
            transform(toks(col("text")), w => xxhash64(w)).as("th"))
          .select(col("doc_id"), col("source"),
            explode(Pipeline.wordNgramHashes(col("th"), 8)).as("g"))
        val bench = grams.filter(col("source") === "src0").select("g").distinct()
        // build the bloom as ONE distributed aggregate; the single-row
        // result is the only thing collected (the same shape Spark's
        // InjectRuntimeFilter produces as a scalar subquery)
        val bf = bench.agg(
          graft.functions.BloomFunctions.bloomAgg(s, col("g"), BloomItems, BloomBits)
            .as("bf")).head().getAs[Array[Byte]](0)
        val candidates = grams.filter(col("source") =!= "src0")
          .filter(graft.functions.BloomFunctions.mightContain(s, lit(bf), col("g")))
        // exact confirm join on the bloom survivors only
        candidates.join(broadcast(bench), "g")
          .groupBy("doc_id")
          .agg(count_distinct(col("g")).as("n_bad_grams"))
          .orderBy("doc_id")
      }),

    // Sliding-window chunking with overlap: 256-token chunks every 192
    // tokens (64-token overlap), the retrieval/long-context counterpart to
    // p21's disjoint packing. Expression-only — the chunk starts come from
    // `sequence` and each chunk is a `slice` of the one tokenized array, so
    // the whole operator is a codegen'd per-row expansion with no shuffle at
    // all (ordering aside); output rows ~ n_tokens/stride per doc. The md5
    // of each chunk's re-joined text pins content equality, not just
    // geometry, against the oracle.
    QE("p25_chunk_overlap", Some(s"""
      WITH t AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents),
      c AS (SELECT doc_id, ts, unnest(generate_series(0, len(ts) - 1, $ChunkStride)) AS st
            FROM t)
      SELECT doc_id, CAST(st / $ChunkStride AS BIGINT) AS chunk_idx,
             CAST(st AS BIGINT) AS start_tok,
             CAST(least($ChunkTokens, len(ts) - st) AS BIGINT) AS chunk_tokens,
             md5(array_to_string(list_slice(ts, st + 1, st + $ChunkTokens), ' ')) AS chunk_md5
      FROM c ORDER BY doc_id, chunk_idx"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        docs.select(col("doc_id"), toks(col("text")).as("ts"))
          .select(col("doc_id"), col("ts"),
            explode(sequence(lit(0), size(col("ts")) - 1, lit(ChunkStride))).as("st"))
          .select(col("doc_id"),
            (col("st") / ChunkStride).cast("long").as("chunk_idx"),
            col("st").cast("long").as("start_tok"),
            least(lit(ChunkTokens), size(col("ts")) - col("st")).cast("long")
              .as("chunk_tokens"),
            md5(concat_ws(" ", slice(col("ts"), col("st") + 1, lit(ChunkTokens))))
              .as("chunk_md5"))
          .orderBy("doc_id", "chunk_idx")
      }),

    // Corpus-frequency keyword extraction: per-document top-3 terms by a
    // rarity-weighted term frequency, score = tf x (N - df). Two aggregation
    // passes — per-(doc, token) tf, then per-token document frequency — and
    // the df table is broadcast back over the tf rows (the vocabulary is
    // sublinear in the corpus; past broadcast range this join degrades
    // gracefully to a shuffle on the token key). Scoring is integer-exact on
    // purpose: classic tf-idf's ln() is a one-line swap but last-ulp libm
    // differences across engines would poison a hash-exact oracle; the
    // integer weight ranks identically for fixed N.
    QE("p26_keyword_extract", Some(s"""
      WITH tf AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
      tfc AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tf GROUP BY doc_id, tok),
      dfc AS (SELECT tok, COUNT(*) AS df FROM tfc GROUP BY tok),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      scored AS (SELECT doc_id, tok, tf, df, tf * (n_docs - df) AS score
                 FROM tfc JOIN dfc USING (tok) CROSS JOIN n)
      SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, tok, tf, df, score FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, tok) AS rnk
        FROM scored) WHERE rnk <= $TopKeywords
      ORDER BY doc_id, rnk"""),
      (s, d) => {
        val docs = t(s, d, "documents")
        val tf = docs.select(col("doc_id"), explode(toks(col("text"))).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        // tf rows are unique per (doc, token), so df is a plain count
        val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
        tf.join(broadcast(df), "tok")
          .crossJoin(broadcast(n))
          .withColumn("score", col("tf") * (col("n_docs") - col("df")))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= TopKeywords)
          .select("doc_id", "rnk", "tok", "tf", "df", "score")
          .orderBy("doc_id", "rnk")
      }),

    // Source-mixture sampling weights — the knob a training run turns to
    // rebalance domains (web/code/books/...) before sampling. Per-source
    // exact token counts (one scan, BIGINT-exact partial aggregation),
    // then the temperature-scaled relative weight sqrt(tokens_s) /
    // sqrt(max tokens) — alpha=0.5 mixture flattening spelled with sqrt,
    // not pow(x, 0.5): IEEE sqrt is correctly rounded in every engine so
    // the oracle compares bit-exact, while pow is not so guaranteed. The
    // cross-source max rides a window over the ~|sources| aggregate (max
    // is order-insensitive — exact under any partitioning, unlike a
    // double sum). At 100 TB this is one corpus scan into a KB-sized
    // aggregate; the weights then drive p17-style stratified sampling.
    QE("p30_mixture_weights", Some("""
      SELECT source, n_docs, tokens,
             sqrt(CAST(tokens AS DOUBLE)) / sqrt(CAST(MAX(tokens) OVER () AS DOUBLE)) AS w_rel
      FROM (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS tokens
            FROM documents GROUP BY source)
      ORDER BY source"""),
      (s, d) => {
        val perSrc = t(s, d, "documents")
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(size(toks(col("text"))).cast("long")).as("tokens"))
        val w = Window.partitionBy()
        perSrc.select(col("source"), col("n_docs"), col("tokens"),
            (sqrt(col("tokens").cast("double")) /
              sqrt(max(col("tokens")).over(w).cast("double"))).as("w_rel"))
          .orderBy("source")
      }),

    // First BPE merge step — vocabulary induction's inner loop: count
    // adjacent character pairs across every token occurrence and surface
    // the merge candidates. Pure expression expansion (explode tokens →
    // per-token pair array via sequence+transform) into a partial-agg'd
    // count — one scan, one shuffle of (pair, partial-count) rows, never
    // materializing per-occurrence pairs across the wire beyond the
    // map-side combine. Deterministic tie-break on the pair itself.
    QE("p31_bpe_pair_stats", Some("""
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT substring(t, CAST(i AS INT), 2) AS pair FROM (
          SELECT t, unnest(range(1, length(t))) AS i FROM (
            SELECT unnest(str_split(text, ' ')) AS t FROM documents)
          WHERE length(t) >= 2))
      GROUP BY pair ORDER BY cnt DESC, pair LIMIT 10"""),
      (s, d) => t(s, d, "documents")
        .select(explode(toks(col("text"))).as("t"))
        .where(length(col("t")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")).as("pair"))
        .groupBy("pair").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(10)),

    // Corpus-internal boilerplate-span detection — the C4/CCNet cleaning
    // primitive that p05 (pairwise similarity) and p18 (external-eval
    // decontamination) do NOT cover: find 5-token spans that recur across
    // MANY documents (navigation chrome, license headers, templated
    // footers) and count them per document. Spans are distinct per doc
    // before the df count, so a doc repeating its own phrase doesn't
    // inflate the corpus df. One explode pass → distinct → df aggregate;
    // the surviving repeated-span table is tiny by construction (only
    // spans with df >= 3) and broadcasts back over the span stream. At
    // 100 TB the gram key would be xxhash64(gram) so shuffles carry 8
    // bytes, not strings — kept as text here so the DuckDB oracle can
    // reproduce the exact counts (DuckDB's hash() is a different
    // function; a collision at 64 bits is ~1e-9 even corpus-wide).
    QE("p32_boilerplate_spans", Some("""
      WITH d AS (SELECT doc_id, str_split(text, ' ') AS arr FROM documents),
      pos AS (SELECT doc_id, arr, unnest(range(len(arr) - 4)) AS i
              FROM d WHERE len(arr) >= 5),
      sh AS (SELECT DISTINCT doc_id,
                    array_to_string(list_slice(arr, CAST(i + 1 AS INT), CAST(i + 5 AS INT)), ' ') AS gram
             FROM pos),
      c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df FROM sh GROUP BY gram)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_boiler
      FROM sh JOIN c USING (gram) WHERE df >= 3
      GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => {
        val sh = t(s, d, "documents")
          .select(col("doc_id"), toks(col("text")).as("arr"))
          .where(size(col("arr")) >= 5)
          .select(col("doc_id"), explode(expr(
            "transform(sequence(0, size(arr) - 5), i -> concat_ws(' ', slice(arr, i + 1, 5)))")).as("gram"))
          .distinct()
        val repeated = sh.groupBy("gram").agg(count(lit(1)).as("df"))
          .filter(col("df") >= 3)
        sh.join(broadcast(repeated), "gram")
          .groupBy("doc_id").agg(count(lit(1)).as("n_boiler"))
          .orderBy("doc_id")
      }),

    // Token-rarity scoring — rank documents by the mean corpus document
    // frequency of their tokens, surfacing rare-vocabulary outliers
    // (OCR noise, non-language junk, genuinely novel text) that
    // length/punctuation heuristics (p09) never see. Two passes: the
    // |vocab|-sized df table (sublinear in the corpus) broadcasts back
    // over the token stream — a map-side join, no token-keyed shuffle —
    // then one per-doc aggregate. Exactness: SUM(df) is an integer, so
    // mean_df = sum/count is one deterministic IEEE division on both
    // engines; ordering ties break on doc_id.
    QE("p33_token_rarity", Some("""
      WITH tok AS (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents),
      dfc AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tok GROUP BY tok)
      SELECT doc_id,
             CAST(SUM(df) AS DOUBLE) / COUNT(*) AS mean_df,
             CAST(COUNT(*) AS BIGINT) AS n_toks
      FROM tok JOIN dfc USING (tok)
      GROUP BY doc_id ORDER BY mean_df ASC, doc_id LIMIT 50"""),
      (s, d) => {
        val tok = t(s, d, "documents")
          .select(col("doc_id"), explode(toks(col("text"))).as("tok"))
        val dfc = tok.distinct()
          .groupBy("tok").agg(count(lit(1)).as("df"))
        tok.join(broadcast(dfc), "tok")
          .groupBy("doc_id")
          .agg((sum("df").cast("double") / count(lit(1))).as("mean_df"),
            count(lit(1)).as("n_toks"))
          .orderBy(col("mean_df").asc, col("doc_id"))
          .limit(50)
      }),

    // Deterministic train/val/test corpus split (80/10/10) — the
    // assignment every training run needs to be REPRODUCIBLE and
    // data-movement-free: the split is a pure projection of the doc key
    // (Knuth multiplicative hash → bucket 0-99), so at 100 TB it costs
    // zero shuffle and any re-run, on any cluster layout, lands every
    // document in the same split. The hash is plain BIGINT arithmetic so
    // the DuckDB oracle reproduces it exactly (production would use
    // xxhash64, which no second engine can re-derive); the per-(source,
    // split) census then verifies stratification in one group-key
    // aggregate.
    QE("p34_corpus_split", Some("""
      WITH s AS (
        SELECT source,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
               len(str_split(text, ' ')) AS toks
        FROM (SELECT source, text,
                     (((doc_id % 2147483648) * 2654435761) % 4294967296) % 100 AS b
              FROM documents))
      SELECT source, split, COUNT(*) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS tokens
      FROM s GROUP BY 1, 2 ORDER BY source, split"""),
      (s, d) => {
        // mod 2^31 first: unmasked, the product wraps in Spark past
        // doc_id ~3.5e9 while DuckDB promotes to HUGEINT — split drift
        // exactly at production corpus sizes
        val b = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L))
          % lit(4294967296L)) % 100
        t(s, d, "documents")
          .select(col("source"),
            when(b < 80, "train").when(b < 90, "val").otherwise("test").as("split"),
            size(toks(col("text"))).cast("long").as("toks"))
          .groupBy("source", "split")
          .agg(count(lit(1)).as("n_docs"), sum("toks").as("tokens"))
          .orderBy("source", "split")
      }),

    // Quality-gate funnel census — the observability pass every corpus
    // cleaning run needs before committing a filter stack: how many
    // documents per source survive each CUMULATIVE gate (length → token
    // count → language whitelist → lexical diversity), and the final
    // keep rate. One scan, expression-only row predicates, one group-key
    // aggregate of 4 conditional counts — at 100 TB this is a single
    // map-side-combined pass, and widening the funnel by another gate
    // adds a column, not a scan. Gates are cumulative by construction
    // (each condition AND's the previous) so the funnel is monotone —
    // the property a per-gate drop report depends on.
    QE("p35_quality_funnel", Some("""
      WITH f AS (
        SELECT source, lang,
               n_chars >= 100 AS g1,
               len(str_split(text, ' ')) AS ntok,
               len(list_distinct(str_split(text, ' '))) AS ndis
        FROM documents),
      g AS (
        SELECT source,
               g1,
               g1 AND ntok >= 30 AS g2,
               g1 AND ntok >= 30 AND lang IN ('en','de','es','fr') AS g3,
               g1 AND ntok >= 30 AND lang IN ('en','de','es','fr')
                  AND CAST(ndis AS DOUBLE) / CAST(ntok AS DOUBLE) >= 0.5 AS g4
        FROM f)
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS pass_len,
             CAST(SUM(CASE WHEN g2 THEN 1 ELSE 0 END) AS BIGINT) AS pass_tok,
             CAST(SUM(CASE WHEN g3 THEN 1 ELSE 0 END) AS BIGINT) AS pass_lang,
             CAST(SUM(CASE WHEN g4 THEN 1 ELSE 0 END) AS BIGINT) AS pass_div,
             CAST(SUM(CASE WHEN g4 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS keep_rate
      FROM g GROUP BY source ORDER BY source"""),
      (s, d) => {
        val ts = toks(col("text"))
        val g1 = col("n_chars") >= 100
        val g2 = g1 && col("ntok") >= 30
        val g3 = g2 && col("lang").isin("en", "de", "es", "fr")
        val g4 = g3 &&
          col("ndis").cast("double") / col("ntok").cast("double") >= 0.5
        def cnt(c: Column) = sum(when(c, 1).otherwise(0)).cast("long")
        t(s, d, "documents")
          .select(col("source"), col("lang"), col("n_chars"),
            size(ts).as("ntok"), size(array_distinct(ts)).as("ndis"))
          .groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            cnt(g1).as("pass_len"), cnt(g2).as("pass_tok"),
            cnt(g3).as("pass_lang"), cnt(g4).as("pass_div"),
            (sum(when(g4, 1).otherwise(0)).cast("double") / count(lit(1)))
              .as("keep_rate"))
          .orderBy("source")
      }),

    // Token-budget curriculum selection — fill a fixed per-source token
    // budget with the highest-quality documents first (quality = lexical
    // diversity here; any deterministic score slots in): rank within each
    // source, take documents while the running token total stays under
    // budget. One scan + ONE source-partitioned window — the cumulative
    // sum shuffles on source only, so at 100 TB each source's selection
    // runs independently and in parallel; no global sort, no driver-side
    // loop. The diversity score is a single double division computed in
    // identical op order in both engines, so the (score DESC, doc_id)
    // rank — and therefore the exact kept set — is engine-independent.
    QE("p36_token_budget", Some("""
      WITH f AS (
        SELECT doc_id, source,
               len(str_split(text, ' ')) AS toks,
               CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE)
                 / CAST(len(str_split(text, ' ')) AS DOUBLE) AS score
        FROM documents),
      w AS (
        SELECT doc_id, source, toks, score,
               SUM(toks) OVER (PARTITION BY source ORDER BY score DESC, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
        FROM f)
      SELECT doc_id, source, CAST(toks AS BIGINT) AS toks,
             CAST(cum AS BIGINT) AS cum_toks
      FROM w WHERE cum - toks < 2000
      ORDER BY source, cum_toks, doc_id"""),
      (s, d) => {
        val ts = toks(col("text"))
        val f = t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(ts).cast("long").as("toks"),
            (size(array_distinct(ts)).cast("double") /
              size(ts).cast("double")).as("score"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("source")
          .orderBy(col("score").desc, col("doc_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)
        f.withColumn("cum", sum(col("toks")).over(w))
          .filter(col("cum") - col("toks") < 2000)
          .select(col("doc_id"), col("source"), col("toks"),
            col("cum").as("cum_toks"))
          .orderBy("source", "cum_toks", "doc_id")
      }),

    // Incremental-ingest dedup — the daily-crawl shape p01's whole-corpus
    // dedup doesn't cover: a NEW batch (sources src16+) deduplicates
    // against the already-ingested corpus index (sources src0-15) by
    // content hash, then first-wins within itself. The history side
    // carries ONLY its distinct hash column — at production scale that
    // index is a fraction of corpus size, the anti-join hash-partitions
    // both sides on the hash (bloom-prefilterable exactly as p24), and
    // the within-batch window shuffles just the new batch. The full
    // corpus text is never re-read to ingest a day.
    QE("p37_incremental_dedup", Some("""
      WITH h AS (SELECT DISTINCT md5(text) AS hsh FROM documents
                 WHERE CAST(SUBSTRING(source, 4) AS INT) < 16),
      b AS (SELECT doc_id, source, md5(text) AS hsh FROM documents
            WHERE CAST(SUBSTRING(source, 4) AS INT) >= 16),
      f AS (SELECT b.doc_id, b.source, b.hsh FROM b
            LEFT JOIN h ON b.hsh = h.hsh WHERE h.hsh IS NULL),
      r AS (SELECT doc_id, source,
              row_number() OVER (PARTITION BY hsh ORDER BY doc_id) AS rn
            FROM f)
      SELECT doc_id, source FROM r WHERE rn = 1 ORDER BY doc_id"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .withColumn("_src_n", substring(col("source"), 4, 10).cast("int"))
        val history = docs.filter(col("_src_n") < 16)
          .select(md5(col("text")).as("hsh")).distinct()
        val batch = docs.filter(col("_src_n") >= 16)
          .select(col("doc_id"), col("source"), md5(col("text")).as("hsh"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("hsh").orderBy("doc_id")
        batch.join(history, Seq("hsh"), "left_anti")
          .withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .select("doc_id", "source")
          .orderBy("doc_id")
      }),

    // Dataset-card statistics — the per-source summary every corpus
    // release publishes (counts, token volume, mean length, language
    // composition): ONE conditional-agg scan, so regenerating the card
    // after each pipeline stage costs a single pass at any corpus size.
    // Language shares divide exact integer counts in double with
    // identical op order — no entropy/log terms, whose last-ulp libm
    // differences would break cross-engine hashing.
    QE("p38_dataset_card", Some("""
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(len(str_split(text, ' '))) AS BIGINT) AS total_tokens,
             CAST(CAST(SUM(CAST(n_chars AS DECIMAL(12,2))) AS DOUBLE) / COUNT(n_chars) AS DOUBLE) AS mean_chars,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pct_en,
             CAST(SUM(CASE WHEN lang = 'zh' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS pct_zh,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM documents GROUP BY source ORDER BY source"""),
      (s, d) =>
        t(s, d, "documents")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(size(toks(col("text"))).cast("long")).as("total_tokens"),
            graft.Q.davg(col("n_chars")).as("mean_chars"),
            (sum(when(col("lang") === "en", 1).otherwise(0)).cast("double") /
              count(lit(1))).as("pct_en"),
            (sum(when(col("lang") === "zh", 1).otherwise(0)).cast("double") /
              count(lit(1))).as("pct_zh"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy("source")),

    // Length-band outlier census via EXACT DISCRETE percentiles
    // (PERCENTILE_DISC, the SQL-standard first-value-with-cume_dist>=p):
    // corpus-global p10/p90 length thresholds, then a per-source
    // below/in/above-band census. Discrete percentiles return ACTUAL data
    // values (integers here), so — unlike interpolating PERCENTILE_CONT,
    // whose last-ulp float differences could flip boundary rows between
    // engines — the band membership is bit-exactly reproducible. Plan: one
    // column-pruned scan for the two thresholds (sort-based aggregate; at
    // 100 TB swap in approx_percentile, same shape), the 1-row threshold
    // table broadcast into one conditional-agg pass over documents.
    QE("p40_length_band", Some("""
      WITH th AS (SELECT
          CAST(QUANTILE_DISC(n_chars, 0.1) AS BIGINT) AS lo,
          CAST(QUANTILE_DISC(n_chars, 0.9) AS BIGINT) AS hi
        FROM documents)
      SELECT source,
        CAST(SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        CAST(SUM(CASE WHEN n_chars BETWEEN lo AND hi THEN 1 ELSE 0 END) AS BIGINT) AS n_band,
        CAST(SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_long
      FROM documents CROSS JOIN th
      GROUP BY source ORDER BY source"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          WITH th AS (SELECT
              PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY n_chars) AS lo,
              PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY n_chars) AS hi
            FROM documents)
          SELECT source,
            SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END) AS n_short,
            SUM(CASE WHEN n_chars BETWEEN lo AND hi THEN 1 ELSE 0 END) AS n_band,
            SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END) AS n_long
          FROM documents CROSS JOIN th
          GROUP BY source ORDER BY source""")
      }),

    // Contamination SCORING — the graded companion to p18's binary purge:
    // per corpus doc, what fraction of its 8-gram occurrences appear in
    // the benchmark (src0) gram set. Release pipelines threshold on this
    // score rather than dropping on first hit; emitting it per doc makes
    // the policy a cheap filter downstream. Same scale shape as p18: grams
    // ride 64-bit rolling hashes (never ~50-char strings), the benchmark
    // set broadcasts, and the corpus is scanned once; the integer
    // hit/total division is the only float, same op order both engines.
    QE("p43_contamination_score", Some(s"""
      WITH tok AS (SELECT doc_id, source, str_split(text, ' ') AS ts FROM documents),
      bench AS (SELECT DISTINCT unnest(${graft.queries.Pipeline.oWordNgrams("ts", 8)}) AS g
                FROM tok WHERE source = 'src0'),
      corpus AS (SELECT doc_id, unnest(${graft.queries.Pipeline.oWordNgrams("ts", 8)}) AS g
                 FROM tok WHERE source <> 'src0'),
      tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY doc_id),
      hits AS (SELECT c.doc_id, COUNT(*) AS n_hits
               FROM corpus c JOIN bench USING (g) GROUP BY c.doc_id)
      SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
             CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
             CAST(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_grams AS DOUBLE) AS score
      FROM tot t LEFT JOIN hits h ON t.doc_id = h.doc_id
      ORDER BY t.doc_id"""),
      (s, d) => {
        import graft.queries.Pipeline.wordNgramHashes
        val docs = t(s, d, "documents")
        val grams = docs.select(col("doc_id"), col("source"),
            transform(toks(col("text")), w => xxhash64(w)).as("th"))
          .select(col("doc_id"), col("source"),
            explode(wordNgramHashes(col("th"), 8)).as("g"))
        val bench = grams.filter(col("source") === "src0").select("g").distinct()
        val corpus = grams.filter(col("source") =!= "src0")
        val tot = corpus.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
        val hits = corpus.join(broadcast(bench), "g")
          .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
        tot.join(hits, Seq("doc_id"), "left_outer")
          .select(col("doc_id"), col("n_grams"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"),
            (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_grams"))
              .cast("double").as("score"))
          .orderBy("doc_id")
      }),

    // Per-source length-quantile profile via within-group EXACT DISCRETE
    // percentiles (PERCENTILE_DISC ... WITHIN GROUP per source) — the
    // grouped companion to p40's corpus-global thresholds. Discrete
    // percentiles return actual integer lengths, so the profile is
    // bit-exactly reproducible; the sort-based aggregate runs per source
    // partition (swap in approx_percentile at 100 TB, same shape).
    QE("p44_source_length_profile", Some("""
      SELECT source,
             CAST(QUANTILE_DISC(n_chars, 0.1) AS BIGINT) AS p10,
             CAST(QUANTILE_DISC(n_chars, 0.5) AS BIGINT) AS p50,
             CAST(QUANTILE_DISC(n_chars, 0.9) AS BIGINT) AS p90,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source ORDER BY source"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT source,
                 -- Spark's percentile_disc returns DOUBLE; the picked value
                 -- is an actual integer length, so the BIGINT cast is exact
                 CAST(PERCENTILE_DISC(0.1) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p10,
                 CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p50,
                 CAST(PERCENTILE_DISC(0.9) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS p90,
                 COUNT(*) AS n_docs
          FROM documents GROUP BY source ORDER BY source""")
      }),

    // QUALITY-WEIGHTED sampling: keep probability proportional to a
    // quality signal (type-token ratio here — repetitive docs are kept
    // less often), decided by the same deterministic Knuth multiplicative
    // hash as p17's stratified sampler, so the draw is reproducible on any
    // cluster layout and shuffle-free (one scan, expression-only). The
    // ratio and the threshold comparison run in double with identical op
    // order in both engines — bit-identical keep set.
    QE("p45_quality_weighted_sample", Some("""
      WITH q AS (SELECT doc_id,
                   CAST(len(list_distinct(str_split(text, ' '))) AS DOUBLE) /
                   len(str_split(text, ' ')) AS ttr
                 FROM documents)
      SELECT doc_id, CAST(ttr AS DOUBLE) AS ttr FROM q
      WHERE CAST(((doc_id % 2147483648) * 2654435761) % 2147483647 AS DOUBLE) < ttr * 2147483647.0
      ORDER BY doc_id"""),
      (s, d) => {
        val ts = split(col("text"), " ")
        val ttr = (size(array_distinct(ts)).cast("double") / size(ts)).as("ttr")
        // mask mod 2^31 pre-multiply so the hash never overflows Long (see p17)
        val hk = (((col("doc_id") % lit(2147483648L)) * lit(2654435761L))
          % lit(2147483647L)).cast("double")
        t(s, d, "documents")
          .select(col("doc_id"), ttr, hk.as("hk"))
          .filter(col("hk") < col("ttr") * lit(2147483647.0))
          .select(col("doc_id"), col("ttr").cast("double").as("ttr"))
          .orderBy("doc_id")
      }),

    // GLOBAL token-BUDGET selection: keep the best documents until a
    // corpus-wide token budget is hit (the "we can only afford X training
    // tokens" cut). p36 solves the PER-SOURCE variant with a
    // source-partitioned window — that trick is unavailable here because
    // the budget spans sources, which is exactly what makes the naive
    // formulation a global sort. Order is (n_chars DESC, doc_id) with
    // tokens = n_chars div 4 (the chars-per-token heuristic); budget =
    // half the corpus token mass. A
    // 100 TB global cumulative sum must NOT be a single-partition window
    // over the corpus: phase 1 aggregates token mass per distinct score (a
    // tiny table), cumsums THAT, and finds the boundary score; every full
    // bucket above the boundary is selected by a broadcast range check and
    // only the ONE boundary bucket gets a per-doc window. Corpus-side plan:
    // scan + small-key agg + broadcast join — no global sort. The oracle is
    // the naive whole-corpus window, pinning that the two formulations
    // select the identical document set.
    QE("p54_token_budget_select", Some("""
      WITH d AS (SELECT doc_id, lang, n_chars // 4 AS tok, n_chars FROM documents),
      b AS (SELECT SUM(tok) // 2 AS budget FROM d),
      c AS (SELECT doc_id, lang, tok,
              SUM(tok) OVER (ORDER BY n_chars DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum
            FROM d)
      SELECT lang, COUNT(*) AS n_docs, CAST(SUM(tok) AS BIGINT) AS tokens
      FROM c, b WHERE cum <= budget GROUP BY lang ORDER BY lang"""),
      (s, d) => {
        val docs = t(s, d, "documents")
          .select(col("doc_id"), col("lang"), expr("n_chars div 4").as("tok"),
            col("n_chars"))
        val budget = docs.agg(expr("sum(tok) div 2").as("budget"))
        budgetSelect(docs, budget)
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"), sum("tok").cast("long").as("tokens"))
          .orderBy("lang")
      }),

    // VOCABULARY COVERAGE curve: corpus token frequencies ranked, with
    // cumulative coverage read off at growing vocab checkpoints — the
    // tokenizer-budget decision ("what fraction of the token stream does a
    // top-V vocabulary cover"). One explode→agg pass builds the frequency
    // table (map-side partial agg); the ranked window then runs over the
    // AGGREGATED vocabulary, never the token stream, capped by a
    // take-ordered top-1000 first (at 100 TB the cap would come from the
    // bounded top-k aggregate, q238 — same effect: the single-partition
    // window only ever sees <= 1000 rows). Checkpoint attach is a tiny
    // broadcast theta join; rk <= v (not rk = v) keeps the entry total at
    // any SF where the vocab is smaller than a checkpoint.
    QE("p55_vocab_coverage", Some("""
      WITH tk AS (SELECT unnest(str_split(text, ' ')) AS t FROM documents),
      tc AS (SELECT t, COUNT(*) AS c FROM tk WHERE t <> '' GROUP BY t),
      tot AS (SELECT SUM(c) AS total FROM tc),
      r AS (SELECT t, c, row_number() OVER (ORDER BY c DESC, t) AS rk,
              SUM(c) OVER (ORDER BY c DESC, t ROWS UNBOUNDED PRECEDING) AS cum
            FROM tc)
      SELECT CAST(v AS INT) AS vocab_size, CAST(MAX(cum) AS BIGINT) AS covered,
             CAST(MAX(total) AS BIGINT) AS total
      FROM (VALUES (5), (10), (20)) AS vs(v) JOIN r ON r.rk <= v CROSS JOIN tot
      GROUP BY v ORDER BY vocab_size"""),
      (s, d) => {
        import s.implicits._
        val tc = t(s, d, "documents")
          .select(explode(toks(col("text"))).as("t"))
          .filter(col("t") =!= "")
          .groupBy("t").agg(count(lit(1)).as("c"))
        val tot = tc.agg(sum("c").as("total"))
        val w = Window.orderBy(col("c").desc, col("t"))
        val ranked = tc.orderBy(col("c").desc, col("t")).limit(1000)
          .withColumn("rk", row_number().over(w))
          .withColumn("cum",
            sum(col("c")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        broadcast(Seq(5, 10, 20).toDF("v"))
          .join(ranked, col("rk") <= col("v"))
          .crossJoin(broadcast(tot))
          .groupBy("v")
          .agg(max("cum").as("covered"), max("total").as("total"))
          .select(col("v").cast("int").as("vocab_size"),
            col("covered").cast("long").as("covered"),
            col("total").cast("long").as("total"))
          .orderBy("vocab_size")
      }),

    // CROSS-DOCUMENT SEGMENT DEDUP (C4-style): split every document into
    // consecutive 16-token segments, keep only each distinct segment's
    // FIRST occurrence corpus-wide (ordered by doc_id, seg_idx), and report
    // per-document segment retention. The C4 pipeline does this at the
    // line/sentence level; the driver corpus has no line structure, so the
    // unit is the fixed token segment — the dedup semantics (global exact
    // first-wins on the segment text) are the same. Segmentation is
    // expression-only (sequence+slice, no shuffle); the first-occurrence
    // pick is ONE window hash-partitioned by segment text. At 100 TB the
    // partition key would be a 128-bit segment hash so the shuffle carries
    // 16 bytes instead of the text (first-wins then needs one
    // confirm-join); the plan shape is identical.
    QE("p58_segment_dedup", Some(s"""
      WITH tk AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents),
      segs AS (SELECT doc_id, unnest(generate_series(0, (len(ts) - 1) // $SegTokens)) AS seg_idx, ts
               FROM tk),
      seg2 AS (SELECT doc_id, seg_idx,
                 array_to_string(ts[(seg_idx * $SegTokens + 1):((seg_idx + 1) * $SegTokens)], ' ') AS seg
               FROM segs),
      fl AS (SELECT doc_id, seg_idx,
               row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn
             FROM seg2)
      SELECT doc_id, COUNT(*) AS n_seg,
             CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept_seg,
             CAST(SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS BIGINT) AS dup_seg
      FROM fl GROUP BY doc_id ORDER BY doc_id"""),
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"), toks(col("text")).as("ts"))
        val segs = tk
          .select(col("doc_id"),
            posexplode(transform(
              sequence(lit(0), floor((size(col("ts")) - 1) / lit(SegTokens)).cast("int")),
              i => concat_ws(" ", slice(col("ts"), i * SegTokens + 1, lit(SegTokens)))))
              .as(Seq("seg_idx", "seg")))
        val rn = row_number().over(
          Window.partitionBy("seg").orderBy("doc_id", "seg_idx"))
        segs.withColumn("rn", rn)
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_seg"),
            sum(when(col("rn") === 1, 1L).otherwise(0L)).as("kept_seg"),
            sum(when(col("rn") === 1, 0L).otherwise(1L)).as("dup_seg"))
          .orderBy("doc_id")
      }),

    // EXACT-SUBSTRING DUPLICATION COVERAGE (Lee et al. 2021,
    // "Deduplicating Training Data Makes Language Models Better"): slide a
    // 16-token window with stride 1 over every document, mark windows whose
    // exact text occurs more than once corpus-wide, and measure how much of
    // each document the duplicated spans COVER — the statistic that decides
    // whether to cut the span or drop the document. Coverage is computed as
    // an interval union without materializing per-token rows: duplicated
    // starts are sorted per document and each contributes
    // min(W, next_start - start) tokens (the classic sorted-interval-union
    // fold, here as one lead() window per doc). Global dup marking is one
    // count-over-window hash-partitioned by window text; everything else is
    // expression-only or per-doc windows. At 100 TB the window key would be
    // a 128-bit hash (Lee et al. use a suffix array; the hash-window
    // formulation is the map-reduce-friendly equivalent) — same plan shape.
    QE("p59_substring_dup_coverage", Some(s"""
      WITH tk AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents),
      w AS (SELECT doc_id, len(ts) AS n, unnest(generate_series(0, len(ts) - $SubW)) AS st, ts
            FROM tk WHERE len(ts) >= $SubW),
      wt AS (SELECT doc_id, st, array_to_string(ts[(st + 1):(st + $SubW)], ' ') AS wtext FROM w),
      fl AS (SELECT doc_id, st, COUNT(*) OVER (PARTITION BY wtext) > 1 AS dup FROM wt),
      dups AS (SELECT doc_id, st,
                 lead(st) OVER (PARTITION BY doc_id ORDER BY st) AS nx
               FROM fl WHERE dup),
      cov AS (SELECT doc_id,
                SUM(LEAST($SubW, COALESCE(nx - st, $SubW))) AS covered,
                COUNT(*) AS n_dup
              FROM dups GROUP BY doc_id)
      SELECT tk.doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
             CAST(GREATEST(len(ts) - ${SubW - 1}, 0) AS BIGINT) AS n_windows,
             CAST(COALESCE(cov.n_dup, 0) AS BIGINT) AS n_dup_windows,
             CAST(COALESCE(cov.covered, 0) AS BIGINT) AS covered_tokens,
             CAST(COALESCE(cov.covered, 0) AS DOUBLE) / len(ts) AS dup_frac
      FROM tk LEFT JOIN cov ON cov.doc_id = tk.doc_id
      ORDER BY tk.doc_id"""),
      (s, d) => {
        val tk = t(s, d, "documents")
          .select(col("doc_id"), toks(col("text")).as("ts"))
          .withColumn("n", size(col("ts")))
        val wt = tk.filter(col("n") >= SubW)
          .select(col("doc_id"),
            explode(sequence(lit(0), col("n") - SubW)).as("st"), col("ts"))
          .select(col("doc_id"), col("st"),
            concat_ws(" ", slice(col("ts"), col("st") + 1, lit(SubW))).as("wtext"))
        val dup = count(lit(1)).over(Window.partitionBy("wtext")) > 1
        val dups = wt.withColumn("dup", dup).filter(col("dup"))
          .withColumn("nx",
            lead(col("st"), 1).over(Window.partitionBy("doc_id").orderBy("st")))
        val cov = dups.groupBy("doc_id")
          .agg(sum(least(lit(SubW), coalesce(col("nx") - col("st"), lit(SubW))))
            .as("covered"),
            count(lit(1)).as("n_dup"))
        tk.join(cov, Seq("doc_id"), "left")
          .select(col("doc_id"),
            col("n").cast("long").as("n_tokens"),
            greatest(col("n") - (SubW - 1), lit(0)).cast("long").as("n_windows"),
            coalesce(col("n_dup"), lit(0L)).as("n_dup_windows"),
            coalesce(col("covered"), lit(0L)).as("covered_tokens"),
            (coalesce(col("covered"), lit(0L)).cast("double") / col("n")).as("dup_frac"))
          .orderBy("doc_id")
      }))

  /** p58 segment length (tokens) — the C4-style dedup unit. `final` with a
    * literal so it constant-folds (it is referenced from `entries`, which
    * initializes before non-constant vals declared after it).
    */
  private final val SegTokens = 16
  /** p59 sliding-window width (tokens) — Lee et al.'s matching length. */
  private final val SubW = 16
}
