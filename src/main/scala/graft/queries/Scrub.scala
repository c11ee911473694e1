package graft.queries

import graft.{QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Training-corpus preparation operators beyond the reference's surface:
  * PII / blocklist scrubbing and fixed-budget sequence packing — both
  * expression-only single-pass transforms (codegen'd, no shuffle beyond the
  * final aggregation), so they stream through a 100 TB corpus at scan speed.
  */
object Scrub {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  /** One alternation scanned once per document: blocklisted terms that occur
    * in this corpus, plus email and IPv4 shapes (standard PII scrub targets;
    * the regex dialect is the RE2-compatible subset so Spark's Java engine
    * and the oracle agree). Non-capturing groups keep extract-all at match 0.
    */
  private val ScrubPattern =
    "\\b(?:customer|supplier)\\b" +
      "|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" +
      "|\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Pack budget in whitespace tokens: documents are concatenated in doc_id
    * order within their source shard and split at budget boundaries — the
    * standard concat-then-chunk LLM pretraining packing. Packing per source
    * shard (not globally) is the scale choice: no global sort, one window
    * pass per shard partition.
    */
  private val PackTokens = 512L

  val entries: Seq[QE] = Seq(
    QE("p20_pii_scrub", Some(s"""
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '$ScrubPattern')) AS BIGINT) AS n_redactions,
             md5(regexp_replace(text, '$ScrubPattern', '[REDACTED]', 'g')) AS clean_md5,
             CAST(length(regexp_replace(text, '$ScrubPattern', '[REDACTED]', 'g')) AS BIGINT)
               AS clean_chars
      FROM documents ORDER BY doc_id"""),
      (s, d) => {
        val clean = regexp_replace(col("text"), ScrubPattern, "[REDACTED]")
        t(s, d, "documents").select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(ScrubPattern), lit(0)))
            .cast("long").as("n_redactions"),
          md5(clean).as("clean_md5"),
          length(clean).cast("long").as("clean_chars"))
          .orderBy("doc_id")
      }),

    QE("p21_seq_packing", Some(s"""
      WITH toks AS (SELECT doc_id, source,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
      c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                          ROWS UNBOUNDED PRECEDING) AS cum
            FROM toks)
      SELECT source, CAST(FLOOR((cum - n_tokens) / $PackTokens.0) AS BIGINT) AS pack_id,
             COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
             MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      FROM c GROUP BY source, pack_id
      ORDER BY source, pack_id"""),
      (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tokens"))
          .withColumn("cum", sum("n_tokens").over(w))
          .withColumn("pack_id", floor((col("cum") - col("n_tokens")) / lit(PackTokens)))
          .groupBy("source", "pack_id")
          .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .orderBy("source", "pack_id")
      }),

    // Symmetric int8 quantization of the embedding column (the standard 4x
    // storage cut for vector stores): per-vector max-abs scale, codes
    // round(x/scale) in [-127,127] by construction, plus the exact L2
    // reconstruction error. Expression-only single pass; the scale is bound
    // to a real column before the element lambda references it (an inline
    // expression would re-evaluate the array_max per element). The error
    // fold starts at 0.0, and 0.0 + x is exact in IEEE, so Spark's
    // zero-seeded fold and DuckDB's seedless list_reduce agree bit-for-bit
    // (same trick as the p06 dot product).
    // An all-zero embedding gives scale=0; dividing by it would make q_err
    // NaN in Spark while DuckDB's division semantics differ — both sides
    // short-circuit degenerate vectors to q_err=0.0 (codes are all zero, so
    // reconstruction is exact by definition).
    QE("p23_embed_quantize", Some("""
      WITH s AS (SELECT vec_id,
                   list_max(list_transform(embedding,
                     v -> abs(CAST(v AS DOUBLE)))) / 127.0 AS scale,
                   embedding
                 FROM embeddings)
      SELECT vec_id, scale,
             CASE WHEN scale = 0 THEN 0.0
                  ELSE list_reduce(list_transform(embedding,
                    v -> pow(CAST(v AS DOUBLE) - round(CAST(v AS DOUBLE) / scale) * scale, 2)),
                    (a, b) -> a + b) END AS q_err
      FROM s ORDER BY vec_id"""),
      (s, d) => {
        val x = col("embedding")
        val scale = array_max(transform(x, v => abs(v.cast(DoubleType)))) / 127.0
        t(s, d, "embeddings")
          .select(col("vec_id"), scale.as("scale"), x)
          .select(col("vec_id"), col("scale"),
            when(col("scale") === 0, lit(0.0)).otherwise(
              aggregate(
                transform(x, v =>
                  pow(v.cast(DoubleType) - round(v.cast(DoubleType) / col("scale")) * col("scale"), 2)),
                lit(0.0), (a, b) => a + b)).as("q_err"))
          .orderBy("vec_id")
      }))
}
