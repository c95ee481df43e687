package graft.queries

import graft.Catalog
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 extensions: two more production shapes for the 100 TB
  * curation pipeline —
  *
  *  - INCREMENTAL MinHash-LSH dedup (ns_dedup_incremental_minhash):
  *    the sketch tier joins the incremental family (shingle r10,
  *    winnowing r10) — a new shard's band buckets probed against the
  *    standing bucket index, verified against the standing signature
  *    table, signing only the shard
  *    (operators/Dedup.{buildMinHashIndex,probeIncrementalMinhash});
  *  - BUDGET-CONSTRAINED selection (ns_select_budget): fill a token
  *    budget with the best-scoring documents first — the "select the
  *    top-quality N billion tokens for this run" operator, computed
  *    as a distributed prefix sum instead of the single-task
  *    global-order window (operators/Curate.selectByBudget).
  */
object Round11Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ── Incremental sketch-tier dedup: probe the odd half against a
    // standing MinHash index over the even half. The index here is
    // served from the memoized corpus signature artifact (filtering a
    // per-doc signature table by id parity IS the standing table —
    // sketches never depend on other docs), so neither side is
    // re-tokenized; production loads the same two frames via
    // Dedup.loadMinHashIndex. The ORACLE is deliberately the
    // BATCH-GLOBAL banding restricted to cross-half pairs: MinHash
    // band buckets are corpus-independent, so a hash match verifies
    // that probe-against-index equals the batch rebuild's cross
    // pairs — the tier's increment-equals-rebuild theorem.
    QueryDef(
      "ns_dedup_incremental_minhash",
      Some(PipelineQueries.shingleCte + PipelineQueries.minhashCandCte +
        """,
        candx AS (SELECT DISTINCT a.doc_id ida, b.doc_id idb
                  FROM bands a JOIN bands b
                    ON a.b = b.b AND a.bucket = b.bucket
                   AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1),
        jac AS (SELECT c.ida, c.idb,
                  len(list_intersect(x.hh, y.hh))::DOUBLE /
                  len(list_distinct(list_concat(x.hh, y.hh))) j
                FROM candx c JOIN sh x ON x.doc_id = c.ida
                             JOIN sh y ON y.doc_id = c.idb)
        SELECT ida, idb, ROUND(j, 3) AS j FROM jac
        WHERE j >= 0.8 ORDER BY ida, idb"""),
      (s, dir) => {
        val sh = PipelineQueries.hashedShingled(s, dir)
          .withColumnRenamed("doc_id", "id")
        val standing = sh.filter(col("id") % 2 === 0)
        val index = graft.operators.Dedup.MinHashIndex(
          graft.operators.Dedup.bandedBuckets(standing), standing)
        graft.operators.Dedup.probeMinhashFromSignatures(
            sh.filter(col("id") % 2 === 1), index)
          .select(col("ida"), col("idb"),
            round(col("jaccard"), 3).as("j"))
          .orderBy("ida", "idb")
      }),

    // ── Budget-constrained selection: rank by fixed-point type-token
    // ratio (distinct tokens per token, ×10⁶, exact BIGINT division
    // on both engines — float scores would tie-break differently),
    // keep docs while cumulative token count stays within 15 000
    // (~the better half of the sf0.01 corpus). The oracle's
    // single-window running sum is the semantic spec; the Spark side
    // is the distributed prefix sum (range repartition +
    // per-partition windows + broadcast offsets) — the hash match
    // pins the two formulations equal.
    QueryDef(
      "ns_select_budget",
      Some("""WITH tk AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') tk
                FROM documents),
              sc AS (SELECT doc_id,
                     CAST(len(tk) AS BIGINT) n_tok,
                     CASE WHEN len(tk) = 0 THEN 0
                       ELSE (CAST(len(list_distinct(tk)) AS BIGINT)
                             * 1000000) // len(tk) END score
                     FROM tk),
              c AS (SELECT doc_id, n_tok, score,
                    SUM(n_tok) OVER (ORDER BY score DESC, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      cum_w
                    FROM sc)
              SELECT doc_id, n_tok, score, cum_w FROM c
              WHERE cum_w <= 15000 ORDER BY doc_id"""),
      (s, dir) => {
        val scored = t(s, dir, "documents")
          .withColumn("n_tok",
            size(TF.tokens(col("text"))).cast("long"))
          .withColumn("__graft_ndis",
            size(array_distinct(TF.tokens(col("text")))).cast("long"))
          .withColumn("score",
            when(col("n_tok") === 0, lit(0L))
              .otherwise(expr("(__graft_ndis * 1000000) DIV n_tok")))
          .select("doc_id", "n_tok", "score")
        graft.operators.Curate.selectByBudget(
            scored, "doc_id", "score", "n_tok", budget = 15000L)
          .select("doc_id", "n_tok", "score", "cum_w")
          .orderBy("doc_id")
      }),
  )
}
