package graft.queries

import graft.Catalog
import graft.operators.Curate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 rows: vocab-mapped tokenization — the "text → token-id
  * sequence" step a training-data pipeline runs after curation and
  * before packing, absent from the inventory until now (token COUNTS
  * existed; the id MAPPING did not).
  *
  * Reference analog: the master maps free-form slave addresses to the
  * fixed registry's slot indices before assembling the round record
  * (master/master.ino:23-26,151-168) — a dictionary lookup with an
  * explicit out-of-registry path, which is exactly vocab mapping with
  * OOV = id 0.
  */
object Round17Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  def defs: Seq[QueryDef] = Seq(

    // ── Vocab build + token-id mapping, verified end to end by a
    // position-weighted checksum (Σ pos·id, exact BIGINT): an
    // order-sensitive functional of the WHOLE id sequence, so the
    // differential hash pins every token's id and position without
    // shipping corpus-sized (doc, pos, id) rows through the oracle.
    // vocabSize=16 on the 31-token synthetic corpus keeps the OOV
    // path and the rank-boundary tie (counts 908/908 at ranks 15-16,
    // broken by token ASC) both load-bearing; the API default is
    // 4096. Scale shape (A/B table in Curate.tokenizeWithVocab):
    // model-small vocabs route to the fused TokenIdStats kernel —
    // one codegen'd byte walk per doc, no explode/join/agg exchange;
    // past the model budget the broadcast-join tier keeps the only
    // shuffle at O(docs) rows.
    QueryDef(
      "ns_tokenize_vocab",
      Some("""WITH tk AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') tk
                FROM documents),
              occ AS (SELECT doc_id, UNNEST([{'p': i, 't': tk[i]}
                        for i in range(1, len(tk)+1)], recursive := true)
                      FROM tk WHERE len(tk) >= 1),
              cnt AS (SELECT t tok, CAST(COUNT(*) AS BIGINT) c
                      FROM occ GROUP BY 1),
              voc AS (SELECT tok, CAST(rn AS BIGINT) id FROM
                        (SELECT tok, c,
                           ROW_NUMBER() OVER (ORDER BY c DESC, tok) rn
                         FROM cnt) WHERE rn <= 16),
              m AS (SELECT occ.doc_id, occ.p, COALESCE(voc.id, 0) tid
                    FROM occ LEFT JOIN voc ON occ.t = voc.tok)
              SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tok,
                CAST(SUM(CASE WHEN tid = 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_oov,
                CAST(SUM(p * tid) AS BIGINT) AS checksum
              FROM m GROUP BY 1 ORDER BY doc_id"""),
      (s, dir) =>
        Curate.tokenizeWithVocab(
            t(s, dir, "documents"), "doc_id", "text", vocabSize = 16)
          .select(col("doc_id"), col("n_tok"), col("n_oov"), col("checksum"))
          .orderBy("doc_id")),
  )
}
