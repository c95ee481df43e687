package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 rows: the substring tier's component-consumer surface.
  *
  * VERDICT r13 found the one genuine 100 TB scale-killer in the repo:
  * the winnowing pair join emitted C(g, 2) pairs per shared
  * fingerprint group (251 s at sf3 on 30-way dup clusters; real crawl
  * corpora have clusters in the thousands). The fix splits the
  * consumers: verified-pairs callers get the rank-capped
  * discover-verify dataflow (ns_dedup_substring, Round9Queries), and
  * component/apply callers — who only ever feed the pairs into
  * connected components — get STAR EDGES: each fingerprint group
  * contributes (group-min ↔ member) edges only, O(g) per group with
  * provably identical components (a group's clique and its star
  * connect the same nodes; DedupApiSpec asserts the label equality
  * differentially against the exhaustive pair graph).
  *
  * Reference analog: the firmware never re-polls an answered slave
  * (master/master.ino:218-220) — don't re-enumerate a pair the
  * component already implies.
  */
object Round14Queries {

  def defs: Seq[QueryDef] = Seq(

    // ── Substring-tier star edges: the O(g)-per-group edge set a
    // dedup pipeline feeds into connected components when cluster
    // labels (not the pair list) are the product. Same winnow
    // fingerprints + corpus-proportional df cap as
    // ns_dedup_substring; the oracle mirrors the star construction
    // (min per fingerprint group) directly.
    QueryDef(
      "ns_dedup_substring_star",
      Some("""WITH n AS (SELECT GREATEST(16, COUNT(*) // 31) cap
                FROM documents),
              h AS (SELECT doc_id, [(
                  unicode(substring(text, i, 1))::BIGINT * 1604566856
                + unicode(substring(text, i + 1, 1))::BIGINT * 1049561761
                + unicode(substring(text, i + 2, 1))::BIGINT * 1426104154
                + unicode(substring(text, i + 3, 1))::BIGINT * 1000003
                + unicode(substring(text, i + 4, 1))::BIGINT)
                % 2147483647
                for i in range(1, length(text) - 3)] hs FROM documents),
              u AS (SELECT doc_id, UNNEST(hs) h,
                    generate_subscripts(hs, 1) pos
                    FROM h WHERE len(hs) >= 1),
              wm AS (SELECT doc_id, pos, len,
                     MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW) wmin
                     FROM (SELECT *, COUNT(*) OVER (PARTITION BY doc_id) len
                           FROM u)),
              p AS (SELECT DISTINCT doc_id, wmin fp FROM wm
                    WHERE pos >= LEAST(16, len)),
              keep AS (SELECT fp FROM p CROSS JOIN n GROUP BY fp, n.cap
                       HAVING COUNT(*) <= n.cap),
              pp AS (SELECT p.doc_id, p.fp FROM p JOIN keep USING (fp)),
              m AS (SELECT fp, MIN(doc_id) mn FROM pp GROUP BY fp)
              SELECT DISTINCT m.mn AS a, pp.doc_id AS b
              FROM pp JOIN m USING (fp) WHERE pp.doc_id > m.mn
              ORDER BY a, b"""),
      (s, dir) =>
        graft.operators.Dedup.winnowStarEdges(
            PipelineQueries.winnowPostings(s, dir))
          .orderBy("a", "b")))
}
