package graft.queries

import graft.Catalog
import graft.functions.{QuantileSketch => QS}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-18 rows: corpus profiling through the MERGEABLE quantile
  * sketch (VERDICT r17 missing #3) — per-shard sketches at write
  * time, sketch UNION at query time, quantiles out of the union:
  * the never-rescan-history pattern the HLL distinct-count goldens
  * already prove, now for percentiles.
  *
  * Reference analog: the display summarizes a round's readings from
  * per-slave summaries rather than re-polling history
  * (master/master.ino:151-168) — merge summaries, not raw samples.
  */
object Round18Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  def defs: Seq[QueryDef] = Seq(

    // ── Per-language document-length percentiles, computed as
    // per-(lang, source) shard sketches UNIONED per lang — both
    // halves of the sketch pair sit on the oracle path. The row runs
    // in the sketch's LOSSLESS regime (every union holds ≤ k items:
    // ≤5k docs per lang at every oracle sf vs k = 2¹⁶), where
    // quantiles are exact-rank percentile_disc answers over the
    // exact multiset — independent of row and merge order — so the
    // hash pins the full agg→serialize→union→query chain against
    // DuckDB's quantile_disc. Probabilities are exact binary
    // fractions (¼, ½, ¾) so the q·N threshold is the same double on
    // both engines. Lossy-regime behavior (bounded rank error at
    // n ≫ k) is covered by the ExtensionsSpec merge-equals-global
    // golden, which the oracle cannot see.
    QueryDef(
      "ns_profile_quantiles",
      Some("""SELECT lang,
                quantile_disc(n_chars::DOUBLE, 0.25) AS q25,
                quantile_disc(n_chars::DOUBLE, 0.50) AS q50,
                quantile_disc(n_chars::DOUBLE, 0.75) AS q75
              FROM documents GROUP BY lang ORDER BY lang"""),
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy(col("lang"), col("source"))
          .agg(QS.sketchAgg(col("n_chars"), k = 1 << 16).as("sk"))
          .groupBy(col("lang"))
          .agg(QS.sketchUnionAgg(col("sk")).as("sk"))
          .select(col("lang"),
            QS.sketchQuantiles(col("sk"), Seq(0.25, 0.50, 0.75)).as("qs"))
          .select(col("lang"),
            element_at(col("qs"), 1).as("q25"),
            element_at(col("qs"), 2).as("q50"),
            element_at(col("qs"), 3).as("q75"))
          .orderBy("lang")),

    // ── Embedding Gram matrix, the distributed face of the PCA fit
    // (operators/Pca.scala): ONE narrow pass accumulates all 64×64
    // moments in a fixed-size buffer (TypedImperativeAggregate;
    // map-side partial merge = matrix addition, driver sees one row)
    // vs the oracle's 2M-row cross-join formulation. Fixed-point
    // cells (Σ floor(xᵢ·xⱼ·10⁶) BIGINT — exact long addition,
    // order-independent) so the hash pins every one of the 4096
    // entries cross-engine; the double-precision fit and codegen
    // projection are pinned by PcaSpec's algebraic goldens.
    QueryDef(
      "ns_embed_gram",
      Some("""SELECT i, j,
                CAST(SUM(CAST(FLOOR(CAST(embedding[CAST(i+1 AS INT)] AS DOUBLE)
                  * CAST(embedding[CAST(j+1 AS INT)] AS DOUBLE)
                  * 1000000) AS BIGINT)) AS BIGINT) AS g
              FROM embeddings, range(64) t1(i), range(64) t2(j)
              GROUP BY i, j ORDER BY i, j"""),
      (s, dir) =>
        graft.operators.Pca.gramFixedPoint(
            t(s, dir, "embeddings"), "embedding", d = 64)
          .select(col("i").cast("long").as("i"),
            col("j").cast("long").as("j"), col("g"))
          .orderBy("i", "j")),

    // ── Corpus heavy hitters through the MERGEABLE Misra-Gries
    // sketch (functions/FrequencySketch.scala) — the frequency leg of
    // the profiling trio (HLL distincts, KLL quantiles, MG
    // frequencies): per-source shard sketches over token BIGRAMS,
    // UNIONED, top 40 by (count DESC, gram ASC). Runs in the sketch's
    // LOSSLESS regime (≤1k distinct bigrams at oracle sfs vs k = 2¹⁷:
    // no decrement ever fires, counts exact and order-independent),
    // so the hash pins the full agg→serialize→union→top-k chain
    // against a plain GROUP BY; the lossy n/(k+1) bound is pinned by
    // PropertySpec, which the oracle cannot see.
    QueryDef(
      "ns_profile_heavyhitters",
      Some("""WITH tk AS (SELECT list_filter(string_split(lower(text), ' '),
                x -> x <> '') tk FROM documents),
              bg AS (SELECT unnest([tk[i] || ' ' || tk[i+1]
                       for i in range(1, len(tk))]) g
                     FROM tk WHERE len(tk) >= 2)
              SELECT g AS token, CAST(COUNT(*) AS BIGINT) AS cnt
              FROM bg GROUP BY g ORDER BY cnt DESC, token LIMIT 40"""),
      (s, dir) => {
        import graft.functions.{FrequencySketch => FS,
          TextFunctions => TF}
        t(s, dir, "documents")
          .select(col("source"),
            explode(graft.plans.WordNgrams(TF.tokens(col("text")), 2,
              distinct = false)).as("g"))
          .groupBy(col("source"))
          .agg(FS.freqAgg(col("g")).as("sk"))
          .agg(FS.freqUnionAgg(col("sk")).as("sk"))
          .select(explode(FS.freqTopK(col("sk"), 40)).as("e"))
          .select(col("e.token").as("token"), col("e.cnt").as("cnt"))
          .orderBy(col("cnt").desc, col("token"))
      }),
  )
}
