package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (SURVEY.md "salting for skew";
  * the 100 TB design point). AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default in Engine)
  * handles sort-merge skew at runtime; explicit salting remains the
  * tool when one side must be replicated (hot-key equi-join against a
  * moderate dimension that is too big to broadcast whole but fine to
  * replicate `salt`×).
  */
object Skew {

  /** Equi-join `big ⋈ dim` on `key` with the big side salted into
    * `salt` sub-keys and the dim side replicated once per salt value.
    * Result is row-identical to the plain join; the shuffle spreads
    * each hot key over `salt` reducers.
    *
    * The salt is derived from xxhash64 of the whole big-side row (not
    * rand()) so re-executed tasks produce identical partitioning —
    * required for deterministic retries at scale.
    */
  def saltedJoin(
      big: DataFrame,
      dim: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    // dim-side replication is only transparent when the big side
    // drives the join; right/full outer would emit per-salt
    // null-padded duplicates for unmatched dim rows
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace("_", "")) ||
      allowed.contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types, got $joinType")
    val bigCols = big.columns.map(col)
    val big2 = big.withColumn("_salt",
      pmod(xxhash64(bigCols: _*), lit(salt)).cast("int"))
    val dim2 = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    big2.join(dim2, Seq(key, "_salt"), joinType).drop("_salt")
  }
}
