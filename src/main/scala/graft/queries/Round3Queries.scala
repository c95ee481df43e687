package graft.queries

import graft.Catalog
import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 extensions: the generalized as-of join (J6 as a public
  * API over arbitrary tables), two more TPC-H shapes (Q18 big
  * orders, Q10 returned revenue), document chunking for training
  * sequences, batch ANN (many probes at once — the real serving
  * shape), hourly gap-fill + forward-fill, hopping windows,
  * containment and TF-IDF-cosine similarity tiers, typed VARIANT
  * extraction, a recursive-CTE date spine, and stratified
  * content-hash sampling.
  */
object Round3Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // J6 generalized — as-of join across two DIFFERENT tables via the
    // public AsOf operator: each event picks the user's latest order
    // as of the event time. One union + one shuffle+sort, linear —
    // no per-key quadratic join (DuckDB's native ASOF JOIN is the
    // oracle). Build side pre-aggregated to unique (key, time) so
    // tie-breaks are deterministic on both engines.
    QueryDef(
      "q59_asof_join",
      Some("""WITH b AS (SELECT o_custkey k, o_orderdate tt,
                MAX(o_orderkey) AS last_order
                FROM orders GROUP BY 1, 2)
              SELECT e.event_id, b.last_order
              FROM events e ASOF LEFT JOIN b
                ON e.user_id = b.k AND b.tt <= e.ts::TIMESTAMP
              ORDER BY e.event_id"""),
      (s, dir) => {
        val probe = t(s, dir, "events")
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("t_us"))
        // the oracle's pre-aggregate CTE (MAX(o_orderkey) per (cust,
        // date)) exists only to make the tie deterministic — the
        // tieBreak column folds that into the as-of sort itself, so
        // the build side goes in RAW and the whole groupBy shuffle
        // stage disappears (VERDICT r17 #1): latest date wins, and at
        // equal date the greatest orderkey wins, exactly the CTE's
        // semantics. Routed to the COMPACT tier (per-key sorted
        // history arrays + codegen binary search — AsOf scaladoc):
        // per-customer order counts are bounded at every sf, the
        // shape this tier exists for; the union-window plain tier
        // stays oracle-pinned via q29, bucketed via q69.
        val build = t(s, dir, "orders")
          .select(col("o_custkey").as("k"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("bt"),
            col("o_orderkey").as("last_order"))
        graft.operators.AsOf.joinLatestCompact(
            probe, build, Seq("user_id"), Seq("k"), "t_us", "bt",
            valueCols = Seq("last_order"), strict = false,
            tieBreak = Seq("last_order"))
          .select("event_id", "last_order")
          .orderBy("event_id")
      }),

    // ── Curation: fixed-size token chunking with overlap — the long-
    // document → training-sequence splitter (chunk i covers tokens
    // [i·48, i·48+64), 16-token overlap). Narrow transform + explode:
    // linear, no shuffle; at 100 TB it's a map-only job.
    QueryDef(
      "ns_chunk_documents",
      Some("""WITH tk AS (SELECT doc_id,
                list_filter(string_split(lower(text), ' '), x -> x <> '') tt
                FROM documents),
              n AS (SELECT doc_id, tt, len(tt) n FROM tk WHERE len(tt) > 0),
              c AS (SELECT doc_id, u.i AS chunk_id,
                      list_slice(tt, u.i*48 + 1, u.i*48 + 64) ch
                    FROM n, UNNEST([ii for ii in
                      range(0, greatest(0, (n - 16 - 1)//48) + 1)]) u(i))
              SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
                CAST(len(ch) AS INT) AS n_tok,
                array_to_string(ch, ' ') AS chunk_text
              FROM c ORDER BY doc_id, chunk_id"""),
      (s, dir) =>
        graft.operators.Curate.chunkDocuments(
            t(s, dir, "documents").select("doc_id", "text"),
            "doc_id", "text", maxTokens = 64, overlap = 16)
          .select(col("doc_id"), col("chunk_id"), col("n_tok"),
            col("chunk_text"))
          .orderBy("doc_id", "chunk_id")),

    // ── Similarity search, batched: top-5 neighbors for EVERY probe
    // in one pass (the production serving shape — point lookups
    // amortize nothing). Same banded hyperplane-LSH candidate
    // prefilter as ns_dedup_embed_cosine, then exact cosine + a
    // per-probe rank window. Scale shape: shuffles on (band, bucket)
    // and on probe_id only — never the all-pairs space.
    QueryDef(
      "ns_ann_batch_topk",
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v,
                sqrt(list_dot_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[])) nrm
                FROM embeddings),
              pl AS (SELECT p,
                [(('0x' || substring(md5(p::VARCHAR || ':' || d::VARCHAR),
                   1, 15))::BIGINT / 576460752303423488.0) - 1.0
                 for d in range(0, 64)] plane
                FROM range(8) t(p)),
              bk AS (SELECT e.vec_id, pl.p // 2 AS band,
                SUM(CASE WHEN list_dot_product(e.v, pl.plane) > 0
                    THEN (1 << (pl.p % 2)) ELSE 0 END)::INT bucket
                FROM e, pl GROUP BY e.vec_id, pl.p // 2),
              cand AS (SELECT DISTINCT p.vec_id pid, b.vec_id cid
                       FROM bk p JOIN bk b
                         ON p.band = b.band AND p.bucket = b.bucket
                         AND p.vec_id <> b.vec_id
                       WHERE p.vec_id % 50 = 0),
              sc AS (SELECT c.pid, c.cid,
                       list_dot_product(x.v, y.v) / (x.nrm * y.nrm) cos
                     FROM cand c JOIN e x ON x.vec_id = c.pid
                                 JOIN e y ON y.vec_id = c.cid),
              rk AS (SELECT pid, cid, cos,
                       ROW_NUMBER() OVER (PARTITION BY pid
                         ORDER BY cos DESC, cid) rn
                     FROM sc)
              SELECT pid AS probe_id, CAST(rn AS INT) AS rnk,
                cid AS vec_id, ROUND(cos, 4) AS cos
              FROM rk WHERE rn <= 5 ORDER BY probe_id, rnk"""),
      (s, dir) => {
        val e = PipelineQueries.normEmbeddings(s, dir)
        // both join sides serve from the write-once ANN bucket index
        // (4×2 recall-biased banding) — serving never re-hashes.
        // PROBE side (the serving batch) is size-routed to broadcast:
        // the corpus-side index streams map-side through the band
        // match and the probe-vector attach, so the only wide
        // exchanges left are the candidate→corpus rerank join and the
        // top-k shuffle (round 20: the sf0.1 wall was 8 stages of
        // scheduling floor over ~0.35 s of executor work).
        val bands = PipelineQueries.annBandBuckets(s, dir)
        val probeBands = graft.operators.Joins.broadcastIfSmall(
          bands.filter(col("vec_id") % 50 === 0)
            .select(col("vec_id").as("pid"), col("band"), col("bucket")),
          bands)
        val probeVecs = graft.operators.Joins.broadcastIfSmall(
          e.filter(col("vec_id") % 50 === 0)
            .select(col("vec_id").as("pid"), col("v").as("xv"),
              col("nrm").as("xn")),
          e)
        // no pre-join .distinct(): a pair surfaces once per matching
        // band (≤4 copies) and the duplicates die in the top-k heap
        // (TopK.perKey distinct — the order ends in the unique cid,
        // so ties ARE duplicates); that folds the dedup exchange into
        // the shuffle the top-k already pays
        val cand = bands
          .select(col("vec_id").as("cid"), col("band"), col("bucket"))
          .join(probeBands, Seq("band", "bucket"))
          .filter(col("pid") =!= col("cid"))
          .select("pid", "cid")
        // exact-cosine rerank: candidate stream joins the corpus
        // vectors on cid — the embedding table is O(corpus), never
        // broadcast it
        val scored = cand
          .join(probeVecs, "pid")
          .join(e.select(col("vec_id").as("cid"), col("v").as("yv"),
            col("nrm").as("yn")), "cid")
          .withColumn("cos",
            SF.dot(col("xv"), col("yv")) / (col("xn") * col("yn")))
        // per-probe top-5 through the custom bounded-heap operator
        // (graft.operators.TopK) — no full per-probe sort of the
        // candidate scores; the rank column is then a window over the
        // ≤5 surviving rows per probe, not the full candidate set
        graft.operators.TopK.perKey(scored.select("pid", "cid", "cos"),
            Seq("pid"), Seq(col("cos").desc, col("cid")), 5,
            distinct = true)
          .withColumn("rnk", row_number().over(
            Window.partitionBy("pid").orderBy(col("cos").desc, col("cid"))))
          .select(col("pid").as("probe_id"), col("rnk"),
            col("cid").as("vec_id"), round(col("cos"), 4).as("cos"))
          // output is ≤ |probe batch| × k rows (both contract-bounded),
          // so a single-partition sort replaces orderBy's
          // range-partition sampling job
          .coalesce(1).sortWithinPartitions("probe_id", "rnk")
      }),

    // W-family extension — hourly gap-fill + forward-fill: the
    // "display shows the last known reading" semantics as a batch
    // resample (reference prototype_2:49-70 keeps the previous weight
    // on screen between rounds). Per user: generate the full hourly
    // grid between first and last event, average readings into their
    // hour (decimal-sum determinism), forward-fill empty hours with
    // the last non-null value. Linear: one groupBy + one explode +
    // one window, all partitioned by user.
    QueryDef(
      "q60_gapfill_ffill",
      Some("""WITH b AS (SELECT user_id,
                date_trunc('hour', MIN(ts::TIMESTAMP)) h0,
                date_trunc('hour', MAX(ts::TIMESTAMP)) h1
                FROM events WHERE user_id <= 10 GROUP BY 1),
              hrs AS (SELECT user_id, UNNEST(generate_series(h0, h1,
                INTERVAL 1 HOUR)) h FROM b),
              v AS (SELECT user_id, date_trunc('hour', ts::TIMESTAMP) h,
                ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                  / COUNT(*), 3) avg_v
                FROM events WHERE user_id <= 10 GROUP BY 1, 2)
              SELECT hrs.user_id, epoch_us(hrs.h) // 1000000 AS h_epoch,
                last_value(v.avg_v IGNORE NULLS) OVER (
                  PARTITION BY hrs.user_id ORDER BY hrs.h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
              FROM hrs LEFT JOIN v
                ON v.user_id = hrs.user_id AND v.h = hrs.h
              ORDER BY hrs.user_id, h_epoch"""),
      (s, dir) => {
        val ev = t(s, dir, "events").filter(col("user_id") <= 10)
        val bounds = ev.groupBy("user_id")
          .agg(date_trunc("hour", min(col("ts"))).as("h0"),
            date_trunc("hour", max(col("ts"))).as("h1"))
        val hrs = bounds.select(col("user_id"),
          explode(sequence(col("h0"), col("h1"),
            expr("interval 1 hour"))).as("h"))
        val v = ev.groupBy(col("user_id"),
            date_trunc("hour", col("ts")).as("h"))
          .agg(round(
            sum(col("value").cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 3).as("avg_v"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("h")
          .rowsBetween(Long.MinValue, 0)
        hrs.join(v, Seq("user_id", "h"), "left")
          .select(col("user_id"),
            unix_timestamp(col("h")).as("h_epoch"),
            last(col("avg_v"), ignoreNulls = true).over(w).as("filled"))
          .orderBy("user_id", "h_epoch")
      }),

    // T1 extension — HOPPING window aggregate (2-hour windows sliding
    // every hour) via Spark's native window() in batch: each event
    // lands in exactly two overlapping windows. The oracle mirrors by
    // exploding each event into its two slot starts. Streaming uses
    // the identical window() call with a watermark.
    QueryDef(
      "q61_hopping_window",
      Some("""WITH x AS (SELECT date_trunc('hour', ts::TIMESTAMP)
                  - u.i * INTERVAL 1 HOUR ws, event_type
                FROM events, UNNEST([0, 1]) u(i))
              SELECT epoch_us(ws) // 1000000 AS wstart, event_type,
                CAST(COUNT(*) AS BIGINT) AS cnt
              FROM x GROUP BY 1, 2 ORDER BY wstart, event_type"""),
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(window(col("ts"), "2 hours", "1 hour"),
            col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .select(unix_timestamp(col("window.start")).as("wstart"),
            col("event_type"), col("cnt"))
          .orderBy("wstart", "event_type")),

    // ── Dedup tier 6: shingle CONTAINMENT (|A∩B| / min(|A|,|B|)) —
    // the asymmetric measure that catches a document quoted inside a
    // larger one, which symmetric Jaccard dilutes below threshold.
    // Same MinHash-LSH candidate discovery as tier 2; only the verify
    // formula differs (Broder's containment).
    QueryDef(
      "ns_dedup_containment",
      Some(PipelineQueries.shingleCtePublic +
        PipelineQueries.minhashCandCtePublic + """,
        cont AS (SELECT c.da, c.db,
                   len(list_intersect(x.hh, y.hh))::DOUBLE /
                   least(len(x.hh), len(y.hh)) cont
                 FROM cand c JOIN sh x ON x.doc_id = c.da
                             JOIN sh y ON y.doc_id = c.db)
        SELECT da AS doc_a, db AS doc_b, ROUND(cont, 3) AS containment
        FROM cont WHERE cont >= 0.9 ORDER BY doc_a, doc_b"""),
      (s, dir) => {
        val sh = PipelineQueries.sharedShingles(s, dir)
          .withColumnRenamed("doc_id", "id")
        graft.operators.Dedup.containmentPairs(
            sh, graft.operators.Dedup.minhashCandidatesFromBanded(
              PipelineQueries.minhashBanded(s, dir)))
          .select(col("ida").as("doc_a"), col("idb").as("doc_b"),
            round(col("containment"), 3).as("containment"))
          // scale-conditional boundary before the sort — see
          // PipelineQueries.sortBoundary
          .transform(d => PipelineQueries.sortBoundary(s, dir, d, "doc_a"))
          .orderBy("doc_a", "doc_b")
      }),

    // O3 extension — grouped top-k via the CUSTOM physical operator
    // (graft.plans.TopKPerKeyExec): bounded k-row heap per key
    // instead of the window form's full per-key sort. The oracle IS
    // the declarative window form — the custom plan must reproduce it
    // exactly (ties broken by the total (value DESC, event_id) order).
    QueryDef(
      "q66_topk_per_key",
      Some("""SELECT user_id, event_id, value FROM (
                SELECT user_id, event_id, value, ROW_NUMBER() OVER (
                  PARTITION BY user_id
                  ORDER BY value DESC, event_id) rn
                FROM events WHERE user_id IS NOT NULL) t
              WHERE rn <= 3 ORDER BY user_id, event_id"""),
      (s, dir) =>
        graft.operators.TopK.perKey(
            t(s, dir, "events").filter(col("user_id").isNotNull)
              .select("user_id", "event_id", "value"),
            Seq("user_id"), Seq(col("value").desc, col("event_id")), 3)
          .orderBy("user_id", "event_id")),

    // TPC-H Q18 shape — large-volume orders: a HAVING-gated aggregate
    // subquery driving a 3-way join + top-k. The big-orders filter
    // reduces before joining (aggregate pushdown by construction);
    // final TakeOrderedAndProject caps the result driver-side.
    QueryDef(
      "q64_tpch_big_orders",
      Some("""WITH big AS (SELECT l_orderkey,
                SUM(CAST(l_quantity AS DECIMAL(18,6))) sq
                FROM lineitem GROUP BY l_orderkey
                HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150)
              SELECT c.c_custkey, o.o_orderkey,
                ROUND(o.o_totalprice, 2) AS price,
                CAST(ROUND(b.sq, 2) AS DOUBLE) AS sum_qty
              FROM big b
              JOIN orders o ON o.o_orderkey = b.l_orderkey
              JOIN customer c ON c.c_custkey = o.o_custkey
              ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 20"""),
      (s, dir) => {
        // sumMoneyDouble replaces the per-row double->decimal Cast
        // (Double.toString + BigDecimal + changePrecision per lineitem
        // row) with a two-fp-op unscaled-long feed into the 128-bit
        // accumulator — bit-identical under the money convention
        // (MoneySumSpec pins the equivalence); this aggregate runs
        // over EVERY lineitem row, so it dominated q64's sf1 cost the
        // same way the cast dominated q47's (round 20 profile).
        val big = t(s, dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(graft.plans.MoneySum.sumMoneyDouble(col("l_quantity"))
            .as("sq"))
          .filter(col("sq") > 150)
        // big⋈orders as a SHUFFLED HASH join building on `big` (the
        // HAVING-gated aggregate): the default SMJ sorted BOTH
        // co-partitioned sides — |orders| rows plus the agg output —
        // to join a side the HAVING filter had already cut to the
        // extreme-quantity tail (sf3 profile: the two sorts were the
        // join stage's cost). Per-partition hash build over the
        // FILTERED side is bounded by tail-selectivity × partition
        // size at any scale (AQE sizes the partitions); orders only
        // ever streams. The orders side still co-partitions by key —
        // the 100 TB-honest alternative to broadcasting a
        // statistics-free aggregate output.
        val top = big.hint("shuffle_hash")
          .join(t(s, dir, "orders"),
            col("o_orderkey") === col("l_orderkey"))
          // order on the RAW price (the oracle does too): rounding
          // first could reorder ties at the limit boundary
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(20)
        // customer join AFTER the top-k: the sort key (o_totalprice,
        // o_orderkey) and the limit predicate use orders columns only,
        // and o_custkey is a non-null FK into customer (enforced by
        // the generator, verified by the oracle gate), so joining the
        // 20 surviving rows is identical to joining before the limit —
        // and replaces a |customer|-sized driver-built broadcast hash
        // relation with a 20-entry build probed by a map-only scan.
        top.join(t(s, dir, "customer"),
            col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey"), col("o_orderkey"),
            round(col("o_totalprice"), 2).as("price"),
            round(col("sq"), 2).cast("double").as("sum_qty"),
            col("o_totalprice"))
          // ≤20 rows survive: single-partition re-sort (the join does
          // not preserve TakeOrdered's order), q47-tail discipline
          .coalesce(1)
          .sortWithinPartitions(col("o_totalprice").desc, col("o_orderkey"))
          .drop("o_totalprice")
      }),

    // TPC-H Q10 shape — returned-item revenue: which customers sent
    // the most revenue back. Fact filter → 3-way join → decimal
    // revenue aggregate → top-k. The returnflag filter pushes to the
    // lineitem scan; customer/nation join after the aggregate keeps
    // the shuffle narrow.
    QueryDef(
      "q65_tpch_returned_revenue",
      Some("""WITH rev AS (SELECT o.o_custkey,
                SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                    AS DECIMAL(18,6))) r
                FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
                WHERE l.l_returnflag = 'R'
                GROUP BY o.o_custkey)
              SELECT c.c_custkey, n.n_name,
                CAST(ROUND(rev.r, 2) AS DOUBLE) AS revenue
              FROM rev
              JOIN customer c ON c.c_custkey = rev.o_custkey
              JOIN nation n ON n.n_nationkey = c.c_nationkey
              ORDER BY rev.r DESC, c.c_custkey LIMIT 20"""),
      (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .join(t(s, dir, "orders"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy("o_custkey")
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,6)")).as("r"))
        rev
          .join(t(s, dir, "customer"),
            col("c_custkey") === col("o_custkey"))
          .join(broadcast(t(s, dir, "nation")),
            col("n_nationkey") === col("c_nationkey"))
          .orderBy(col("r").desc, col("c_custkey"))
          .limit(20)
          .select(col("c_custkey"), col("n_name"),
            round(col("r"), 2).cast("double").as("revenue"))
      }),

    // F13 extension — semi-structured VARIANT path: parse_json into
    // Spark's binary variant encoding and extract a TYPED field
    // (vs q23's string-out get_json_object). At scale variant columns
    // are the schema-on-read lane: parse once at ingest, typed
    // extraction pushes into codegen.
    QueryDef(
      "q62_variant_json",
      Some("""SELECT event_id, json_extract(props, '$.k')::BIGINT AS k
              FROM events ORDER BY event_id LIMIT 500"""),
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_id"),
            expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
          .orderBy("event_id")
          .limit(500)),

    // Recursive CTE (Spark 4 WITH RECURSIVE) — a date spine unrolled
    // by recursion joined against the fact: the canonical
    // calendar-dimension construction where no table provides the
    // spine. Bounded recursion (30 days), deterministic.
    QueryDef(
      "q63_recursive_cte",
      Some("""WITH RECURSIVE days(d) AS (
                SELECT DATE '2024-01-01'
                UNION ALL SELECT d + 1 FROM days WHERE d < DATE '2024-01-30')
              SELECT CAST(dy.d AS VARCHAR) AS day,
                COUNT(e.event_id)::BIGINT AS cnt
              FROM days dy LEFT JOIN events e
                ON CAST(e.ts::TIMESTAMP AS DATE) = dy.d
              GROUP BY dy.d ORDER BY day"""),
      (s, dir) => {
        t(s, dir, "events").createOrReplaceTempView("graft_rcte_events")
        s.sql("""WITH RECURSIVE days(d) AS (
                   SELECT DATE'2024-01-01'
                   UNION ALL SELECT date_add(d, 1) FROM days
                   WHERE d < DATE'2024-01-30')
                 SELECT CAST(dy.d AS STRING) AS day,
                   CAST(COUNT(e.event_id) AS BIGINT) AS cnt
                 FROM days dy LEFT JOIN graft_rcte_events e
                   ON CAST(e.ts AS DATE) = dy.d
                 GROUP BY dy.d ORDER BY day""")
      }),

    // ── Similarity tier 7: TF-IDF-weighted cosine over the df-capped
    // inverted shingle index — weighted lexical similarity without
    // embeddings (rare shingles dominate, boilerplate fades). Every
    // accumulated quantity is an exact BIGINT sum of per-term
    // fixed-point weights (floor(idf²·1e6); ratio idf N/df, never
    // log() — libm ulp differences break cross-engine parity), so
    // aggregation order cannot change the score; the final
    // sqrt/divide runs on identical doubles on both engines. Same
    // inverted-index shuffle shape as the ngram tier: linear in
    // postings, never O(n²).
    QueryDef(
      "ns_text_tfidf_sim",
      Some(PipelineQueries.shingleCtePublic + """,
        inv0 AS (SELECT doc_id, UNNEST(hh) AS s FROM sh),
        hot AS (SELECT s FROM inv0 GROUP BY s HAVING COUNT(*) > 256),
        inv AS (SELECT i.doc_id, i.s FROM inv0 i
                ANTI JOIN hot h ON i.s = h.s),
        nn AS (SELECT COUNT(DISTINCT doc_id) n FROM inv),
        dfx AS (SELECT s, COUNT(*) df FROM inv GROUP BY s),
        w AS (SELECT i.doc_id, i.s,
                CAST(FLOOR((nn.n::DOUBLE / d.df) * (nn.n::DOUBLE / d.df)
                  * 1000000) AS BIGINT) wq
              FROM inv i JOIN dfx d ON i.s = d.s, nn),
        nrm AS (SELECT doc_id, SUM(wq) s2 FROM w GROUP BY doc_id),
        sab AS (SELECT a.doc_id da, b.doc_id db, SUM(a.wq) sab
                FROM w a JOIN w b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
        simt AS (SELECT sab.da, sab.db,
                  sab.sab::DOUBLE /
                    (sqrt(na.s2::DOUBLE) * sqrt(nb.s2::DOUBLE)) sim
                FROM sab JOIN nrm na ON na.doc_id = sab.da
                         JOIN nrm nb ON nb.doc_id = sab.db)
        SELECT da AS doc_a, db AS doc_b, ROUND(sim, 3) AS sim FROM simt
        WHERE sim >= 0.5 ORDER BY doc_a, doc_b"""),
      (s, dir) => {
        // the pair stage is the exact Bayardo-prefix-filtered +
        // in-row-verified restructure (operators/TextSim — VERDICT
        // r14 next-round #4: the naive self-join enumerated Σ c_s²
        // (pair, term) rows, 138 M at sf1, and was the engine's most
        // expensive op). Served from the tier's memoized standing
        // index halves (prefix postings + signature arrays, the
        // write-once artifacts beside tfidfWeights). Result set
        // provably identical, so the oracle SQL keeps the reference
        // formulation.
        graft.operators.TextSim.cosinePairsFromIndex(
            PipelineQueries.tfidfPrefix(s, dir),
            PipelineQueries.tfidfSig(s, dir), 0.5,
            verifyPartitions = PipelineQueries.artifactPartitions(s, dir))
          .withColumn("sim", col("sab").cast("double") /
            (sqrt(col("s2a").cast("double")) *
              sqrt(col("s2b").cast("double"))))
          .select(col("da").as("doc_a"), col("db").as("doc_b"),
            round(col("sim"), 3).as("sim"))
          // materialization boundary before the global sort: the range
          // exchange's sampling pass re-executes its child pipeline,
          // and here that child is the whole in-row verify (one
          // sorted-merge wsum per candidate pair) — measured as two
          // identical post-candidate stages, each ~0.2 s/task at
          // sf0.1. A keyed repartition turns the verify output
          // (post-threshold pairs, tiny) into its own materialized
          // stage; sample + write then re-READ it instead of
          // re-COMPUTING it. Result order unchanged — (doc_a, doc_b)
          // is a unique sort key.
          .repartition(col("doc_a"))
          .orderBy("doc_a", "doc_b")
      }),

    // A-family extension — max_by/arg_max dedup: keep each user's
    // HIGHEST-VALUE event (latest event_id on ties) in one aggregate,
    // no window, no self-join — the single-shuffle "best row per key"
    // that q14's row_number form pays a sort for.
    QueryDef(
      "q67_argmax_dedup",
      // DuckDB's arg_max has no composite-key form — the oracle uses
      // the equivalent window pick (max_by over struct(value, id) ==
      // first row under ORDER BY value DESC, id DESC)
      Some("""SELECT user_id, event_id AS best_event FROM (
                SELECT user_id, event_id, ROW_NUMBER() OVER (
                  PARTITION BY user_id
                  ORDER BY value DESC, event_id DESC) rn
                FROM events WHERE user_id IS NOT NULL) t
              WHERE rn = 1 ORDER BY user_id"""),
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("user_id").isNotNull)
          .groupBy("user_id")
          .agg(max_by(col("event_id"),
            struct(col("value"), col("event_id"))).as("best_event"))
          .orderBy("user_id")),

    // Profiling companion — fixed-width value histogram per event
    // type: the distribution view an operator reads next to the
    // ns_profile_stats summary (bucket = floor(value/width), one
    // groupBy, linear).
    QueryDef(
      "q68_histogram",
      Some("""SELECT event_type,
                CAST(FLOOR(value / 0.1) AS BIGINT) AS bucket,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM events WHERE value IS NOT NULL
              GROUP BY 1, 2 ORDER BY event_type, bucket"""),
      (s, dir) =>
        t(s, dir, "events")
          .filter(col("value").isNotNull)
          .groupBy(col("event_type"),
            floor(col("value") / 0.1).cast("long").as("bucket"))
          .agg(count(lit(1)).as("n"))
          .orderBy("event_type", "bucket")),

    // ── Curation: per-source column profiling — the data-quality
    // report a curator reads before training (null rates, distinct
    // docs, length stats). One full-scan aggregate, partial+final.
    QueryDef(
      "ns_profile_stats",
      Some("""SELECT source,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct,
                CAST(SUM(CASE WHEN text IS NULL OR text = ''
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
                CAST(MIN(length(text)) AS BIGINT) AS min_len,
                CAST(MAX(length(text)) AS BIGINT) AS max_len,
                CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS sum_len,
                CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
              FROM documents GROUP BY source ORDER BY source"""),
      (s, dir) =>
        t(s, dir, "documents")
          .groupBy("source")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct(col("doc_id")).as("n_distinct"),
            sum(when(col("text").isNull || col("text") === "", 1)
              .otherwise(0)).cast("long").as("n_empty"),
            min(length(col("text"))).cast("long").as("min_len"),
            max(length(col("text"))).cast("long").as("max_len"),
            sum(length(col("text")).cast("long")).as("sum_len"),
            countDistinct(col("lang")).as("n_langs"))
          .orderBy("source")),

    // ── Curation: stratum balancing — cap each language at its 50
    // highest-quality docs (deterministic quality proxy: length then
    // doc_id), via Curate.balanceStrata → the custom bounded-heap
    // top-k. The oracle is the declarative window form.
    QueryDef(
      "ns_balance_corpus",
      Some("""SELECT doc_id, lang FROM (
                SELECT doc_id, lang, ROW_NUMBER() OVER (
                  PARTITION BY lang
                  ORDER BY length(text) DESC, doc_id) rn
                FROM documents) t
              WHERE rn <= 50 ORDER BY doc_id"""),
      (s, dir) =>
        graft.operators.Curate.balanceStrata(
            t(s, dir, "documents")
              .select(col("doc_id"), col("lang"), length(col("text")).as("len")),
            "lang", Seq(col("len").desc, col("doc_id")), 50)
          .select("doc_id", "lang")
          .orderBy("doc_id")),

    // ── Curation: stratified content-hash sampling — per-stratum keep
    // rates (en 50%, fr 25%, else 10%), deterministic by id hash,
    // never rand(). Narrow filter: linear at any scale.
    QueryDef(
      "ns_sample_stratified",
      Some("""SELECT doc_id, lang FROM documents
              WHERE ('0x' || substring(md5('strat:' || doc_id::VARCHAR),
                      1, 15))::BIGINT % 100 <
                CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 25 ELSE 10 END
              ORDER BY doc_id"""),
      (s, dir) =>
        graft.operators.Curate.sampleStratified(
            t(s, dir, "documents"), "doc_id", "lang",
            rates = Seq("en" -> 50, "fr" -> 25), defaultPct = 10)
          .select("doc_id", "lang")
          .orderBy("doc_id")),
  )
}
