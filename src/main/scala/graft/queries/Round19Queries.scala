package graft.queries

import graft.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-19 rows: the PCA→PQ preprocessing composition
  * (VERDICT r18 missing #3) gets an oracle face. The FULL composition
  * ([[graft.operators.Pq.fitProjection]] — Jacobi rotation +
  * subspace interleave) is not SQL-expressible (no eigen-solve in an
  * oracle), so the cross-engine row pins the composition with a
  * DIAGONAL whitening model — per-dim (μ, σ) from fixed-point
  * aggregates, projection = (x−μ)·(1/σ) per axis — driven through
  * the SAME Pq.trainCodebookProjected/encodeProjected code path the
  * rotated form uses (a diagonal model IS a PcaModel whose
  * components are scaled unit vectors, round-robin interleaved:
  * projected subspace of original dim d = d mod nSub, which the SQL
  * mirrors as `d % 4`). The rotation-specific algebra (orthonormal
  * basis, metric preservation, variance balance, recall gain) is
  * pinned by PcaSpec/PqWhitenSpec goldens and the committed
  * docs/PQ_WHITEN_AB.json A/B, which SQL cannot see.
  *
  * Reference analog: per-sensor calibration before aggregation
  * (hx711_calibration/hx711_calibration.ino:20-33 — scale/offset
  * normalization per serial number before readings are comparable).
  */
object Round19Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Catalog.table(s, dir, name)

  def defs: Seq[QueryDef] = Seq(

    // ── Whiten → pqTrain → pqEncode, end to end cross-engine.
    // Latency shape: a 4-job DAG (per-dim stats agg, O(model) seed
    // collect, one-pass codebook agg, in-row encode) whose floors
    // dominate at sf0.1 (0.60 s vs a 0.26 s oracle = 2.3x) and
    // amortize with scale: 1.29 s vs 0.764 s = 1.69x at sf1 (same-box
    // pair). Trended in bench_trend.py per the q15/ns_tokenize_vocab
    // adjudication pattern. Every
    // per-dim statistic quantizes to fixed-point BIGINT before
    // summing (exact, order-independent long addition — the §2.11
    // discipline), the double expressions that derive (μ, 1/σ) are
    // mirrored op for op, and the PQ chain is the standing pqCte
    // contract (seeds = 8 lowest ids, one Lloyd step, ties on cid).
    // Output = every (vec_id, subspace, codeword) — the full code
    // index, all BIGINT (outer casts per the ns_embed_gram lesson).
    QueryDef(
      "ns_pq_whiten_encode",
      Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] v FROM embeddings),
         lf AS (SELECT vec_id, d, v[d+1] x FROM e, range(0, 64) r(d)),
         st AS (SELECT d, SUM(CAST(FLOOR(x * 1000000) AS BIGINT)) sfx,
                       SUM(CAST(FLOOR(x * x * 1000000) AS BIGINT)) ssq,
                       COUNT(*) n
                FROM lf GROUP BY d),
         m1 AS (SELECT d, CAST(sfx AS DOUBLE) / 1000000.0 / n m,
                       CAST(ssq AS DOUBLE) / 1000000.0 / n q
                FROM st),
         mu AS (SELECT d, m, sqrt(q - m * m) sg FROM m1),
         ev AS (SELECT lf.vec_id, lf.d % 4 s, lf.d,
                       (lf.x - mu.m) * (1.0 / mu.sg) x
                FROM lf JOIN mu ON lf.d = mu.d),
         c0 AS (SELECT vec_id cid, s, d, x cx FROM ev WHERE vec_id < 8),
         d1 AS (SELECT ev.vec_id, ev.s, c0.cid,
                  SUM(CAST(FLOOR((ev.x - c0.cx) * (ev.x - c0.cx)
                      * 1000000000000.0) AS BIGINT)) dist
                FROM ev JOIN c0 ON ev.s = c0.s AND ev.d = c0.d
                GROUP BY 1, 2, 3),
         a1 AS (SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, s ORDER BY dist, cid) rn FROM d1)
                WHERE rn = 1),
         cb AS (SELECT a1.s, a1.cid, ev.d,
                  SUM(CAST(FLOOR(ev.x * 1000000000000.0) AS BIGINT))::DOUBLE
                    / 1000000000000.0 / COUNT(*) cx
                FROM ev JOIN a1 ON ev.vec_id = a1.vec_id AND ev.s = a1.s
                GROUP BY 1, 2, 3),
         d2 AS (SELECT ev.vec_id, ev.s, cb.cid,
                  SUM(CAST(FLOOR((ev.x - cb.cx) * (ev.x - cb.cx)
                      * 1000000000000.0) AS BIGINT)) dist
                FROM ev JOIN cb ON ev.s = cb.s AND ev.d = cb.d
                GROUP BY 1, 2, 3),
         codes AS (SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid, ROW_NUMBER() OVER (
                    PARTITION BY vec_id, s ORDER BY dist, cid) rn FROM d2)
                WHERE rn = 1)
         SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(s AS BIGINT) AS s,
                CAST(cid AS BIGINT) AS cid
         FROM codes ORDER BY vec_id, s"""),
      (s, dir) => {
        import graft.operators.{Pca, Pq}
        val dDim = 64
        val nSub = 4
        val e = t(s, dir, "embeddings")
        // per-dim fixed-point stats → the diagonal whitening model.
        // O(model) collect (64 rows), the PQ-codebook budget class.
        val st = e.select(posexplode(col("embedding").cast("array<double>"))
            .as(Seq("d", "x")))
          .groupBy("d")
          .agg(sum(floor(col("x") * 1e6).cast("long")).as("sfx"),
            sum(floor(col("x") * col("x") * 1e6).cast("long")).as("ssq"),
            count(lit(1)).as("n"))
          .collect()
        val mean = new Array[Double](dDim)
        val inv = new Array[Double](dDim)
        st.foreach { r =>
          val d = r.getInt(0)
          val n = r.getLong(3)
          // EXACT mirrors of the oracle's m1/mu expressions, op for op
          val m = r.getLong(1).toDouble / 1000000.0 / n
          val q = r.getLong(2).toDouble / 1000000.0 / n
          mean(d) = m
          inv(d) = 1.0 / math.sqrt(q - m * m)
        }
        // diagonal model through the SAME composed path as the
        // rotated form: component c = e_c · (1/σ_c), round-robin
        // interleaved so the projected subspace of original dim d is
        // d mod nSub — which the oracle mirrors as `lf.d % 4`
        val model = Pca.interleaved(
          Pca.PcaModel(mean,
            Array.tabulate(dDim)(c =>
              Array.tabulate(dDim)(i => if (i == c) inv(c) else 0.0)),
            Array.fill(dDim)(1.0)),
          nSub)
        // training via the ONE-PASS in-row tier and the final encode
        // via the serving in-row tier (Round12's shape): seed model
        // and trained codebook are both O(model) driver round-trips;
        // the distributed work is one narrow explode + a k·dims-row
        // aggregate + a map-only encode scan. Identical codes to the
        // join-form path (PqWhitenSpec differential).
        val proj = graft.operators.Pca.project(e, "embedding", model, "__w")
          .select(col("vec_id"), col("__w"))
        val cb = Pq.trainCodebookInRow(proj, "vec_id", "__w",
          subDim = dDim / nSub, k = 8)
        val pqm = Pq.collectModel(cb, subDim = dDim / nSub)
        Pq.encodeInRow(proj, "vec_id", "__w", pqm)
          .select(col("vec_id").cast("long").as("vec_id"),
            col("s").cast("long").as("s"),
            col("cid").cast("long").as("cid"))
          .orderBy("vec_id", "s")
      }),
  )
}
