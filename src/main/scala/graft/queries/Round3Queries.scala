package graft.queries

import graft.Catalog
import graft.functions.{SimilarityFunctions => SF, TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 extensions: the generalized as-of join operator (J6 as a
  * public API over arbitrary tables), document chunking for training
  * sequences, batch ANN (many probes at once — the real serving
  * shape), and stratified content-hash sampling.
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
        val build = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("k"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("bt"))
          .agg(max("o_orderkey").as("last_order"))
        graft.operators.AsOf.joinLatest(
            probe, build, "user_id", "k", "t_us", "bt",
            valueCols = Seq("last_order"))
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
                      range(0, ((n-1)//48) + 1)]) u(i))
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
        val e = t(s, dir, "embeddings")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
          .withColumn("nrm", SF.l2Norm(col("v")))
        val bands = e.select(col("vec_id"),
          posexplode(SF.lshBandBuckets(col("v"), 4, 2, 64))
            .as(Seq("band", "bucket")))
        val cand = bands.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("pid"), col("band"), col("bucket"))
          .join(bands.select(col("vec_id").as("cid"), col("band"),
            col("bucket")), Seq("band", "bucket"))
          .filter(col("pid") =!= col("cid"))
          .select("pid", "cid")
          .distinct()
        // exact-cosine rerank: plain shuffle joins on vec_id — the
        // embedding table is O(corpus), never broadcast it
        cand
          .join(e.select(col("vec_id").as("pid"), col("v").as("xv"),
            col("nrm").as("xn")), "pid")
          .join(e.select(col("vec_id").as("cid"), col("v").as("yv"),
            col("nrm").as("yn")), "cid")
          .withColumn("cos",
            SF.dot(col("xv"), col("yv")) / (col("xn") * col("yn")))
          .withColumn("rnk", row_number().over(
            Window.partitionBy("pid").orderBy(col("cos").desc, col("cid"))))
          .filter(col("rnk") <= 5)
          .select(col("pid").as("probe_id"), col("rnk"),
            col("cid").as("vec_id"), round(col("cos"), 4).as("cos"))
          .orderBy("probe_id", "rnk")
      }),

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
