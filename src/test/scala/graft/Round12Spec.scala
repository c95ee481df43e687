package graft

import graft.operators.Curate
import org.apache.spark.sql.functions._

/** Round-12 operators: reproducible shard shuffle (permutation,
  * balance, determinism, spec-equivalence) and the PQ-ANN tier's
  * structural invariants (one code per (vec, subspace), O(model)
  * codebook, shortlist bounded).
  */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("shuffleShards: pos is a permutation, shards balanced to ±1, " +
      "reruns identical") {
    val docs = Catalog.table(spark, sfDir, "documents").select("doc_id")
    val n = docs.count()
    val out = Curate.shuffleShards(docs, "doc_id", 8)
    val rows = out.select("doc_id", "pos", "shard")
      .as[(Long, Long, Long)].collect()
    assert(rows.length == n)
    assert(rows.map(_._2).sorted.toSeq == (1L to n).toSeq, "pos permutation")
    val sizes = rows.groupBy(_._3).values.map(_.length)
    assert(sizes.max - sizes.min <= 1, s"shard imbalance: $sizes")
    val again = Curate.shuffleShards(docs, "doc_id", 8)
      .select("doc_id", "pos", "shard").as[(Long, Long, Long)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("shuffleShards equals the single-window ROW_NUMBER spec") {
    val docs = Catalog.table(spark, sfDir, "documents").select("doc_id")
    val dist = Curate.shuffleShards(docs, "doc_id", 8)
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    val spec = docs
      .withColumn("h", graft.functions.TextFunctions.hex60(
        concat(lit("shuf:"), col("doc_id").cast("string"))))
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("h"), col("doc_id"))).cast("long"))
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(dist.toSeq == spec.toSeq)
  }

  test("shuffleShards: different salts give different orders " +
      "(the reshuffle-per-epoch contract)") {
    val docs = Catalog.table(spark, sfDir, "documents").select("doc_id")
    val e0 = Curate.shuffleShards(docs, "doc_id", 8, salt = "epoch0")
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    val e1 = Curate.shuffleShards(docs, "doc_id", 8, salt = "epoch1")
      .select("doc_id", "pos").as[(Long, Long)].collect().sortBy(_._1)
    assert(e0.map(_._2).toSeq != e1.map(_._2).toSeq)
  }

  test("Pq: incremental encode equals the batch re-encode restricted " +
      "to the shard (codes depend only on vector + codebook)") {
    import graft.operators.Pq
    val e = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = Pq.trainCodebook(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "v")
    val incr = Pq.encode(e.filter(col("vec_id") % 2 === 1),
        "vec_id", "v", cb)
      .as[(Long, Long, Long)].collect().sorted
    val batch = Pq.encode(e, "vec_id", "v", cb)
      .filter(col("vec_id") % 2 === 1)
      .as[(Long, Long, Long)].collect().sorted
    assert(incr.nonEmpty && incr.toSeq == batch.toSeq)
    // every shard vector carries one code per subspace
    assert(incr.groupBy(_._1).values.forall(_.map(_._2).sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L)))
  }

  test("Pq: in-row encode equals the long-form join formulation, " +
      "and its plan is map-only (no join, no shuffle)") {
    import graft.operators.Pq
    val e = Catalog.table(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val cb = Pq.trainCodebook(e.filter(col("vec_id") % 2 === 0),
      "vec_id", "v")
    val model = Pq.collectModel(cb)
    assert(model.nSub == 4 && model.k == 8 &&
      model.cids.length == model.nSub * model.k)
    // cids ascend within each subspace — the tie-break contract
    assert((0 until model.nSub).forall { s =>
      val xs = model.cids.slice(s * model.k, (s + 1) * model.k)
      xs.sameElements(xs.sorted)
    })
    val shard = e.filter(col("vec_id") % 2 === 1)
    val joinForm = Pq.encode(shard, "vec_id", "v", cb)
      .as[(Long, Long, Long)].collect().sorted
    val inRow = Pq.encodeInRow(shard, "vec_id", "v", model)
      .as[(Long, Long, Long)].collect().sorted
    assert(inRow.nonEmpty && inRow.toSeq == joinForm.toSeq)
    // scale property: the whole encode is one projection over the scan
    val plan = Pq.encodeInRow(shard, "vec_id", "v", model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_pq_encode"), plan)
    assert(!plan.contains("Join") && !plan.contains("Exchange"),
      s"in-row encode must not join or shuffle:\n$plan")
  }

  test("ns_ann_pq_topk: 10 results, cosines in [-1,1] descending; " +
      "probe itself excluded") {
    val df = graft.queries.Registry.queries("ns_ann_pq_topk")(spark, sfDir)
    val rows = df.as[(Long, Double)].collect()
    assert(rows.length == 10)
    assert(rows.forall { case (id, c) => id != 0L && c >= -1.0 && c <= 1.0 })
    assert(rows.map(_._2).toSeq == rows.map(_._2).sortBy(-_).toSeq)
  }
}
