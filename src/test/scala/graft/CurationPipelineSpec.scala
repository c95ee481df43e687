package graft

import graft.operators.{Curate, Dedup}
import org.apache.spark.sql.functions._

/** End-to-end composition of the public curation operators — the
  * "switch your training-data pipeline to this library" proof: gate →
  * transitive dedup → chunk → pack → split, each stage feeding the
  * next on plain DataFrames.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("quality gate → dedup → chunk → pack → split composes end to end") {
    val raw = Seq(
      (1L, "en", ("alpha beta gamma delta epsilon zeta eta theta " * 12).trim),
      (2L, "en", ("alpha beta gamma delta epsilon zeta eta theta " * 12).trim + " coda"), // near-dup of 1
      (3L, "en", ("lorem ipsum dolor sit amet consectetur adipiscing elit " * 10).trim),
      (4L, "en", "too short"),                       // fails quality gate
      (5L, "de", ("der fuchs springt ueber den faulen hund heute wieder " * 10).trim), // wrong lang
      (6L, "en", "1234 5678 " * 40)                  // fails alpha ratio
    ).toDF("doc_id", "lang", "text")

    val gated = Curate.qualityFilter(raw, "text", "lang",
      minTokens = 20, minAlphaRatio = 0.6, langs = Seq("en"))
    assert(gated.select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(1L, 2L, 3L), "gate keeps long clean English docs")

    val kept = Dedup.dedupTransitive(gated, "doc_id", "text", threshold = 0.5)
    val survivors = kept.as[Long].collect().sorted.toSeq
    assert(survivors == Seq(1L, 3L), s"near-dup 2 collapses into 1: $survivors")
    val corpus = gated.join(kept.withColumnRenamed("id", "doc_id"), "doc_id")
    kept.unpersist()

    // the gate's doc-level n_tok gives way to the chunk-level count
    // (chunkDocuments fails fast on the collision rather than
    // silently overwriting)
    val chunked = Curate.chunkDocuments(corpus.drop("n_tok"),
      "doc_id", "text", maxTokens = 32, overlap = 8)
    assert(chunked.groupBy("doc_id").count().as[(Long, Long)]
      .collect().toMap.values.forall(_ > 1), "long docs split into chunks")

    val packed = Curate.packSequences(
      chunked.withColumn("seq_id",
        concat_ws(":", col("doc_id"), col("chunk_id"))),
      "chunk_text", "lang", "seq_id", budgetTokens = 64)
    assert(packed.select("pack_id").distinct().count() > 1,
      "chunks spread across packs under the budget")

    val split = Curate.sampleSplit(packed, "chunk_text")
    val splits = split.select("split").distinct().as[String].collect().toSet
    assert(splits.subsetOf(Set("train", "val", "test")) && splits.nonEmpty)
    // every surviving chunk is routed exactly once
    assert(split.count() == chunked.count())
  }
}
