package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The public dedup operator API must work on ARBITRARY user frames,
  * not just the test catalog — the "switch your pipeline to this
  * library" contract.
  */
class DedupApiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (10L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (11L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 10
    (12L, "completely different content about spark query planning and shuffles today"),
    (13L, "the quick brown fox jumps over the lazy dog near the river bend now"), // near-dup of 11
    (14L, "short doc")
  ).toDF("my_id", "body")

  test("dedupTransitive keeps one representative per near-dup chain") {
    val kept = Dedup.dedupTransitive(docs, "my_id", "body", threshold = 0.5)
      .as[Long].collect().sorted
    // 10-11 and 11-13 chain into one component -> keep 10 only
    assert(kept.toSeq == Seq(10L, 12L, 14L), kept.toSeq.toString)
  }

  test("verifiedPairs reports exact jaccard for candidates") {
    val sh = Dedup.shingleSignatures(docs, "my_id", "body")
    val pairs = Dedup.verifiedPairs(sh, Dedup.minhashCandidates(sh), 0.5)
      .select("ida", "idb").as[(Long, Long)].collect().sorted
    assert(pairs.contains((10L, 11L)), pairs.toSeq.toString)
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("componentLabels converges on chains longer than any fixed round count") {
    // propagation distance 5 > the old fixed 3 rounds: fixpoint mode
    // must still collapse the whole chain under the min id
    val ids = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
      .toDF("ida", "idb")
    val labels = Dedup.componentLabels(ids, pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels.values.forall(_ == 1L), labels.toString)
    // and the explicit-rounds mode is deliberately unconverged
    val l3 = Dedup.componentLabels(ids, pairs, iterations = Some(1))
      .as[(Long, Long)].collect().toMap
    assert(l3(6L) == 5L, s"1 round reaches only the direct neighbor: $l3")
  }

  test("returned frames are the cached plan: caller unpersist releases them") {
    // ADVICE r2: a derived select over the persisted frame would make
    // .unpersist() a no-op and leak the cache for the session lifetime
    val ids = (1L to 4L).toDF("id")
    val pairs = Seq((1L, 2L)).toDF("ida", "idb")
    val labels = Dedup.componentLabels(ids, pairs)
    assert(labels.storageLevel.useMemory || labels.storageLevel.useDisk,
      s"componentLabels result not persisted: ${labels.storageLevel}")
    labels.unpersist(blocking = true)
    assert(labels.storageLevel == org.apache.spark.storage.StorageLevel.NONE)

    val kept = Dedup.dedupTransitive(docs, "my_id", "body", threshold = 0.5)
    assert(kept.storageLevel.useMemory || kept.storageLevel.useDisk,
      s"dedupTransitive result not persisted: ${kept.storageLevel}")
    kept.unpersist(blocking = true)
    assert(kept.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("invertedIndexCandidates finds shingle-sharing pairs; df cap mutes hot shingles") {
    val sh = Dedup.shingleSignatures(docs, "my_id", "body")
    val cand = Dedup.invertedIndexCandidates(sh)
      .as[(Long, Long)].collect().sorted
    assert(cand.contains((10L, 11L)) && cand.contains((11L, 13L)),
      cand.toSeq.toString)
    assert(cand.forall { case (a, b) => a < b })
    // a df cap of 1 removes every shared shingle -> no candidates
    assert(Dedup.invertedIndexCandidates(sh, dfCap = 1).count() == 0)
  }

  test("winnowPairs: long shared runs pair, unrelated docs don't") {
    val shared = "this exact forty-plus character run is copied verbatim into both docs"
    val corpus = Seq(
      (1L, s"alpha prologue $shared and then some trailing words here"),
      (2L, s"a completely different opening passage $shared closing words"),
      (3L, "nothing in common with the others at all in any respect"),
      (4L, "likewise dissimilar content that shares no long character runs"))
      .toDF("my_id", "body")
    val cand = Dedup.winnowPairs(corpus, "my_id", "body")
    // the eager pair-set contract: returned frame IS the cached plan
    assert(cand.storageLevel.useMemory || cand.storageLevel.useDisk,
      s"winnowPairs result not persisted: ${cand.storageLevel}")
    val pairs = cand.select("a", "b").as[(Long, Long)].collect().toSet
    cand.unpersist(blocking = true)
    assert(cand.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(pairs == Set((1L, 2L)),
      s"exactly the shared-run pair must survive: $pairs")

    // the lazy building blocks compose to the same pair set (the
    // query layer serves winnowPairsFromPostings from a memoized
    // postings artifact — the two paths must not drift)
    val post = Dedup.winnowPostings(corpus, "my_id", "body")
    val lazyPairs = Dedup.winnowPairsFromPostings(post)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(lazyPairs == pairs, s"lazy path drifted: $lazyPairs vs $pairs")
  }

  test("componentLabels groups a transitive chain under the min id") {
    val sh = Dedup.shingleSignatures(docs, "my_id", "body")
    val pairs = Dedup.verifiedPairs(sh, Dedup.minhashCandidates(sh), 0.5)
    val labels = Dedup.componentLabels(
      docs.select(col("my_id").as("id")), pairs)
      .as[(Long, Long)].collect().toMap
    assert(labels(11L) == 10L && labels(13L) == 10L, labels.toString)
    assert(labels(12L) == 12L)
  }
}
