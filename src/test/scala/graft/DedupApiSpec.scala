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

  test("probeFromPostings packPairs: identical pairs to the two-column " +
      "key; out-of-range ids raise instead of aliasing") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
      (3L, "one two three four five six seven eight nine ten twelve")
    ).toDF("my_id", "body")
    val post = Dedup.shingleSignatures(corpus, "my_id", "body")
      .select(col("id"), explode(col("hh")).as("s"))
    val idx = Dedup.buildIndex(corpus.filter($"my_id" % 2 === 0),
      "my_id", "body")
    val shard = post.filter($"id" % 2 === 1)
    val plain = Dedup.probeFromPostings(shard, idx, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    val packed = Dedup.probeFromPostings(shard, idx, minShared = 2,
      packPairs = true).as[(Long, Long, Long)].collect().toSet
    assert(packed == plain && plain.nonEmpty, s"$packed vs $plain")
    // the in-plan guard: a shard id past 2^31 must fail loudly
    val bigId = shard.withColumn("id", col("id") + (1L << 40))
    intercept[Exception] {
      Dedup.probeFromPostings(bigId, idx, minShared = 1, packPairs = true)
        .collect()
    }
  }

  test("probeFromPostingsCapped: MaxValue cap equals the uncapped probe " +
      "exactly; default cap keeps exact n_shared and the standing-min star") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota nu"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
      (3L, "one two three four five six seven eight nine ten twelve")
    ).toDF("my_id", "body")
    val post = Dedup.shingleSignatures(corpus, "my_id", "body")
      .select(col("id"), explode(col("hh")).as("s"))
    val idx = Dedup.buildIndex(corpus.filter($"my_id" % 2 === 0),
      "my_id", "body")
    val shard = post.filter($"id" % 2 === 1)
    val exact = Dedup.probeFromPostings(shard, idx, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    val uncapped = Dedup.probeFromPostingsCapped(shard, idx,
      minShared = 2, standingRankCap = Int.MaxValue)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped == exact && exact.nonEmpty, s"$uncapped vs $exact")
    // cap 1: only each shingle's standing MINIMUM discovers — but every
    // discovered pair still carries the exact full n_shared, and every
    // shard doc with any standing match stays discoverable through the
    // min (the star bound)
    val capped = Dedup.probeFromPostingsCapped(shard, idx,
      minShared = 2, standingRankCap = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(capped.subsetOf(exact), s"$capped vs $exact")
    val exactByPair = exact.map(t => (t._1, t._2) -> t._3).toMap
    capped.foreach { case (a, b, n) =>
      assert(exactByPair((a, b)) == n, s"n_shared drifted for ($a,$b)")
    }
    assert(capped.map(_._2) == exact.map(_._2),
      "every discoverable shard doc must survive the cap via a standing min")
  }

  // the sf3 replica shape that went superlinear (VERDICT r13 #1): one
  // base text, n near-identical copies differing only in a suffix —
  // every fingerprint group holds the whole cluster
  private def dupCluster(n: Int) = {
    val base = "the winnowing fingerprint window walks a monotone deque " +
      "across character grams so any run of at least twenty characters " +
      "shared verbatim between two documents must surface a common " +
      "minimum hash that lands both documents in one postings group"
    (0 until n).map(i => (i.toLong, s"$base variant $i"))
      .toDF("my_id", "body")
  }

  test("minhash LSH rank cap: deterministic on an exact-clone cluster — " +
      "star coverage, only high-rank tail drops, components preserved") {
    // 12 exact clones: identical signatures, so every band bucket
    // holds the whole cluster and the uncapped self-join emits the
    // full C(12,2)=66 clique per band — the O(bands·c²) blowup the
    // round-14 sf3 trend measured (6.3× time for 3× data on 30-way
    // replicas). With rankCap 8 only ranks 1-8 enumerate: the 6
    // pairs among ranks 9-12 drop, everything else survives.
    val base = "the winnowing fingerprint window walks a monotone deque " +
      "across character grams so any run of at least twenty characters " +
      "shared verbatim between two documents must surface a common " +
      "minimum hash that lands both documents in one postings group"
    val clones = (0 until 12).map(i => (i.toLong, base)).toDF("my_id", "body")
    val sh = Dedup.shingleSignatures(clones, "my_id", "body").persist()
    try {
      val full = Dedup.minhashCandidates(sh, rankCap = Int.MaxValue)
        .as[(Long, Long)].collect().toSet
      assert(full.size == 66, s"expected the full clique, got ${full.size}")
      val capped = Dedup.minhashCandidates(sh, chainLink = false)
        .as[(Long, Long)].collect().toSet
      assert(capped.subsetOf(full))
      assert(capped.size == 60, s"rank cap 8 on a 12-clique keeps " +
        s"66 - C(4,2) = 60 pairs, got ${capped.size}")
      // star coverage: the bucket minimum pairs with every member
      (1L to 11L).foreach(b => assert(capped.contains((0L, b)),
        s"star pair (0,$b) must survive the cap"))
      // the drop is exactly the high-rank x high-rank tail
      assert((full -- capped).forall { case (a, b) => a >= 8L && b >= 8L })
      // shipped default adds the chainLink backstop: identical
      // digests tie every clone, so each chain is the consecutive-id
      // path — exactly (8,9),(9,10),(10,11) on top of the star
      val chained = Dedup.minhashCandidates(sh)
        .as[(Long, Long)].collect().toSet
      assert(capped.subsetOf(chained) && chained.subsetOf(full))
      assert(chained -- capped ==
        Set((8L, 9L), (9L, 10L), (10L, 11L)),
        s"chain adds the consecutive-id tail links, got " +
          s"${chained -- capped}")
      // the banded-index entry point (round 17: banding built once,
      // persisted by callers) is THE SAME operator: identical pair
      // set through the prebuilt-banding path
      val viaBanded = Dedup.minhashCandidatesFromBanded(
          Dedup.bandedWithArray(sh))
        .as[(Long, Long)].collect().toSet
      assert(viaBanded == chained,
        "minhashCandidatesFromBanded(bandedWithArray(sh)) must equal " +
          "minhashCandidates(sh)")
      // and the VERIFIED component structure is unchanged
      val ids = sh.select(col("id"))
      def labels(cand: Set[(Long, Long)]) = Dedup.componentLabels(ids,
          cand.toSeq.toDF("ida", "idb"))
        .as[(Long, Long)].collect().toMap
      assert(labels(capped) == labels(full))
    } finally { sh.unpersist(); () }
  }

  test("minhash incremental standingRankCap: a shard clone meets exactly " +
      "the 8 lowest-id standing members incl. the minimum; MaxValue all") {
    // standing = 12 exact clones (even ids 0..22): identical
    // signatures put the whole cluster in every band bucket. A shard
    // doc with the same text collides with all 12; the cap keeps the
    // 8 lowest standing ids per bucket — deterministic.
    val base = "the winnowing fingerprint window walks a monotone deque " +
      "across character grams so any run of at least twenty characters " +
      "shared verbatim between two documents must surface a common " +
      "minimum hash that lands both documents in one postings group"
    val standing = (0 until 12).map(i => (2L * i, base)).toDF("my_id", "body")
    val shard = Seq((99L, base)).toDF("my_id", "body")
    val index = Dedup.buildMinHashIndex(standing, "my_id", "body")
    val got = Dedup.probeIncrementalMinhash(shard, "my_id", "body", index)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got == (0 until 8).map(i => (2L * i, 99L)).toSet,
      s"cap 8 keeps the 8 lowest standing ids: $got")
    val full = Dedup.probeIncrementalMinhash(shard, "my_id", "body", index,
        standingRankCap = Int.MaxValue)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(full == (0 until 12).map(i => (2L * i, 99L)).toSet, full.toString)
  }

  test("winnow rank cap: star coverage with EXACT n_shared; dropped " +
      "pairs are only high-rank x high-rank; MaxValue restores all") {
    val post = Dedup.winnowPostings(dupCluster(12), "my_id", "body")
      .persist()
    try {
      val full = Dedup
        .winnowPairsFromPostings(post, minShared = 4, rankCap = Int.MaxValue)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, n) => (a, b) -> n }.toMap
      assert(full.size == 66, // the 12-clique: every pair shares the base
        s"expected the full clique, got ${full.size} pairs")
      val capped = Dedup.winnowPairsFromPostings(post, minShared = 4)
        .as[(Long, Long, Long)].collect()
        .map { case (a, b, n) => (a, b) -> n }.toMap
      // capped ⊂ full with IDENTICAL exact counts on survivors
      assert(capped.keySet.subsetOf(full.keySet))
      capped.foreach { case (p, n) =>
        assert(full(p) == n, s"n_shared drifted on $p: $n vs ${full(p)}") }
      // star coverage: the cluster minimum pairs with every member
      (1L to 11L).foreach(b => assert(capped.contains((0L, b)),
        s"star pair (0,$b) must survive the cap"))
      // what the cap drops is exactly the high-rank x high-rank tail
      // (ids 8..11 rank 9..12 in every shared fingerprint group)
      val dropped = full.keySet -- capped.keySet
      assert(dropped.nonEmpty, "a 12-clique must exceed rankCap 8")
      assert(dropped.forall { case (a, b) => a >= 8L && b >= 8L },
        s"only both-high-rank pairs may drop: $dropped")
    } finally { post.unpersist(); () }
  }

  test("winnowStarEdges: O(g) edges, components identical to the " +
      "exhaustive pair graph") {
    // mixed topology: an 11-dup cluster, a separate shared-run pair,
    // and isolated docs
    val shared = "this exact forty-plus character run is copied verbatim into both docs"
    val corpus = dupCluster(11).union(Seq(
      (20L, s"alpha prologue $shared and then some trailing words here"),
      (21L, s"a different opening passage here $shared closing words"),
      (30L, "nothing in common with the others at all in any respect"),
      (31L, "likewise dissimilar content that shares no long character runs"))
      .toDF("my_id", "body"))
    val post = Dedup.winnowPostings(corpus, "my_id", "body").persist()
    try {
      val star = Dedup.winnowStarEdges(post)
        .select(col("a").as("ida"), col("b").as("idb"))
      val exhaustive = Dedup
        .winnowPairsFromPostings(post, minShared = 1, rankCap = Int.MaxValue)
        .select(col("a").as("ida"), col("b").as("idb"))
      // star emits strictly fewer edges on the cluster...
      assert(star.count() < exhaustive.count())
      val ids = corpus.select(col("my_id").as("id"))
      val lStar = Dedup.componentLabels(ids, star)
      val lFull = Dedup.componentLabels(ids, exhaustive)
      try { // ...with identical component labels
        val diff = lStar.as[(Long, Long)].collect().toMap
          .toSet -- lFull.as[(Long, Long)].collect().toMap.toSet
        assert(diff.isEmpty, s"labels drifted: $diff")
      } finally { lStar.unpersist(); lFull.unpersist() }
    } finally { post.unpersist(); () }
  }

  test("probeIncremental against a LOADED index: no corpus re-signing, " +
      "pairs equal the batch rebuild's cross pairs") {
    // a richer corpus: near-dup pairs that cross the halves, one pair
    // inside a half (must NOT be emitted), and a hot shingle
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (4L, "unrelated filler content with nothing shared at all here"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota mu"), // ~0
      (3L, "one two three four five six seven eight nine ten twelve"), // ~2
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota nu") // ~0, ~1
    ).toDF("my_id", "body")
    val standing = corpus.filter($"my_id" % 2 === 0)
    val shard = corpus.filter($"my_id" % 2 === 1)

    // standing index written once, then LOADED — the production shape
    val dir = java.nio.file.Files.createTempDirectory("graft-idx-")
      .toString
    Dedup.writeIndex(Dedup.buildIndex(standing, "my_id", "body"), dir)
    val index = Dedup.loadIndex(spark, dir)
    val probe = Dedup.probeIncremental(shard, "my_id", "body", index)

    // structural no-re-signing proof: every file scanned by the probe
    // plan is under the index dir — the standing corpus' source never
    // appears (its lineage was severed by the parquet round-trip)
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val leaves = probe.queryExecution.optimizedPlan.collectLeaves()
    val scannedFiles = leaves.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Seq.empty
      }
    }.flatten
    assert(scannedFiles.nonEmpty && scannedFiles.forall(_.contains(dir)),
      s"probe must scan only the index parquet, got: $scannedFiles")
    // and every non-file leaf is the in-memory shard relation — either
    // the LocalRelation source or the probe's localCheckpoint of the
    // shard postings (LogicalRDD, O(shard) by construction; the
    // corpus side can only enter as a LogicalRelation file scan,
    // which the dir assertion above pins to the index parquet)
    assert(leaves.forall {
      case _: LogicalRelation => true
      case l => l.getClass.getSimpleName.contains("LocalRelation") ||
        l.getClass.getSimpleName.contains("LogicalRDD")
    }, leaves.map(_.getClass.getSimpleName).toString)

    // differential: equals the batch-global rebuild restricted to
    // cross-half pairs (the increment-equals-rebuild theorem)
    val shAll = Dedup.shingleSignatures(corpus, "my_id", "body")
    val batch = Dedup.cappedInvertedIndex(shAll)
    val batchCross = batch.select(col("id").as("ida"), col("s"))
      .join(batch.select(col("id").as("idb"), col("s")), Seq("s"))
      .filter(col("ida") % 2 === 0 && col("idb") % 2 === 1)
      .groupBy("ida", "idb").agg(count(lit(1)).as("n_shared"))
      .as[(Long, Long, Long)].collect().toSet
    val got = probe.as[(Long, Long, Long)].collect().toSet
    assert(got == batchCross, s"incremental $got vs batch $batchCross")
    assert(got.exists { case (a, b, _) => a == 0L && b == 1L }, got.toString)
    assert(got.forall { case (a, b, _) => a % 2 == 0 && b % 2 == 1 })
  }

  test("BUCKETED standing index: probe equals the plain-index probe " +
      "and no corpus-side scan feeds a shuffle Exchange") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{
      ReusedExchangeExec, ShuffleExchangeLike}
    import org.apache.spark.sql.execution.joins.BaseJoinExec

    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (4L, "unrelated filler content with nothing shared at all here"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
      (3L, "one two three four five six seven eight nine ten twelve"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota nu")
    ).toDF("my_id", "body")
    val standing = corpus.filter($"my_id" % 2 === 0)
    val shard = corpus.filter($"my_id" % 2 === 1)

    Dedup.writeIndexBucketed(Dedup.buildIndex(standing, "my_id", "body"),
      "graft_test_bidx", nBuckets = 4)
    val bucketed = Dedup.loadIndexBucketed(spark, "graft_test_bidx")

    // same answer as the plain parquet-round-trip index
    val dir = java.nio.file.Files.createTempDirectory("graft-bidx-").toString
    Dedup.writeIndex(Dedup.buildIndex(standing, "my_id", "body"), dir)
    val plain = Dedup.probeIncremental(shard, "my_id", "body",
      Dedup.loadIndex(spark, dir)).as[(Long, Long, Long)].collect().toSet
    assert(Dedup.probeIncremental(shard, "my_id", "body", bucketed)
      .as[(Long, Long, Long)].collect().toSet == plain)

    // Plan property (VERDICT r12 what's-wrong #2): with broadcast off
    // (AQE would broadcast these toy frames; a 100 TB corpus side is
    // never broadcastable) every shuffle Exchange in the probe plan
    // must have a JOIN below it — i.e. it moves join/agg OUTPUT, never
    // the standing postings/df scans themselves, which read in place
    // through their bucket layout.
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probe = Dedup.probeIncremental(shard, "my_id", "body", bucketed)
      probe.collect() // resolve AQE stages
      def subtree(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => subtree(a.executedPlan)
        case q: QueryStageExec => subtree(q.plan)
        case r: ReusedExchangeExec => subtree(r.child)
        case other => other.children.flatMap(subtree)
      })
      val all = subtree(probe.queryExecution.executedPlan)
      val bucketedScans = all.collect {
        case f: FileSourceScanExec if f.relation.bucketSpec.isDefined => f }
      assert(bucketedScans.size >= 2, // postings + df both read bucketed
        s"expected bucketed scans, plan:\n${probe.queryExecution.executedPlan}")
      val offending = all.collect {
        case e: ShuffleExchangeLike if {
          val below = subtree(e.asInstanceOf[SparkPlan]).drop(1)
          below.exists {
            case f: FileSourceScanExec => f.relation.bucketSpec.isDefined
            case _ => false
          } && !below.exists(_.isInstanceOf[BaseJoinExec])
        } => e
      }
      assert(offending.isEmpty,
        s"standing-index scan feeds a shuffle:\n${offending.mkString("\n")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("bucketed MinHash standing index round-trips and matches the " +
      "plain-index probe") {
    val sh = Dedup.shingleSignatures(docs, "my_id", "body")
    val standing = sh.filter($"id" % 2 === 0) // shingleSignatures aliases idCol to "id"
    val shardSig = sh.filter($"id" % 2 === 1)
    val idx = Dedup.MinHashIndex(Dedup.bandedBuckets(standing), standing)
    Dedup.writeMinHashIndexBucketed(idx, "graft_test_mhidx", nBuckets = 4)
    val loaded = Dedup.loadMinHashIndexBucketed(spark, "graft_test_mhidx")
    val want = Dedup.probeMinhashFromSignatures(shardSig, idx,
      minJaccard = 0.4).as[(Long, Long, Double)].collect().toSet
    val got = Dedup.probeMinhashFromSignatures(shardSig, loaded,
      minJaccard = 0.4).as[(Long, Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty, s"$got vs $want")
  }

  test("probeIncremental: stop-shingles stay capped across increments") {
    // a shingle over the cap in the STANDING corpus has no postings;
    // the complete df table must keep it suppressed even though the
    // new shard alone would be under the cap
    val hot = "common shared trigram here"
    val standing = (0L to 5L).map(i => (i * 2, s"$hot filler$i words$i"))
      .toDF("my_id", "body")
    val shard = Seq((1L, s"$hot other content")).toDF("my_id", "body")
    val index = Dedup.buildIndex(standing, "my_id", "body", dfCap = 4)
    // standing df for the hot shingles = 6 > 4 -> no postings, and the
    // probe must emit nothing (combined df only grew)
    assert(Dedup.probeIncremental(shard, "my_id", "body", index,
      dfCap = 4).count() == 0)
    // sanity: with a cap that admits them, the pair appears
    val loose = Dedup.buildIndex(standing, "my_id", "body", dfCap = 100)
    assert(Dedup.probeIncremental(shard, "my_id", "body", loose,
      dfCap = 100).count() > 0)
  }

  test("winnow-tier incremental: probe equals fixed-cap batch rebuild; " +
      "extend equals rebuild") {
    val shared = "this exact forty-plus character run is copied verbatim into both docs"
    val corpus = Seq(
      (0L, s"alpha prologue $shared and then some trailing words here"),
      (1L, s"a completely different opening passage $shared closing words"),
      (2L, "nothing in common with the others at all in any respect"),
      (3L, "likewise dissimilar content that shares no long character runs"))
      .toDF("my_id", "body")
    val standing = corpus.filter($"my_id" % 2 === 0)
    val shard = corpus.filter($"my_id" % 2 === 1)
    val index = Dedup.buildWinnowIndex(standing, "my_id", "body", dfCap = 8)
    val got = Dedup.probeIncrementalWinnow(shard, "my_id", "body", index,
      dfCap = 8).as[(Long, Long, Long)].collect().toSet
    // batch: fixed-cap postings over the whole corpus, cross-restricted
    val batch = Dedup.buildWinnowIndex(corpus, "my_id", "body", dfCap = 8)
      .postings
    val expect = batch.select(col("id").as("ida"), col("s"))
      .join(batch.select(col("id").as("idb"), col("s")), Seq("s"))
      .filter(col("ida") % 2 === 0 && col("idb") % 2 === 1)
      .groupBy("ida", "idb").agg(count(lit(1)).as("n"))
      .filter(col("n") >= 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expect, s"incremental $got vs batch $expect")
    assert(got.exists { case (a, b, _) => a == 0L && b == 1L },
      s"the shared-run cross pair must appear: $got")

    val ext = Dedup.extendWinnowIndex(index, shard, "my_id", "body",
      dfCap = 8)
    val rebuilt = Dedup.buildWinnowIndex(corpus, "my_id", "body", dfCap = 8)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    assert(rows(ext.postings) == rows(rebuilt.postings))
    assert(rows(ext.df) == rows(rebuilt.df))
  }

  test("extendIndex equals a batch rebuild over corpus ∪ shard") {
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two three four five six seven eight nine ten eleven"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
      (3L, "one two three four five six seven eight nine ten twelve")
    ).toDF("my_id", "body")
    val standing = corpus.filter($"my_id" % 2 === 0)
    val shard = corpus.filter($"my_id" % 2 === 1)
    // a tight cap so some shingles ARE capped during the extension
    val ext = Dedup.extendIndex(
      Dedup.buildIndex(standing, "my_id", "body", dfCap = 3),
      shard, "my_id", "body", dfCap = 3)
    val rebuilt = Dedup.buildIndex(corpus, "my_id", "body", dfCap = 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    assert(rows(ext.postings) == rows(rebuilt.postings))
    assert(rows(ext.df) == rows(rebuilt.df))
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

  test("keepBestRepresentatives: max score wins, ties to smallest id, " +
      "singletons keep themselves") {
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), // component 1
      (4L, 4L), (5L, 4L),           // component 4: tied scores
      (6L, 6L))                     // singleton
      .toDF("id", "component")
    val scores = Seq(
      (1L, 10L), (2L, 99L), (3L, 50L),
      (4L, 7L), (5L, 7L),
      (6L, 1L)).toDF("id", "score")
    val out = Dedup.keepBestRepresentatives(labels, scores)
      .select("component", "keeper", "best_score", "n_members")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 99L, 3L)), s"$out") // best quality, not first
    assert(out(4L) == ((4L, 7L, 2L)), s"$out")  // tie -> smallest id
    assert(out(6L) == ((6L, 1L, 1L)), s"$out")  // singleton survives
  }

  test("minhash-tier incremental: probe against a LOADED sketch index " +
      "equals the batch rebuild's cross pairs; extend equals rebuild") {
    val standing = docs.filter($"my_id" % 2 === 0)
    val shard = docs.filter($"my_id" % 2 === 1)
    val dir = java.nio.file.Files.createTempDirectory("graft-mhidx-")
      .toString
    Dedup.writeMinHashIndex(
      Dedup.buildMinHashIndex(standing, "my_id", "body"), dir)
    val index = Dedup.loadMinHashIndex(spark, dir)
    val probe = Dedup.probeIncrementalMinhash(shard, "my_id", "body", index)

    // structural no-re-signing proof (same as the shingle tier): the
    // probe plan scans only the index parquet — the standing corpus'
    // source is unreachable after the round-trip
    import org.apache.spark.sql.execution.datasources.{
      HadoopFsRelation, LogicalRelation}
    val leaves = probe.queryExecution.optimizedPlan.collectLeaves()
    val scannedFiles = leaves.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.inputFiles.toSeq
        case _ => Seq.empty
      }
    }.flatten
    assert(scannedFiles.nonEmpty && scannedFiles.forall(_.contains(dir)),
      s"probe must scan only the index parquet, got: $scannedFiles")

    val got = probe.select("ida", "idb").as[(Long, Long)].collect().toSet
    // batch: candidates + verify over the FULL corpus, restricted to
    // cross-half pairs normalized to (even, odd) — sketches are
    // corpus-independent, so increment must equal rebuild exactly
    val sh = Dedup.shingleSignatures(docs, "my_id", "body")
    val batch = Dedup.verifiedPairs(sh, Dedup.minhashCandidates(sh), 0.8)
      .filter((col("ida") % 2) =!= (col("idb") % 2))
      .select(
        when(col("ida") % 2 === 0, col("ida")).otherwise(col("idb"))
          .as("a"),
        when(col("ida") % 2 === 0, col("idb")).otherwise(col("ida"))
          .as("b"))
      .as[(Long, Long)].collect().toSet
    assert(got == batch, s"incremental $got vs batch $batch")
    assert(got.contains((10L, 11L)), s"the near-dup cross pair: $got")

    // extend = union of per-doc sketches = exactly a batch rebuild
    val ext = Dedup.extendMinHashIndex(
      Dedup.buildMinHashIndex(standing, "my_id", "body"),
      shard, "my_id", "body")
    val rebuilt = Dedup.buildMinHashIndex(docs, "my_id", "body")
    assert(ext.buckets.except(rebuilt.buckets).isEmpty &&
      rebuilt.buckets.except(ext.buckets).isEmpty)
    assert(ext.signatures.except(rebuilt.signatures).isEmpty &&
      rebuilt.signatures.except(ext.signatures).isEmpty)
  }
}
