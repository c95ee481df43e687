package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Committed recall measurement for the MinHash-LSH rank cap
  * (VERDICT r15 next-round #4): every capped dedup oracle mirrors the
  * cap in its SQL, so a green row proves spec-conformance, not
  * recall — this tool quantifies what `rankCap = 8` actually costs on
  * dup clusters of the sizes a crawl corpus has (tens to thousands),
  * against the exhaustive `rankCap = Int.MaxValue` enumeration.
  *
  * Corpus recipe (fully deterministic, no rand()): for each cluster
  * size c ∈ {10, 100, 1000}, c near-identical documents — one shared
  * ~60-token base plus a distinct per-doc suffix token, so every pair
  * verifies at Jaccard ≈ 0.9 over 3-token shingles — plus 50 isolated
  * filler docs with disjoint vocabulary. Two recall notions:
  *
  *  - PAIR recall: |capped verified pairs| / |exhaustive verified
  *    pairs|. Expected to collapse on large cliques — the cap keeps
  *    O(rankCap·c) of the C(c,2) clique — by design.
  *  - DUPLICATE-DETECTION recall: of the docs the exhaustive run
  *    marks removable (component != min-id keeper), what fraction the
  *    capped run also marks. This is the number that matters for
  *    dedup output correctness; the star guarantee (rank 1 always
  *    pairs) predicts 1.0 at every cluster size.
  *
  * Writes docs/RECALL_AB.json; the numbers are cited in
  * [[Dedup.minhashCandidates]]'s rankCap docstring.
  *
  *   sbt "runMain graft.tools.RecallAB"
  */
object RecallAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    def corpus(c: Int) = {
      val cluster = (0 until c).map(i => (i.toLong, s"$base suffix$i"))
      val filler = (0 until 50).map(i =>
        (100000L + i, (1 to 40).map(j => s"iso${i}w$j").mkString(" ")))
      (cluster ++ filler).toDF("id", "text")
    }

    def pairsOf(sh: org.apache.spark.sql.DataFrame, cap: Int,
        chain: Boolean) =
      Dedup.verifiedPairs(sh,
          Dedup.minhashCandidates(sh, rankCap = cap, chainLink = chain),
          0.8)
        .select("ida", "idb").as[(Long, Long)].collect().toSet
    def dupsOf(sh: org.apache.spark.sql.DataFrame,
        p: Set[(Long, Long)]) = {
      val lbl = Dedup.componentLabels(sh.select(col("id")),
        p.toSeq.toDF("ida", "idb"))
      val d = lbl.filter(col("id") =!= col("component"))
        .select("id").as[Long].collect().toSet
      lbl.unpersist()
      d
    }

    val rows = Seq(10, 100, 1000).map { c =>
      val sh = Dedup.shingleSignatures(corpus(c), "id", "text")
        .persist()
      val full = pairsOf(sh, Int.MaxValue, chain = false)
      val capped = pairsOf(sh, 8, chain = false)
      val chained = pairsOf(sh, 8, chain = true)
      val fullDups = dupsOf(sh, full)
      val cappedDups = dupsOf(sh, capped)
      val chainedDups = dupsOf(sh, chained)
      sh.unpersist()
      val pairRecall = if (full.isEmpty) 1.0
        else capped.size.toDouble / full.size
      val dupRecall = if (fullDups.isEmpty) 1.0
        else (cappedDups & fullDups).size.toDouble / fullDups.size
      val chainDupRecall = if (fullDups.isEmpty) 1.0
        else (chainedDups & fullDups).size.toDouble / fullDups.size
      println(f"cluster=$c%4d pairs capped/full=${capped.size}/${full.size}" +
        f" pair_recall=$pairRecall%.4f dup_recall=$dupRecall%.4f" +
        f" chain_dup_recall=$chainDupRecall%.4f")
      f"""  {"cluster_size": $c, "verified_pairs_capped": ${capped.size},
         |   "verified_pairs_exhaustive": ${full.size},
         |   "pair_recall": $pairRecall%.4f,
         |   "dups_flagged_capped": ${cappedDups.size},
         |   "dups_flagged_exhaustive": ${fullDups.size},
         |   "duplicate_detection_recall": $dupRecall%.4f,
         |   "duplicate_detection_recall_chained": $chainDupRecall%.4f,
         |   "capped_only_false_flags": ${(cappedDups -- fullDups).size}}""".stripMargin
    }

    // ── Mixed-bucket topology (round 17, VERDICT r16 next #4): the
    // adversarial case v1's caveat excluded. A crowd of 100
    // near-identical docs (ids 0..99) plus satellite TWIN pairs whose
    // text the crowd's base dominates: each twin pair shares the base
    // B (58 shingles) and a small per-pair extra set E (8 shingles),
    // and differs only in an 8-shingle per-twin tail, so
    // J(twin, twin) ≈ 0.80-0.84 (their ONLY true match) while
    // J(twin, crowd) ≈ 0.77 < 0.8. Most twin bands take all four
    // minima from B and collapse into the crowd's buckets, where the
    // twins' ranks (ids 100000+) are far beyond the cap; a pair with
    // NO private band (no band whose slice draws a minimum from E) is
    // invisible to the id-rank star — the measured drop. The chain
    // backstop sorts each crowded bucket by the digests of the bands
    // at circular offsets 1..4, where twins sharing another crowded
    // band tie (both all-B) and ids make them adjacent.
    val nSat = 400
    val mixed = {
      val crowd = (0 until 100).map(i => (i.toLong, s"$base crowd$i"))
      val sats = (0 until nSat).flatMap { j =>
        val e = (1 to 8).map(k => s"p${j}e$k").mkString(" ")
        val tx = (1 to 8).map(k => s"xa${j}t$k").mkString(" ")
        val ty = (1 to 8).map(k => s"xb${j}t$k").mkString(" ")
        Seq((100000L + 2 * j, s"$base $e $tx"),
          (100001L + 2 * j, s"$base $e $ty"))
      }
      (crowd ++ sats).toDF("id", "text")
    }
    val msh = Dedup.shingleSignatures(mixed, "id", "text").persist()
    val mFull = pairsOf(msh, Int.MaxValue, chain = false)
    val mStar = pairsOf(msh, 8, chain = false)
    val mChain = pairsOf(msh, 8, chain = true)
    val twins = (0 until nSat)
      .map(j => (100000L + 2 * j, 100001L + 2 * j)).toSet
    val twinTrue = mFull & twins
    val twinStar = mStar & twinTrue
    val twinChain = mChain & twinTrue
    val mFullDups = dupsOf(msh, mFull)
    val mStarDups = dupsOf(msh, mStar)
    val mChainDups = dupsOf(msh, mChain)
    msh.unpersist()
    val twinStarRecall = twinStar.size.toDouble / twinTrue.size
    val twinChainRecall = twinChain.size.toDouble / twinTrue.size
    val mStarDupRecall = (mStarDups & mFullDups).size.toDouble /
      mFullDups.size
    val mChainDupRecall = (mChainDups & mFullDups).size.toDouble /
      mFullDups.size
    println(f"mixed: twin pairs true=${twinTrue.size}/$nSat " +
      f"star_recall=$twinStarRecall%.4f chain_recall=$twinChainRecall%.4f " +
      f"dup star=$mStarDupRecall%.4f chain=$mChainDupRecall%.4f")
    val mixedJson =
      f""" "mixed_bucket": {
         |  "topology": "crowd of 100 near-identical docs (ids 0..99) + $nSat satellite twin pairs (ids 100000+2j/100001+2j): base B(58 shingles) + shared per-pair extras E(8) + per-twin tail(8); J(twin,twin)~0.80-0.84 is each twin's ONLY true match, J(twin,crowd)~0.77; twin bands whose four minima all come from B collapse into the crowd's buckets where twin ranks are >> rankCap",
         |  "params_same_as_above": true,
         |  "twin_pairs_exhaustive_verified": ${twinTrue.size},
         |  "twin_pairs_star_only": ${twinStar.size},
         |  "twin_pairs_with_chain": ${twinChain.size},
         |  "twin_pair_recall_star_only": $twinStarRecall%.4f,
         |  "twin_pair_recall_with_chain": $twinChainRecall%.4f,
         |  "duplicate_detection_recall_star_only": $mStarDupRecall%.4f,
         |  "duplicate_detection_recall_with_chain": $mChainDupRecall%.4f,
         |  "chain_false_flags": ${(mChainDups -- mFullDups).size}
         | }""".stripMargin

    val json =
      s"""{
         | "purpose": "recall cost of minhashCandidates rankCap=8 vs Int.MaxValue (VERDICT r15 #4) and of the round-17 chainLink backstop (VERDICT r16 #4): pair recall collapses on large cliques BY DESIGN (the cap keeps O(rankCap*c) of C(c,2)); duplicate-detection recall is the output-correctness number",
         | "corpus": "per cluster size: c docs sharing a 60-token base + distinct suffix token (pairwise Jaccard ~0.9 over 3-token shingles) + 50 isolated filler docs; deterministic, no rand()",
         | "params": {"rankCap": 8, "nHashes": 32, "bands": 8, "rowsPerBand": 4, "minJaccard": 0.8, "chainLink_default": true},
         | "caveat": "single-clique topology: every in-cluster pair is a true near-dup, so capped enumeration cannot ADMIT a duplicate here. Jaccard non-transitivity (a doc whose ONLY match outranks the cap in a crowded MIXED bucket) is measured by the mixed_bucket record below; pass Int.MaxValue for compliance-grade runs.",
         | "clusters": [
         |${rows.mkString(",\n")}
         | ],
         |$mixedJson
         |}
         |""".stripMargin
    val dest = java.nio.file.Paths.get(
      sys.env.getOrElse("GRAFT_REPO_DIR", "/root/repo"),
      "docs", "RECALL_AB.json")
    java.nio.file.Files.write(dest,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"wrote $dest")
    spark.stop()
  }
}
