package graft

import graft.operators.Curate
import org.apache.spark.sql.functions._

/** The public curation API over arbitrary user frames. */
class CurateApiSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "en", "the quick brown fox jumps over the lazy dog again"),
    (2L, "en", "ok"),                               // too short
    (3L, "de", "der schnelle braune fuchs springt heute wieder sehr hoch"),
    (4L, "en", "1234 5678 9012 3456 7890 1234 5678")) // digits: low alpha
    .toDF("id", "lang", "body")

  test("qualityFilter applies token/alpha/lang gates") {
    val kept = Curate.qualityFilter(docs, "body", "lang")
      .select("id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L))
    val keptDe = Curate.qualityFilter(docs, "body", "lang",
      langs = Seq("en", "de")).select("id").as[Long].collect().sorted
    assert(keptDe.toSeq == Seq(1L, 3L))
  }

  test("packSequences fills the token budget per shard in order") {
    val out = Curate.packSequences(docs, "body", "lang", "id",
      budgetTokens = 12)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // en shard: doc1 (10 tok) -> pack 0; doc2 (1) -> pack 0 (cum 10);
    // doc4 (7) -> cum before = 11 -> floor(11/12) = 0
    assert(out(1L) == 0L && out(2L) == 0L)
    assert(out(3L) == 0L) // de shard starts fresh
  }

  test("redactPii replaces digit runs and emails") {
    val red = Curate.redactPii(
      Seq((1L, "mail me at a.b@example.com or call +1 (555) 123-4567 id 9876543"))
        .toDF("id", "body"), "body")
      .select("text_redacted").as[String].head()
    assert(!red.contains("example.com") && red.contains("<email>"), red)
    assert(red.contains("<phone>"), red)
    assert(!red.contains("9876543"), red)
  }

  test("sampleSplit is deterministic and covers all three splits") {
    val many = (1 to 300).map(i => (i.toLong, s"document number $i body"))
      .toDF("id", "body")
    val a = Curate.sampleSplit(many, "body").select("id", "split")
      .as[(Long, String)].collect().toMap
    val b = Curate.sampleSplit(many, "body").select("id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b, "split must be deterministic")
    assert(a.values.toSet == Set("train", "val", "test"))
  }
}
