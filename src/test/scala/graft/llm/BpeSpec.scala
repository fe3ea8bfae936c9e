package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The properties the BPE boundary encoding must hold — hand-computed
  * on a planted corpus whose words exercise exactly the cases where a
  * naive single-separator replace goes wrong:
  *
  *   - `aaaa` with merge (a,a): OVERLAPPING adjacent pairs must merge
  *     greedily left-to-right to `aa aa` (one shared boundary per
  *     match), not stop after one merge;
  *   - `aaa`: the odd tail survives as `aa a`;
  *   - tie-break: (aa,aa) and (a,b) tie on weighted count in round 2
  *     and the pair-ascending order must pick (a,b) — deterministic
  *     across engines and partitionings;
  *   - multi-char symbols: merging (aa,aa) in round 3 must NOT
  *     false-match inside `aa␟␟a` (the tail of one symbol + the next).
  */
class BpeSpec extends SparkSpec {

  test("planted corpus: greedy overlap, odd tail, tie-break, no false match") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    Seq(
      (1L, "aaaa aaa abab", "en", "s1", 13L),
      (2L, "aaaa", "en", "s1", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")

    // weighted pair counts: r1 (a,a)=8 wins; r2 ties (aa,aa)=2 with
    // (a,b)=2 → 'a' < 'aa' picks (a,b); r3 (aa,aa)=2 wins
    val merges = Bpe.merges(spark, dir)
      .orderBy("round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq(
      (1L, "a", "a", 8L), (2L, "a", "b", 2L), (3L, "aa", "aa", 2L)))

    val segs = Bpe.segmented(spark, dir)
      .select("word", "segmentation", "n_symbols").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(segs("aaaa") == (("aaaa", 1L)), "overlapping pairs must merge greedily, then fuse")
    assert(segs("aaa") == (("aa a", 2L)), "odd tail must survive (and never false-match)")
    assert(segs("abab") == (("ab ab", 2L)), "round-2 tie-break merge must apply")
  }

  test("segmentation round-trips: symbols concatenate back to the word") {
    val bad = Bpe.segmented(spark, sf001)
      .filter(regexp_replace(col("segmentation"), " ", "") =!= col("word"))
      .count()
    assert(bad == 0L, "every word must be exactly partitioned by its symbols")
  }
}
