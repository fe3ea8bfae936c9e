package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sizing probe behind the round-12 containment spill work: counts
  * the candidate-generation stages of `q_dedup_containment` on any
  * sfDir — reps, raw min-shingle candidate pairs, pairs after the
  * exact size gate, and the candidate-participant id sets the
  * broadcast semi-prune keeps — so the rescore's shuffle mass is
  * attributed with numbers instead of guesses.
  * Usage: ContainProbe <sfDir>
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(s"[contain] $tag: ${(System.nanoTime() - t0) / 1e9} s")
      r
    }
    val hsh = graft.llm.Dedup.containmentHashTable(spark, sfDir)
    val nReps = t("stage+count reps")(hsh.count())
    val sizes = hsh.select(col("doc_id"), size(col("hs")).as("n"))
    val probes = hsh.select(col("doc_id").as("doc_a"),
      array_min(col("hs")).as("mh"))
    val idx = hsh.select(col("doc_id").as("doc_b"), explode(col("hs")).as("h"))
    val nPost = t("postings count")(idx.count())
    val cand0 = probes
      .join(idx, col("mh") === col("h") && col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val nCand0 = t("raw candidates")(cand0.count())
    val nCand0d = t("distinct candidates")(cand0.distinct().count())
    val mask = aggregate(col("hs"),
      expr("array_repeat(0L, 4)"),
      (acc, h) => {
        val word = pmod(h, lit(256L)).cast("int") / lit(64)
        val bit = call_function("shiftleft", lit(1L),
          pmod(h, lit(64L)).cast("int"))
        transform(acc, (x, i) =>
          when(i === word.cast("int"), x.bitwiseOR(bit)).otherwise(x))
      })
    val sizesMk = hsh.select(col("doc_id"), size(col("hs")).as("n"),
      mask.as("mk"))
    val joined = cand0.distinct()
      .join(sizesMk.select(col("doc_id").as("doc_a"), col("n").as("n_a"),
        col("mk").as("mk_a")).hint("shuffle_hash"), "doc_a")
      .join(sizesMk.select(col("doc_id").as("doc_b"), col("n").as("n_b"),
        col("mk").as("mk_b")).hint("shuffle_hash"), "doc_b")
    val missingBits = aggregate(
      zip_with(col("mk_a"), col("mk_b"),
        (x, y) => bit_count(x.bitwiseAND(bitwise_not(y))).cast("long")),
      lit(0L), (acc, v) => acc + v)
    val nSize = t("size-gated candidates")(joined
      .filter(col("n_b").cast("double") >= lit(0.9) * col("n_a")).count())
    val gated = joined
      .filter(col("n_b").cast("double") >= lit(0.9) * col("n_a")
        && missingBits.cast("double") <= lit(0.1) * col("n_a"))
      .select(col("doc_a"), col("doc_b"))
    val nGated = t("size+mask-gated candidates")(gated.count())
    println(s"[contain] sizeGated=$nSize")
    val nA = t("distinct doc_a")(gated.select("doc_a").distinct().count())
    val nB = t("distinct doc_b")(gated.select("doc_b").distinct().count())
    val mass = t("pair-carried array mass (longs)")(
      gated.join(sizes.select(col("doc_id").as("doc_a"), col("n")), "doc_a")
        .agg(sum(col("n"))).head.getLong(0))
    println(s"[contain] reps=$nReps postings=$nPost cand0=$nCand0 " +
      s"distinct=$nCand0d gated=$nGated aIds=$nA bIds=$nB pairArrayLongs=$mass")
    spark.stop()
  }
}
