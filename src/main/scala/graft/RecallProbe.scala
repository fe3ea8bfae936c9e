package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-dup LSH recall/cost curve: for each (bands, r[, multiprobe])
  * config, measure recall of [[graft.llm.Similarity.nearDupPairsOf]]
  * (or the one-bit [[graft.llm.Similarity.nearDupPairsMultiProbe]])
  * against the exhaustive pair set, the raw candidate-pair count
  * (cost), and wall time — the evidence base for the (B, r)
  * operating point (VERDICT r8 item 4; r9 item 5 added the
  * multiprobe column). Usage: RecallProbe <sfDir>
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Similarity

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val r0 = Similarity.nearDupPlanesFor(n)
    val truePairs = Similarity.embeddingNearDupBrute(spark, sfDir)
      .select(col("vec_a"), col("vec_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[recall] n=$n r0=$r0 truePairs=${truePairs.size}")

    /** Raw candidate mass: the same join, cosine filter removed. */
    def candCount(bands: Int, r: Int, mp: Boolean): Long = {
      val e2 = graft.Materialize.stage(emb.withColumn("sigs",
        Similarity.bandSignatureCols(col("embedding"), bands, r)),
        eager = false)
      val ex = e2.select(col("vec_id"), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "bucket")))
      val bS = ex.select(col("band"), col("bucket"),
        col("vec_id").as("vec_b"), col("sigs").as("sigs_b"))
      val aS: DataFrame =
        if (!mp)
          ex.select(col("band"), col("bucket"),
            col("vec_id").as("vec_a"), col("sigs").as("sigs_a"))
        else {
          val masks = array((lit(0) +: (0 until r).map(j => lit(1 << j))): _*)
          ex.select(col("vec_id").as("vec_a"), col("sigs").as("sigs_a"),
              col("band"), col("bucket").as("bucket0"))
            .select(col("vec_a"), col("sigs_a"), col("band"),
              explode(transform(masks, m => col("bucket0").bitwiseXOR(m)))
                .as("bucket"))
        }
      val dedup =
        if (!mp) graft.functions.FirstCollision.first_collision(
          col("sigs_a"), col("sigs_b")) === col("band")
        else graft.functions.FirstNearCollision.first_near_collision(
          col("sigs_a"), col("sigs_b"), 1) === col("band")
      aS.join(bS, Seq("band", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .filter(dedup)
        .count()
    }

    // (bands, r, one-bit-multiprobe?)
    val configs = Seq(
      (16, r0 - 1, false), (16, r0, false), (32, r0, false),
      (64, r0, false), (32, r0 + 1, false), (64, r0 + 1, false),
      (128, r0 + 1, false), (128, r0 + 2, false), (256, r0 + 2, false),
      (256, r0 + 3, false),
      // multiprobe: same index mass as the exact config, probe side
      // ×(r+1); compare against the exponential-bands escalation row
      (16, r0 + 1, true), (32, r0 + 1, true), (64, r0 + 1, true),
      (64, r0 + 2, true), (128, r0 + 2, true), (64, r0 + 3, true),
      (128, r0 + 3, true))
    println(f"${"B"}%5s ${"r"}%3s ${"mp"}%3s ${"recall"}%7s ${"cands"}%10s ${"found"}%7s ${"sec"}%6s")
    configs.foreach { case (bands, r, mp) =>
      val t0 = System.nanoTime()
      val pairs =
        if (mp) Similarity.nearDupPairsMultiProbe(emb, bands, r)
        else Similarity.nearDupPairsOf(emb, bands, r)
      val found = pairs.select(col("vec_a"), col("vec_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val cands = candCount(bands, r, mp)
      val recall =
        if (truePairs.isEmpty) 1.0
        else found.intersect(truePairs).size.toDouble / truePairs.size
      println(f"$bands%5d $r%3d ${if (mp) "y" else "n"}%3s $recall%7.3f $cands%10d ${found.size}%7d $sec%6.2f")
    }
    spark.stop()
  }
}
