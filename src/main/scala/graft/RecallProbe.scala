package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Near-dup LSH recall/cost curve: for each (bands, r) config,
  * measure recall of [[graft.llm.Similarity.nearDupPairsOf]] against
  * the exhaustive pair set, the raw candidate-pair count (cost), and
  * wall time — the evidence base for the (B, r) operating point
  * (VERDICT r8 item 4). Usage: RecallProbe <sfDir>
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

    val configs = Seq(
      (16, r0 - 1), (16, r0), (32, r0), (64, r0),
      (32, r0 + 1), (64, r0 + 1), (128, r0 + 1),
      (128, r0 + 2), (256, r0 + 2), (256, r0 + 3))
    println(f"${"B"}%5s ${"r"}%3s ${"recall"}%7s ${"cands"}%10s ${"found"}%7s ${"sec"}%6s")
    configs.foreach { case (bands, r) =>
      val t0 = System.nanoTime()
      val found = Similarity.nearDupPairsOf(emb, bands, r)
        .select(col("vec_a"), col("vec_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      // raw candidate mass: same construction, cosine filter removed
      val e2 = graft.Materialize.stage(emb.withColumn("sigs",
        Similarity.bandSignatureCols(col("embedding"), bands, r)),
        eager = false)
      val ex = e2.select(col("vec_id"), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "bucket")))
      val aS = ex.select(col("band"), col("bucket"),
        col("vec_id").as("vec_a"), col("sigs").as("sigs_a"))
      val bS = ex.select(col("band"), col("bucket"),
        col("vec_id").as("vec_b"), col("sigs").as("sigs_b"))
      val cands = aS.join(bS, Seq("band", "bucket"))
        .filter(col("vec_a") < col("vec_b"))
        .filter(graft.functions.FirstCollision.first_collision(
          col("sigs_a"), col("sigs_b")) === col("band"))
        .count()
      val recall =
        if (truePairs.isEmpty) 1.0
        else found.intersect(truePairs).size.toDouble / truePairs.size
      println(f"$bands%5d $r%3d $recall%7.3f $cands%10d ${found.size}%7d $sec%6.2f")
    }
    spark.stop()
  }
}
