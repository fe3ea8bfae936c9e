package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Near-dup LSH recall/cost curve: for each (bands, r, t) config,
  * measure recall of [[graft.llm.Similarity.nearDupPairsOf]] (t = 0)
  * or the margin-aware
  * [[graft.llm.Similarity.nearDupPairsMultiProbe]] (t ≥ 1 lowest-
  * margin flips per band) against the exhaustive pair set, the raw
  * candidate-pair count (cost), and wall time — the evidence base
  * for the (B, r, t) operating point (VERDICT r8 item 4; r9 item 5
  * asked for the multiprobe column). Usage: RecallProbe <sfDir>
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
    def candCount(bands: Int, r: Int, t: Int): Long = {
      val e2 = graft.Materialize.stage(emb.withColumn("sigs",
        Similarity.bandSignatureCols(col("embedding"), bands, r)),
        eager = false)
      val ex = e2.select(col("vec_id"), col("sigs"),
        posexplode(col("sigs")).as(Seq("band", "bucket")))
      if (t == 0) {
        val aS = ex.select(col("band"), col("bucket"),
          col("vec_id").as("vec_a"), col("sigs").as("sigs_a"))
        val bS = ex.select(col("band"), col("bucket"),
          col("vec_id").as("vec_b"), col("sigs").as("sigs_b"))
        aS.join(bS, Seq("band", "bucket"))
          .filter(col("vec_a") < col("vec_b"))
          .filter(graft.functions.FirstCollision.first_collision(
            col("sigs_a"), col("sigs_b")) === col("band"))
          .count()
      } else {
        // mirror the engine's margin-probe slim-explode + distinct
        val probes = e2.select(col("vec_id").as("p_vec"),
            posexplode(graft.functions.HyperplaneProbes.hyperplane_probes(
              col("embedding"), bands, r, Similarity.Dim, t))
              .as(Seq("pos", "bucket")))
          .select(col("p_vec"), (col("pos") / (t + 1)).cast("int").as("band"),
            col("bucket"))
        probes.join(ex.select(col("vec_id").as("i_vec"),
            col("band"), col("bucket")), Seq("band", "bucket"))
          .filter(col("p_vec") =!= col("i_vec"))
          .select(least(col("p_vec"), col("i_vec")).as("vec_a"),
            greatest(col("p_vec"), col("i_vec")).as("vec_b"))
          .distinct()
          .count()
      }
    }

    // (bands, r, t): t = 0 is the exact first-collision variant;
    // t >= 1 probes the t lowest-margin one-bit flips per band
    val configs = Seq(
      (16, r0 - 1, 0), (16, r0, 0), (32, r0, 0),
      (64, r0, 0), (64, r0 + 1, 0), (128, r0 + 1, 0),
      (256, r0 + 2, 0),
      // margin multiprobe: index mass = exact config, probe ×(t+1);
      // compare against the exponential-bands escalation row
      (32, r0 + 1, 1), (64, r0 + 1, 1), (128, r0 + 2, 1),
      (32, r0 + 1, 2), (64, r0 + 1, 2), (64, r0 + 2, 2),
      (32, r0 + 1, 3), (64, r0 + 1, 3), (64, r0 + 2, 3),
      (128, r0 + 2, 3),
      // the r11 REGISTERED rule (rep-sized λ∈[2,4), t=2), its
      // recall-escalation dials (one bit shallower; wider+deeper),
      // and the cheaper-variant rows the r11 selection rejected
      (64, Similarity.nearDupRepPlanesFor(n), 2),
      (64, Similarity.nearDupRepPlanesFor(n) - 1, 2),
      (128, Similarity.nearDupRepPlanesFor(n) + 1, 3),
      (32, Similarity.nearDupRepPlanesFor(n), 2),
      (64, Similarity.nearDupRepPlanesFor(n), 1),
      (64, Similarity.nearDupRepPlanesFor(n), 0))
    println(f"${"B"}%5s ${"r"}%3s ${"t"}%3s ${"recall"}%7s ${"cands"}%10s ${"found"}%7s ${"sec"}%6s")
    configs.foreach { case (bands, r, t) =>
      val t0 = System.nanoTime()
      val pairs =
        if (t > 0) Similarity.nearDupPairsMultiProbe(emb, bands, r, t)
        else Similarity.nearDupPairsOf(emb, bands, r)
      val found = pairs.select(col("vec_a"), col("vec_b")).collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val sec = (System.nanoTime() - t0) / 1e9
      val cands = candCount(bands, r, t)
      val recall =
        if (truePairs.isEmpty) 1.0
        else found.intersect(truePairs).size.toDouble / truePairs.size
      println(f"$bands%5d $r%3d $t%3d $recall%7.3f $cands%10d ${found.size}%7d $sec%6.2f")
    }
    spark.stop()
  }
}
