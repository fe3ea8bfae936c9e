package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Candidate/rescore MASS of the registered near-dup multiprobe shape
  * at corpus sizes past the r-cap (VERDICT r13 item 3): the r13
  * recall grid proved recall at a fixed dial is n-INVARIANT, but what
  * grows with n past the r = 16 cap is candidate mass (expected
  * per-bucket occupancy λ = reps/2^r), and the registered query's
  * mass had never been measured at 10M reps — "AQE-sized shuffles
  * absorb it linearly" was the last extrapolation standing.
  *
  * Measures, on the [[SynthCorpus]] collision-free corpus (reps = n
  * by construction), through the EXACT candidate-stream relation the
  * registered shape feeds to its dedup + rescore
  * ([[graft.llm.Similarity.candidateStreamOf]]):
  *
  *  - `stream_rows`: pre-distinct candidate rows — the mass entering
  *    the dedup exchange — EXACT, summed over probe-side slices
  *    (slices partition the probe explode, so the sum is the full
  *    stream count while any one run's join shuffle stays ~1/K of
  *    the probe side; the full 10M-rep stream is disk-infeasible on
  *    the sandbox: ~5B probe rows ≈ 50+ GB of join shuffle);
  *  - `cand_pairs_est`: HLL distinct (vec_a, vec_b) — the rescore
  *    join's input mass. Exact-error HLL at K = 1; at K > 1 a pair
  *    found probing from BOTH endpoints can land in two slices, so
  *    the summed estimate is an upper bound within 2× (the stream
  *    count stays exact regardless);
  *  - per-slice wall seconds and shuffle-write bytes (task-metrics
  *    listener, the SpillProbe machinery).
  *
  * Usage: CandidateMassProbe <n> <bands> <r> <t> [slices=1]
  *        [slicesRun=slices] [--full]
  *
  * `--full` additionally runs the COMPLETE registered shape
  * ([[graft.llm.Similarity.nearDupPairsMultiProbe]]: stream →
  * distinct → rescore joins → cos gate) in this JVM and reports its
  * wall seconds, total shuffle-write bytes, and output pair count —
  * feasible at 1M reps (~15 GB live shuffle); at 10M the distinct
  * exchange alone exceeds sandbox disk, which is itself a recorded
  * result. Run ONE dial per JVM: shuffle files of a prior config in
  * the same JVM survive until GC and stack toward ENOSPC (the
  * 2026-08-15 measurement died exactly that way).
  *
  * Dial points to pass (from [[graft.llm.Similarity.nearDupDialFor]]):
  * default past 2^18 = (128, 16, 3); high = (256, 16, 3); a fixed-λ
  * contrast at 10M = (128, 20, 3) (λ ≈ the 1M default's 15.3, so the
  * linear-in-n-at-fixed-λ claim is tested directly).
  */
object CandidateMassProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toLong
    val bands = args(1).toInt
    val r = args(2).toInt
    val t = args(3).toInt
    val full = args.contains("--full")
    val positional = args.drop(4).filterNot(_ == "--full")
    val slices = positional.headOption.map(_.toInt).getOrElse(1)
    // optional second positional: run only the first `slicesRun`
    // probe slices and report totals EXTRAPOLATED by
    // slices/slicesRun — an unbiased estimator (vec_id % slices is
    // independent of geometry; each slice is exact within itself),
    // clearly labeled `extrapolated=true` in the output. For when a
    // full exact pass doesn't fit the wall-clock budget.
    val slicesRun = positional.drop(1).headOption.map(_.toInt)
      .getOrElse(slices).min(slices)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufWrite = new java.util.concurrent.atomic.AtomicLong()
    val spilled = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spilled.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    val emb = SynthCorpus.embeddings(spark, n)
    val e = graft.llm.Similarity.sigTableOf(emb, bands, r)
    println(s"[mass] n=$n dial=($bands,$r,$t) slices=$slices " +
      f"lambda=${n.toDouble / (1L << r)}%.1f")

    var totRows = 0L; var totCand = 0L; var totSec = 0.0
    var totShuf = 0L; var totSpill = 0L
    (0 until slicesRun).foreach { k =>
      // each slice's ~20 GB of join shuffle files is freed only when
      // the ShuffleDependency is GC'd (ContextCleaner); without an
      // explicit GC, 8 slices stack to ENOSPC on the sandbox disk
      System.gc()
      Thread.sleep(2000) // drain the async listener bus + cleaner
      shufWrite.set(0L); spilled.set(0L)
      val slice = if (slices == 1) None else Some((k, slices))
      val stream = graft.llm.Similarity
        .candidateStreamOf(e, bands, r, t, None, slice)
      val t0 = System.nanoTime()
      val row = stream.agg(
        count(lit(1)).as("rows"),
        approx_count_distinct(struct(col("vec_a"), col("vec_b")), 0.01)
          .as("cand")).head()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      totRows += row.getLong(0); totCand += row.getLong(1); totSec += sec
      totShuf += shufWrite.get; totSpill += spilled.get
      println(f"[mass] slice=$k rows=${row.getLong(0)}%,d " +
        f"cand_est=${row.getLong(1)}%,d sec=$sec%.1f " +
        f"shufWrite=${shufWrite.get / 1e9}%.2f GB " +
        f"spill=${spilled.get / 1e9}%.2f GB")
    }
    val scale = slices.toDouble / slicesRun
    val xRows = (totRows * scale).toLong
    val xCand = (totCand * scale).toLong
    println(f"[mass] TOTAL n=$n dial=($bands,$r,$t) " +
      f"stream_rows=$xRows%,d cand_pairs_est=$xCand%,d " +
      f"sec=$totSec%.1f shufWrite=${(totShuf * scale) / 1e9}%.2f GB " +
      f"spill=${totSpill / 1e9}%.2f GB " +
      f"rows_per_rep=${xRows.toDouble / n}%.1f " +
      f"extrapolated=${slicesRun < slices} ($slicesRun/$slices slices run)")

    if (full) {
      Thread.sleep(2000)
      shufWrite.set(0L); spilled.set(0L)
      val t0 = System.nanoTime()
      val pairs = graft.llm.Similarity
        .nearDupPairsMultiProbe(emb, bands, r, t).count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(2000)
      println(f"[mass] FULL n=$n dial=($bands,$r,$t) pairs=$pairs%,d " +
        f"sec=$sec%.1f shufWrite=${shufWrite.get / 1e9}%.2f GB " +
        f"spill=${spilled.get / 1e9}%.2f GB")
    }
    spark.stop()
  }
}
