package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Storage-bucketed tables for Exchange-free co-located joins.
  *
  * `bucketBy(n, key).sortBy(key)` writes each table pre-hash-
  * partitioned on its join key; a later join on that key reads both
  * sides' matching buckets directly — the scan itself satisfies the
  * join's required HashPartitioning, so Catalyst inserts NO shuffle
  * (asserted in BucketedSpec). This is the 100 TB answer for a join
  * that runs repeatedly on the same keys (fact-to-fact, daily
  * incremental against a big dimension): pay the partitioning once at
  * write time, never again at read time. Bucket counts must match
  * across the sides (or divide evenly, with
  * `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  */
object Bucketed {

  /** Data-sized bucket count: one bucket per ~256 MB of source bytes
    * (plan-time file statistics — metadata only, no action), rounded
    * up to a power of two, clamped to [8, 256]. A FIXED bucket count
    * is a scale bug in both directions: 8 buckets cap the
    * steady-state co-located join at 8-way parallelism once the fact
    * table outgrows them (the ×1000 sweep: 600M-row lineitem in 8
    * buckets = 75M rows per task), while thousands of buckets
    * fragment a small table into empty files. Size from the LARGER
    * side and pass the same count to both writes — co-location
    * requires equal bucket counts.
    */
  def bucketCountFor(df: DataFrame): Int =
    bucketCountForBytes(df.queryExecution.optimizedPlan.stats.sizeInBytes
      .min(BigInt(Long.MaxValue)).toLong)

  /** The pure sizing rule (BucketedSpec pins it): ⌈bytes/256 MB⌉
    * rounded up to a power of two in [8, 256].
    */
  def bucketCountForBytes(bytes: Long): Int = {
    val M = 256L * 1024 * 1024
    // ceiling division written overflow-safe (bytes + M - 1 wraps at
    // Long.MaxValue stats, the "unknown size" sentinel)
    val want = (bytes / M + (if (bytes % M > 0) 1L else 0L)) max 8L min 256L
    val n = Integer.highestOneBit(want.toInt - 1) * 2
    if (n < 8) 8 else math.min(n, 256)
  }

  /** Write `df` as a managed bucketed+sorted parquet table, replacing
    * any previous version — UNLESS the catalog already holds this
    * table built from the same `fingerprint` (source dir + layout),
    * in which case the write is skipped entirely. That skip is the
    * pattern's production semantics: the partitioning is paid once at
    * write time and every later join rides the existing buckets, so
    * repeated runs in one session (bench reps, interactive reuse)
    * measure the steady-state Exchange-free join, not the setup.
    *
    * On a (re)write the location is deleted first: the in-memory
    * catalog forgets tables across JVM runs but leaves their
    * directories in the warehouse, and CTAS refuses a non-empty
    * location for a table it doesn't know about.
    */
  def write(spark: SparkSession, df: DataFrame, table: String,
      bucketCol: String, nBuckets: Int, fingerprint: String): Unit = {
    val want = s"$fingerprint|$bucketCol|$nBuckets"
    if (spark.catalog.tableExists(table)) {
      val cur = spark.sql(s"SHOW TBLPROPERTIES $table ('graft.src')")
        .collect().headOption.map(_.getString(1))
      if (cur.contains(want)) return
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
    val warehouse = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    val loc = new Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // durable across JVM runs: the in-memory catalog forgets tables
    // but the render survives in the warehouse with a marker file
    // recording what built it. On a fingerprint match the files are
    // RE-REGISTERED (external table over the existing bucket layout —
    // Spark reads bucket ids from the part-file names, so the spec
    // round-trips), skipping the render entirely; bench reps and
    // repeated sweeps then measure the steady-state join from the
    // very first run of a new JVM.
    val marker = new Path(loc, "_GRAFT_SRC")
    if (fs.exists(marker)) {
      val got = {
        val in = fs.open(marker)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }
      if (got == want) {
        spark.sql(s"CREATE TABLE $table (${df.schema.toDDL}) USING parquet " +
          s"CLUSTERED BY ($bucketCol) SORTED BY ($bucketCol) " +
          s"INTO $nBuckets BUCKETS LOCATION '${loc.toString}'")
        spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('graft.src' = '$want')")
        return
      }
    }
    fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES ('graft.src' = '$want')")
    val out = fs.create(marker, true)
    try out.write(want.getBytes("UTF-8")) finally out.close()
  }

  /** Content fingerprint of a source parquet dir from FILE metadata
    * only (path + file count + total bytes + max modification time —
    * one filesystem listing, no data scan): what [[write]]'s callers
    * should pass as `fingerprint` so a changed source under the same
    * path re-renders while an unchanged one reuses the on-disk buckets
    * across JVMs. The mtime term comes free from the same listStatus
    * call and catches the case size alone misses: a source regenerated
    * with identical total bytes (same generator, new seed) would
    * otherwise silently reuse the stale render.
    */
  def srcFingerprint(spark: SparkSession, dir: String): String = {
    val p = new Path(dir)
    val files = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(p).filter(_.isFile)
    val maxMtime =
      if (files.isEmpty) 0L else files.map(_.getModificationTime).max
    s"$dir|${files.length}|${files.map(_.getLen).sum}|$maxMtime"
  }

  /** Join two bucketed tables on their bucket columns. The `merge`
    * hint pins SortMergeJoin — the strategy whose distribution
    * requirement the bucketed scans satisfy shuffle-free (a broadcast
    * would defeat the demonstration and doesn't scale to fact-to-fact
    * anyway).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.hint("merge").join(r, l(leftKey) === r(rightKey))
  }
}
