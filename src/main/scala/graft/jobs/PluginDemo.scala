package graft.jobs

import graft.operators.JobLoader
import java.nio.file.{Files, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The runtime-injection flow as a driver-gated query.
  *
  * The reference's users hand the engine a COMPILED artifact — a Go
  * plugin exporting `mapf`/`reducef` (README.MD:82, worker.go:51) —
  * never source linked into the engine. `mr_plugin_wordcount` proves
  * the JVM equivalent end to end inside the correctness gate: a
  * wordcount job written in plain Java against the
  * [[graft.operators.UserJob]] interface is compiled with the JDK
  * compiler into a jar carrying a ServiceLoader manifest (the
  * compile step stands in for "the user shipped a jar"), discovered
  * and executed by [[JobLoader]] over the corpus rendered as text
  * files — and must reproduce `mr_wordcount`'s DuckDB oracle exactly.
  *
  * Jar and corpus renders are cached per JVM / per sfDir; the query
  * is deterministic (token multiset is preserved by the newline
  * join, and wordcount is order-insensitive).
  */
object PluginDemo {

  /** What the user would write and compile — no Scala, no engine
    * internals, just the `UserJob` interface. Tokenization matches
    * `CanonicalJobs.tokens` (`split("\\s+")`, drop empties,
    * case-preserving per README.MD:31).
    */
  val wordCountJava: String =
    """package graftdemo;
      |import graft.operators.KeyValue;
      |import graft.operators.UserJob;
      |import java.util.ArrayList;
      |import java.util.List;
      |public class WordCount implements UserJob {
      |  public List<KeyValue> mapf(String filename, String contents) {
      |    List<KeyValue> out = new ArrayList<>();
      |    for (String w : contents.split("\\s+"))
      |      if (!w.isEmpty()) out.add(new KeyValue(w, "1"));
      |    return out;
      |  }
      |  public String reducef(String key, List<String> values) {
      |    long n = 0;
      |    for (String v : values) n += Long.parseLong(v);
      |    return Long.toString(n);
      |  }
      |}
      |""".stripMargin

  val className = "graftdemo.WordCount"

  /** Compile [[wordCountJava]] and package the service-manifested jar
    * (once per JVM). */
  lazy val jarPath: String = {
    val work = Files.createTempDirectory("graft-plugin")
    val srcFile = Files.createDirectories(work.resolve("graftdemo"))
      .resolve("WordCount.java")
    Files.writeString(srcFile, wordCountJava)
    val classesDir = Files.createDirectories(work.resolve("classes"))
    val javac = javax.tools.ToolProvider.getSystemJavaCompiler
    require(javac != null, "JDK compiler unavailable")
    val rc = javac.run(null, null, null,
      "-classpath", System.getProperty("java.class.path"),
      "-d", classesDir.toString, srcFile.toString)
    require(rc == 0, "javac failed for the plugin demo job")
    val jar = work.resolve("wordcount-job.jar")
    val out = new java.util.jar.JarOutputStream(Files.newOutputStream(jar))
    try {
      out.putNextEntry(new java.util.jar.JarEntry("graftdemo/WordCount.class"))
      out.write(Files.readAllBytes(classesDir.resolve("graftdemo/WordCount.class")))
      out.closeEntry()
      out.putNextEntry(
        new java.util.jar.JarEntry("META-INF/services/graft.operators.UserJob"))
      out.write((className + "\n").getBytes("UTF-8"))
      out.closeEntry()
    } finally out.close()
    jar.toString
  }

  private val corpusCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The documents table rendered as the reference's map input: text
    * files, newline-joined (newline is whitespace, so the token
    * multiset is exactly the table's). Split count scales with corpus
    * size (~500 docs per split, min 4) because one file = one map
    * task (the reference's split model, coordinator.go:185-198) — a
    * fixed split count would cap map parallelism as the corpus grows,
    * which the 10× scale smoke measures.
    */
  def corpusGlob(spark: SparkSession, sfDir: String): String =
    corpusCache.computeIfAbsent(sfDir, { _ =>
      // NULL text must vanish here exactly like the oracle's
      // length(word)>0 filter drops it — rendering null would mint a
      // literal "null" token
      val texts = graft.Tables.documents(spark, sfDir)
        .select("text").filter(col("text").isNotNull)
        .collect().map(_.getString(0))
      val nSplits = math.max(4, texts.length / 500)
      val dir: Path = Files.createTempDirectory("graft-plugin-corpus")
      texts.grouped(math.max(1, (texts.length + nSplits - 1) / nSplits))
        .zipWithIndex.foreach { case (chunk, i) =>
          Files.writeString(dir.resolve(s"split-$i.txt"), chunk.mkString("\n"))
        }
      // zero-row corpus: wholeTextFiles rejects a glob matching no
      // files, so materialize one empty split (mapf of "" emits
      // nothing — the query then returns an empty frame, as required)
      if (texts.isEmpty) Files.writeString(dir.resolve("split-0.txt"), "")
      dir.toString
    }) + "/*.txt"

  /** Wordcount through the runtime-loaded jar — same oracle as
    * `mr_wordcount`. */
  def pluginWordcount(spark: SparkSession, sfDir: String): DataFrame =
    JobLoader.runDiscovered(spark, jarPath, corpusGlob(spark, sfDir))
      .toDF("word", "cnt_str")
      .select(col("word"), col("cnt_str").cast("long").as("cnt"))
}
