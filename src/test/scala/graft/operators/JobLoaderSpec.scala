package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end proof of the runtime-injection surface: a user job
  * written in plain JAVA (no Scala, no link against anything but the
  * [[UserJob]] interface), compiled at test time with the JDK
  * compiler into a jar with a ServiceLoader manifest, discovered and
  * run by [[JobLoader]] — and its word counts must equal the
  * `mr_wordcount` oracle query over the same corpus. This is the
  * reference's Go-plugin flow (README.MD:82, worker.go:51) done with
  * JVM mechanisms.
  */
class JobLoaderSpec extends SparkSpec {
  import graft.jobs.PluginDemo

  test("a Java jar compiled at run time runs wordcount equal to the mr_wordcount oracle") {
    val jar = PluginDemo.jarPath
    assert(JobLoader.discover(jar) == Seq(PluginDemo.className))
    val got = PluginDemo.pluginWordcount(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.jobs.CanonicalJobs.wordcount(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size,
      s"vocab ${got.size} vs oracle ${expected.size}")
    assert(got == expected)
  }

  test("discover on a jar without a service manifest is empty; run fails loudly") {
    // a jar with the class but NO manifest: discovery finds nothing
    val work = Files.createTempDirectory("nomanifest")
    val jarPath = work.resolve("bare.jar")
    val out = new java.util.jar.JarOutputStream(Files.newOutputStream(jarPath))
    out.close()
    assert(JobLoader.discover(jarPath.toString).isEmpty)
    intercept[IllegalArgumentException] {
      JobLoader.runDiscovered(spark, jarPath.toString, "/tmp/none/*.txt")
    }
  }

  test("explicit class name works without discovery and across repeated runs") {
    val jar = PluginDemo.jarPath
    val glob = PluginDemo.corpusGlob(spark, sf001)
    val a = JobLoader.run(spark, jar, PluginDemo.className, glob).collect().toMap
    val b = JobLoader.run(spark, jar, PluginDemo.className, glob).collect().toMap
    assert(a == b)
    assert(a.nonEmpty)
  }
}
