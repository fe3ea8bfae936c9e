package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the native expressions: each is checked against
  * an INDEPENDENT plain-Scala reference implementation on randomized
  * inputs (including unicode and whitespace-heavy strings), so a bug
  * in the fused loops can't hide behind an equally-buggy SQL mirror.
  * Deterministic seed — failures reproduce.
  */
class ExpressionPropertySpec extends SparkSpec {

  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.suchThat(_.nonEmpty),
    Gen.oneOf("café", "über", "中文", "a-b", "#tag", "x:y", "0", "..."))
  private val tokensGen: Gen[List[String]] = Gen.listOfN(40, tokenGen)

  private def samples(n: Int): Seq[List[String]] =
    (0 until n).flatMap(i => tokensGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // plain-Scala references (no Spark, no shared code with the exprs
  // beyond the md5 definition itself)
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def refH60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def refSimhash(tokens: Seq[String]): Long = {
    val votes = Array.fill(60)(0)
    tokens.foreach { w =>
      val h = refH60(w + "#sim")
      (0 until 60).foreach(b => votes(b) += (if (((h >> b) & 1L) == 1L) 1 else -1))
    }
    (0 until 60).map(b => if (votes(b) > 0) 1L << b else 0L).sum
  }

  private def refMinhash(shingles: Seq[String]): Seq[Long] = {
    import graft.llm.PortableHash.{MinhashA, MinhashB}
    (0 until 16).map { j =>
      val vals = shingles.map { s =>
        val h = refH60(s) & 0x7fffffffL
        (MinhashA(j) * h + MinhashB(j)) % 2147483647L
      }
      if (vals.isEmpty) 2147483647L else vals.min
    }
  }

  private def refNgrams(tokens: Seq[String], n: Int): Seq[String] =
    if (tokens.length < n) Seq.empty
    else tokens.sliding(n).map(_.mkString(" ")).toSeq

  test("h60 matches the md5-prefix reference on random strings") {
    import spark.implicits._
    val input = samples(50).map(_.mkString(" "))
    val got = input.toDF("s")
      .select(graft.llm.PortableHash.h60(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == input.map(refH60))
  }

  test("simhash matches the vote-counting reference on random token arrays") {
    import spark.implicits._
    val input = samples(50)
    val got = input.toDF("toks")
      .select(Simhash.simhash(col("toks"))).collect().map(_.getLong(0))
    assert(got.toSeq == input.map(refSimhash))
  }

  test("minhash_sigs matches the affine-min reference on random shingle arrays") {
    import spark.implicits._
    val input = samples(50)
    val got = input.toDF("sh")
      .select(MinhashSigs.minhash_sigs(col("sh"))).collect().map(_.getSeq[Long](0))
    assert(got.toSeq == input.map(refMinhash))
  }

  test("ngrams matches sliding-window reference for n in 1..5") {
    import spark.implicits._
    val input = samples(30)
    for (n <- 1 to 5) {
      val got = input.toDF("toks")
        .select(Ngrams.ngrams(col("toks"), n)).collect().map(_.getSeq[String](0))
      assert(got.toSeq == input.map(refNgrams(_, n)), s"mismatch at n=$n")
    }
  }

  test("cosine_sim matches sequential double accumulation on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(32, Gen.chooseNum(-100, 100).map(_ / 7.0f))
    val pairs = (0 until 40).flatMap { i =>
      for {
        a <- vecGen(Gen.Parameters.default, Seed(i.toLong))
        b <- vecGen(Gen.Parameters.default, Seed(i.toLong + 1000))
      } yield (a.toArray, b.toArray)
    }
    def ref(a: Array[Float], b: Array[Float]): Option[Double] = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) None else Some(dot / d)
    }
    val got = pairs.toDF("a", "b")
      .select(CosineSim.cosine_sim(col("a"), col("b"))).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    // bitwise equality — the expression's accumulation order IS the spec
    assert(got.toSeq == pairs.map { case (a, b) => ref(a, b) })
  }

  test("postings matches the java-regex split reference on whitespace-heavy strings") {
    import spark.implicits._
    // generator interleaves tokens with random \s runs (every Java \s
    // char) plus leading/trailing runs — the position-shift edge lives
    // exactly at string starts
    val wsGen: Gen[String] =
      Gen.nonEmptyListOf(Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r'))
        .map(_.mkString)
    val textGen: Gen[String] = for {
      lead <- Gen.oneOf(Gen.const(""), wsGen)
      toks <- Gen.listOfN(12, Gen.zip(
        Gen.oneOf("a", "b", "the", "café", "中文", "x1", "...", "😀"), wsGen))
      trail <- Gen.oneOf(Gen.const(""), wsGen)
    } yield lead + toks.map { case (t, w) => t + w }.mkString + trail
    val texts = (0 until 60).flatMap(i =>
      textGen.apply(Gen.Parameters.default, Seed(i.toLong))) ++
      Seq("", " ", "a", " a", "\t", "x y x")
    // independent reference: the ORIGINAL regex formulation itself
    // (java.util.regex split — a different engine than the char scan)
    def ref(text: String): Map[String, (Long, String)] = {
      val parts = java.util.regex.Pattern.compile("\\s+").split(text, -1)
      val m = scala.collection.mutable.LinkedHashMap[String, (Long, List[Int])]()
      parts.zipWithIndex.foreach { case (w, i) =>
        if (w.nonEmpty) {
          val (c, ps) = m.getOrElse(w, (0L, Nil))
          m(w) = (c + 1, (i + 1) :: ps)
        }
      }
      m.map { case (w, (c, ps)) => w -> (c, ps.reverse.mkString(",")) }.toMap
    }
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"),
        explode(Postings.postings(col("text"))).as("p"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.map { r =>
          val p = r.getStruct(2)
          p.getString(0) -> (p.getLong(1), p.getString(2))
        }.toMap
      }
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got.getOrElse(i.toLong, Map.empty) == ref(t),
        s"disagreement on text=${t.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }
}
