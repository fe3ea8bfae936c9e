package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[ScrubText]] must agree with the java.util.regex chain it
  * replaced — `regexp_replace ×3 + trim` — on the whole real corpus
  * and on adversarial overlap cases (URLs inside emails, emails
  * inside URLs, backtracking domains, every `\s` char, unicode).
  */
class ScrubTextSpec extends SparkSpec {

  /** The original formulation, kept as the reference implementation. */
  private def regexScrub(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(c, "https?://\\S+", "<URL>"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\s+", " "))

  private def assertAgree(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.select(col("text"),
        regexScrub(col("text")).as("want"),
        ScrubText.scrubText(col("text")).as("got"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"on ${r.getString(0)}:\n want=${r.getString(1)}\n got =${r.getString(2)}")
    }
    assert(rows.nonEmpty)
  }

  test("agrees with the regex chain on the whole sf0.01 corpus") {
    assertAgree(graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("text")).filter(col("text").isNotNull))
  }

  test("agrees on adversarial URL/email/whitespace cases") {
    import spark.implicits._
    val cases = Seq(
      "", " ", "\t \n\r\f", "no matches here",
      "http://a.com", "https://a.com/x?y=z#w", "visit http://x.io now",
      "xhttp://a.b tail", "httpss://nope", "http:// nope", "http://",
      "https://", "hhttp://y.z", "HTTP://upper.not.matched",
      "a@b.cd", "a.b+c_d%e-f@g-h.ij", "x@y", "x@y.z", "@a.bc", "a@.bc",
      "..@x.com", "a@b@c.de", "a@b.c@d.ef", "a@b.cd.e-", "a@b.cd.efg",
      "a@b.chttp://d.ee",                 // email eats URL prefix? (no: URL pass runs first)
      "http://u.v/mail@w.xy",             // email inside a URL span
      "mail me at a@b.cd or http://q.rs", // both present
      "a@b.cd http://q.rs a@b.cd",        // repeats
      "ΩΩ a@b.cd ΩΩ", "emoji 😀 http://e.fg 😀",
      "spaces   collapse\t\neverywhere  ",
      " lead and trail ", "1@2.34", "a@b.c5d", "a@b.-cd", "a@b-.cd",
      "end with http://x.yz", "a@b.cd," , "(http://x.yz)",
      "double..dots@d..ee", "trailing.dot.@x.yy")
    assertAgree(cases.toDF("text"))
  }

  test("interpreted compute equals the dataframe (codegen) path; null stays null") {
    import spark.implicits._
    val texts = Seq("a@b.cd and http://x.yz  done", "")
    val viaDf = texts.toDF("text")
      .select(ScrubText.scrubText(col("text"))).collect().map(_.getString(0))
    val interp = texts.map(s => ScrubText.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).toString)
    assert(viaDf.toSeq == interp)
    val nulls = Seq(Option.empty[String]).toDF("text")
      .select(ScrubText.scrubText(col("text"))).collect()
    assert(nulls(0).isNullAt(0))
  }
}
