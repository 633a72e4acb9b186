package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c).collect()(0).get(0).asInstanceOf[T]

  test("whitespace token count") {
    assert(one[Int](TextFns.wsTokenCount($"text"), "a b  c") === 3)
    assert(one[Int](TextFns.wsTokenCount($"text"), "   ") === 0)
    assert(one[Int](TextFns.wsTokenCount($"text"), "") === 0)
  }

  test("bpe-ish token count splits alpha/digit/punct runs") {
    // "abc123!?x" → abc, 123, !, ?, x
    assert(one[Int](TextFns.bpeTokenCount($"text"), "abc123!?x") === 5)
  }

  test("punct count ignores alphanumerics and whitespace") {
    assert(one[Long](TextFns.punctCount($"text"), "a,b.c!") === 3L)
    // counts punctuation, not alphanumerics (the round-1 inversion):
    assert(one[Long](TextFns.punctCount($"text"), "abc def") === 0L)
    assert(one[Long](TextFns.punctCount($"text"), "!!!") === 3L)
  }

  test("quality score is bounded and favors clean prose") {
    val clean = "the data is stored in a table and the query is fast for all of the users " * 6
    val junk = "@@@@ #### $$$$ %%%% ^^^^ &&&& ****"
    val qClean = one[Double](TextFns.qualityScore($"text"), clean)
    val qJunk = one[Double](TextFns.qualityScore($"text"), junk)
    assert(qClean > qJunk)
    assert(qClean <= 1.0 && qJunk >= 0.0)
  }

  test("langId picks the language whose markers dominate") {
    assert(one[String](TextFns.langId($"text"), "the cat and the dog are in the house") === "en")
    assert(one[String](TextFns.langId($"text"), "el perro y la casa de los gatos para que") === "es")
    assert(one[String](TextFns.langId($"text"), "der hund und die katze ist nicht ein tier") === "de")
    assert(one[String](TextFns.langId($"text"), "zzz qqq xxx") === "und")
  }

  test("normalized fingerprint collapses case and whitespace") {
    val df = Seq(("A  b\tC", 1), ("a b c", 2)).toDF("text", "id")
    val fps = df.select(TextFns.normFingerprint($"text")).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
  }

  private def seqOf(c: org.apache.spark.sql.Column, text: String): Seq[Long] =
    Seq(text).toDF("text").select(c).collect()(0).getSeq[Long](0)

  test("rolling hashes and winnowing are deterministic and shift-sensitive") {
    val h1 = seqOf(TextFns.rollingHashes($"text", 4), "abcdef")
    val h2 = seqOf(TextFns.rollingHashes($"text", 4), "abcdef")
    assert(h1 === h2)
    assert(h1.length === 3) // abcd, bcde, cdef
    val w = seqOf(TextFns.winnowing($"text", 4, 2), "abcdefgh")
    assert(w.nonEmpty && w.toSet.subsetOf(
      seqOf(TextFns.rollingHashes($"text", 4), "abcdefgh").toSet))
  }
}
