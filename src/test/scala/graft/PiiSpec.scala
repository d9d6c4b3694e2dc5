package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.Pii

/** Semantics of the PII detect/redact pass (graft.ext.Pii). */
class PiiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def run(texts: Seq[Option[String]]) = {
    import spark.implicits._
    Pii.redactPii(texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t.orNull) }.toDF("doc_id", "text"))
      .select("doc_id", "n_emails", "n_phones", "n_ips", "redacted")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.getString(4)))).toList
  }

  test("detects and redacts all three classes, counting every occurrence") {
    val out = run(Seq(
      Some("mail a@b.io and c.d+x@e-f.org, call 415-555-0142, host 10.0.0.1"),
      Some("clean text with numbers 12345 and a date 2024-01-02"),
      Some("two ips 192.168.0.1 8.8.8.8")))
    assert(out(0) == ((0L, 2L, 1L, 1L,
      Some("mail [EMAIL] and [EMAIL], call [PHONE], host [IP]"))))
    assert(out(1)._2 == 0L && out(1)._3 == 0L && out(1)._4 == 0L)
    assert(out(1)._5.get.contains("2024-01-02"),
      "a dashed date must not be taken for a phone (3-3-4 shape only)")
    assert(out(2) == ((2L, 0L, 0L, 2L, Some("two ips [IP] [IP]"))))
  }

  test("word boundaries stop partial matches inside longer digit runs") {
    val out = run(Seq(Some("ticket 1415-555-01423 is not a phone")))
    assert(out.head._3 == 0L, "embedded 3-3-4 inside a longer run must not match")
  }

  test("null text yields zero counts and null redacted") {
    val out = run(Seq(None))
    assert(out.head == ((0L, 0L, 0L, 0L, None)))
  }

  test("redaction is idempotent (tags contain no PII shapes)") {
    val once = run(Seq(Some("a@b.io 415-555-0142 10.0.0.1"))).head._5.get
    val twice = run(Seq(Some(once))).head
    assert((twice._2, twice._3, twice._4) == ((0L, 0L, 0L)) && twice._5.get == once)
  }
}
