package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Redact

/** The PII bank must recover exactly what the planting rule implies —
  * per-kind counts, complete replacement (zero residual), and no
  * placeholder-seam artifacts — because the q166 oracle predicts those
  * counts arithmetically without running a regex.
  */
class RedactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def scrubOne(text: String) = {
    import spark.implicits._
    Redact.scrub(Seq((1L, text)).toDF("doc_id", "text"),
      col("doc_id"), col("text")).collect().head
  }

  test("each planted form is matched exactly once and fully replaced") {
    val r = scrubOne("words before user42@example.com then +15551234567 and 10.1.2.3 after")
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_phone") == 1L)
    assert(r.getAs[Long]("n_ipv4") == 1L)
    assert(r.getAs[Long]("n_residual") == 0L)
    assert(r.getAs[String]("redacted") ==
      "words before [EMAIL] then [PHONE] and [IP] after")
  }

  test("clean text passes through untouched with zero counts") {
    val r = scrubOne("the quick brown fox 123 456")
    assert(r.getAs[Long]("n_email") == 0L && r.getAs[Long]("n_phone") == 0L
      && r.getAs[Long]("n_ipv4") == 0L && r.getAs[Long]("n_residual") == 0L)
    assert(r.getAs[String]("redacted") == "the quick brown fox 123 456")
  }

  test("placeholders and their seams are not re-matched") {
    // a document that is nothing but planted PII back-to-back: replacement
    // must not create new matches at the seams ([EMAIL][PHONE][IP])
    val r = scrubOne("a@b.co +1234567 1.2.3.4")
    assert(r.getAs[Long]("n_residual") == 0L)
    assert(r.getAs[String]("redacted") == "[EMAIL] [PHONE] [IP]")
  }

  test("overlapping matches are counted once, by the kind that consumed them") {
    // `+12345678` inside the email local part is in PHONE's language, but
    // the email-first replacement consumes it — a faithful audit counts it
    // as email only (counting each kind on the original would report
    // n_phone=1 for a document whose redaction never touched a phone)
    val r = scrubOne("mail a+12345678@b.co today")
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_phone") == 0L)
    assert(r.getAs[Long]("n_residual") == 0L)
    assert(r.getAs[String]("redacted") == "mail [EMAIL] today")
  }

  test("phone length bounds: 6 digits too short, 16 too long") {
    assert(scrubOne("+123456").getAs[Long]("n_phone") == 0L)
    // 16 digits: the bank matches the first 15 (RE2/Java both greedy) —
    // still counted and redacted, never silently passed through
    val r = scrubOne("+1234567890123456")
    assert(r.getAs[Long]("n_phone") == 1L)
    assert(!r.getAs[String]("redacted").contains("+12345"))
  }

  test("ipv4 word boundary: no match inside a longer dotted run") {
    // 5 dotted octets: \b...\b still finds a 4-octet window (boundaries
    // are digit/dot transitions) — what matters is nothing PII-like
    // survives redaction
    assert(scrubOne("v1.2.3 release").getAs[Long]("n_ipv4") == 0L)
    assert(scrubOne("10.1.2.3").getAs[Long]("n_ipv4") == 1L)
  }

  test("plantPii over the fixture corpus: per-kind counts follow the modulus rule") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val planted = docs.select(col("doc_id"), col("source"),
      Redact.plantPii(col("doc_id"), col("text")).as("ptext"))
    val agg = Redact.scrub(planted, col("doc_id"), col("ptext"))
      .agg(sum("n_email").as("e"), sum("n_phone").as("p"),
        sum("n_ipv4").as("i"), sum("n_residual").as("r"),
        count(lit(1)).as("n"))
      .collect().head
    val ids = docs.select(col("doc_id").cast("long")).collect().map(_.getLong(0))
    assert(agg.getAs[Long]("e") == ids.count(_ % 7 == 0))
    assert(agg.getAs[Long]("p") == ids.count(_ % 11 == 0))
    assert(agg.getAs[Long]("i") == ids.count(_ % 13 == 0))
    assert(agg.getAs[Long]("r") == 0L, "redaction must sweep clean")
  }
}
