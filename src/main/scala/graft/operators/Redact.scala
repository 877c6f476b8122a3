package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing with a real pattern bank — the redaction step a training
  * corpus passes before anything leaves the curation boundary. q73's
  * denylist variant stands in where the corpus has no PII at all; this
  * operator is the actual shape: a bank of RE2-safe regexes (no
  * backreferences, no lookaround — the subset whose semantics are identical
  * in Java's regex, RE2, and DuckDB's RE2 engine), each match replaced by a
  * typed placeholder, per-kind match counts kept as the audit metric, and a
  * residual re-scan proving the replacement actually swept the text clean.
  *
  * Scale shape: pure codegen'd column maps (regexp_count/regexp_replace on
  * the scan side) — no shuffle, no UDF; the per-source audit rollup is one
  * partial-agg exchange of a 20-row frame. At 100 TB this is exactly as
  * fast as the corpus can be read.
  *
  * The verification idea (gate q166): PLANT deterministic synthetic PII —
  * email/E.164-phone/IPv4 strings derived from doc_id by fixed modulus
  * rules — into a clean corpus (fixture corpus verified zero accidental
  * matches at every sf), run the bank, and require the recovered per-kind
  * counts to equal the counts the planting rule implies ARITHMETICALLY.
  * The oracle never runs a regex: it predicts `n_email = #{doc_id ≡ 0
  * mod 7}` etc. straight from the rule, so any false positive OR false
  * negative in the bank breaks the gate exactly.
  */
object Redact {

  /** RE2-safe pattern bank. Java/RE2 semantic notes: `{2,}` bounded repeat,
    * character classes and `\b` word boundary behave identically; nothing
    * here backtracks.
    */
  val EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PHONE = "\\+[0-9]{7,15}"
  val IPV4  = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** Per-document scrub: per-kind match counts, the redacted text (email →
    * `[EMAIL]`, phone → `[PHONE]`, IPv4 → `[IP]` — placeholders chosen so
    * no pattern can match a placeholder or a seam it creates), and
    * `n_residual` = total bank matches REMAINING in the redacted text (0
    * iff the sweep is complete). Email is replaced first: it is the only
    * pattern that could contain characters of the others' alphabets, and
    * replacing the longest-alphabet pattern first means later patterns
    * never see a partially-consumed match. Each kind is COUNTED on the
    * text remaining after the earlier kinds' replacements (email on the
    * original, phone on the email-redacted text, IPv4 on the
    * phone-redacted text) so the counts are a faithful audit of what was
    * actually redacted — counting every kind on the original would
    * double-count overlapping matches (e.g. `+` followed by 7+ digits
    * inside an email local part) that the replacement cascade consumes
    * only once.
    */
  def scrub(df: DataFrame, idCol: Column, textCol: Column,
      keep: Column*): DataFrame = {
    val afterEmail = regexp_replace(textCol, lit(EMAIL), lit("[EMAIL]"))
    val afterPhone = regexp_replace(afterEmail, lit(PHONE), lit("[PHONE]"))
    val redacted = regexp_replace(afterPhone, lit(IPV4), lit("[IP]"))
    df.select(idCol.as("doc_id") +: keep :+
      regexp_count(textCol, lit(EMAIL)).cast("long").as("n_email") :+
      regexp_count(afterEmail, lit(PHONE)).cast("long").as("n_phone") :+
      regexp_count(afterPhone, lit(IPV4)).cast("long").as("n_ipv4") :+
      redacted.as("redacted") :+
      (regexp_count(redacted, lit(EMAIL))
        + regexp_count(redacted, lit(PHONE))
        + regexp_count(redacted, lit(IPV4))).cast("long").as("n_residual"): _*)
  }

  /** The deterministic PII planting rule for the q166 gate: append to each
    * document, by doc_id modulus,
    *   - id ≡ 0 (mod 7):  ` user<id>@example.com`
    *   - id ≡ 0 (mod 11): ` +1555<id zero-padded to 7 digits>`
    *   - id ≡ 0 (mod 13): ` 10.<id%256>.<(id div 256)%256>.<id%254+1>`
    * Every piece is integer-derived string concatenation — expressible
    * op-for-op in any SQL engine, so the oracle can both re-plant and,
    * more importantly, PREDICT the per-kind counts without running a
    * regex. All three planted forms are inside the bank's languages by
    * construction.
    */
  def plantPii(idCol: Column, textCol: Column): Column = {
    val id = idCol.cast("long")
    concat(textCol,
      when(id % 7 === 0,
        concat(lit(" user"), id.cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(id % 11 === 0,
        concat(lit(" +1555"), lpad((id % 10000000L).cast("string"), 7, "0")))
        .otherwise(lit("")),
      when(id % 13 === 0,
        // id div 256 spelled as a bit shift — integer-exact in any engine
        // (the oracle mirrors it as `//`), no double division anywhere
        concat(lit(" 10."), (id % 256).cast("string"), lit("."),
          (shiftright(id, 8) % 256).cast("string"),
          lit("."), (id % 254 + 1).cast("string")))
        .otherwise(lit("")))
  }
}
