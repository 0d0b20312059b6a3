package graft

import graft.functions.TextFunctions

/** Redaction behavior on planted PII (the corpus fixture carries none,
  * so the oracle only pins cross-engine regex parity — the semantics
  * live here). */
class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("redact scrubs emails, IPv4s and phone-like runs to typed tags") {
    val df = Seq(
      (1L, "contact alice.smith+x@example.co.uk or bob@host.org today"),
      (2L, "server at 192.168.001.1 answered, backup at 10.0.0.255"),
      (3L, "call +1 (555) 123-4567 or 0800 555 0199 now"),
      (4L, "no pii here, just words and the number 42")
    ).toDF("doc_id", "text")
      .select($"doc_id", TextFunctions.redact($"text").as("r"))
    val out = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "contact [EMAIL] or [EMAIL] today")
    assert(out(2L) == "server at [IP] answered, backup at [IP]")
    assert(out(3L) == "call [PHONE] or [PHONE] now")
    assert(out(4L) == "no pii here, just words and the number 42")
  }

  test("an email's host is never half-eaten as an IP or phone") {
    val out = Seq(Tuple1("mail 10.20.30.40@example.com end")).toDF("text")
      .select(TextFunctions.redact($"text")).as[String].head()
    assert(out == "mail [EMAIL] end")
  }
}
