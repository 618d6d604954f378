package graft

import org.apache.spark.sql.functions._
import graft.ops.PiiOps

class PiiOpsSpec extends SparkSpec {
  import spark.implicits._

  private def scrubOne(text: String): (Map[String, Long], String) = {
    val df = Seq((1L, text)).toDF("id", "text")
    val row = PiiOps.scrub(df, "text").collect().head
    val counts = Seq("n_email", "n_cc", "n_ssn", "n_phone", "n_ipv4", "pii_total")
      .map(c => c -> row.getAs[Long](c)).toMap
    (counts, row.getAs[String]("text"))
  }

  test("pii scrub: each kind detected, counted and redacted") {
    val (c, r) = scrubOne(
      "mail a.b+c@x-corp.co.uk call 555-123-4567 or 800-555-0199, " +
        "ssn 123-45-6789, card 4111 1111 1111 1111 ip 192.168.0.1 done")
    assert(c("n_email") == 1 && c("n_phone") == 2 && c("n_ssn") == 1)
    assert(c("n_cc") == 1 && c("n_ipv4") == 1 && c("pii_total") == 6)
    assert(r == "mail <EMAIL> call <PHONE> or <PHONE>, ssn <SSN>, " +
      "card <CC> ip <IP> done")
  }

  test("pii scrub: non-PII digit shapes survive; word boundaries respected") {
    // 5-digit runs, date-ish shapes, version strings must NOT redact
    val (c, r) = scrubOne("v1.2.3 built 2024-01-15 order 12345-67890 x1234-5678-9012-34567")
    assert(c("pii_total") == 0)
    assert(r == "v1.2.3 built 2024-01-15 order 12345-67890 x1234-5678-9012-34567")
    // embedded in longer digit runs: \b blocks the match
    assert(scrubOne("9555-123-45678")._1("n_phone") == 0)
  }

  test("pii ipv4: octets bounded to 0-255; dotted-run prefix over-match documented") {
    // out-of-range octets are not addresses
    assert(scrubOne("at 999.999.999.999 and 256.1.1.1 and 1.2.3.999")._1("n_ipv4") == 0)
    assert(scrubOne("edge 255.255.255.255 and 0.0.0.0")._1("n_ipv4") == 2)
    // leading-zero octets are not the dotted-quad form
    assert(scrubOne("not 10.0.01.5")._1("n_ipv4") == 0)
    // DOCUMENTED residual (no lookahead in the Java∩RE2 subset): a valid
    // quad that prefixes a longer dotted run still matches
    val (c, r) = scrubOne("release 1.2.3.4.5 shipped")
    assert(c("n_ipv4") == 1 && r == "release <IP>.5 shipped")
    // …but a version string glued to a word char has no leading \b, so the
    // match (if any) starts at the first dot-preceded octet
    val (c2, r2) = scrubOne("v1.2.3.4.5 shipped")
    assert(c2("n_ipv4") == 1 && r2 == "v1.<IP> shipped")
  }

  test("dropHighPii filters by density; scrub on empty text is a no-op") {
    val df = Seq(
      (1L, "a@b.co c@d.co e@f.co"),                       // 3 PII / 20 chars
      (2L, ("clean words " * 50) + "one a@b.co mention"), // 1 / ~620 chars
      (3L, "")).toDF("doc_id", "text")
    val kept = PiiOps.dropHighPii(df, "text", maxPerKChars = 20.0)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
    assert(scrubOne("")._1("pii_total") == 0L)
  }
}
