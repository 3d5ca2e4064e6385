package minietl.text

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PiiSpec extends AnyFunSuite with SparkTestBase {

  private def red(s: String): String =
    spark.sql("SELECT 1").select(Pii.redact(lit(s)).as("v")).collect()(0).getString(0)

  test("redacts emails, ids, phones, and IPv4s") {
    assert(red("mail bob.smith+x@corp.example.org now") === "mail <EMAIL> now")
    assert(red("ssn 123-45-6789.") === "ssn <ID>.")
    assert(red("call 555-010-1234 or 555 010 1234") === "call <PHONE> or <PHONE>")
    assert(red("host 192.168.0.1 up") === "host <IP> up")
  }

  test("multiple matches all go; clean text is untouched") {
    assert(red("a@b.co c@d.org") === "<EMAIL> <EMAIL>")
    assert(red("no pii here, just words") === "no pii here, just words")
  }

  test("digit-group shapes do not cross-match") {
    // 3-2-4 is an ID, 3-3-4 is a phone; partial shapes survive
    assert(red("123-45-6789 and 123-456-7890") === "<ID> and <PHONE>")
    assert(red("12-34-56 stays") === "12-34-56 stays")
  }

  test("counts are measured on the original text") {
    val row = spark.sql("SELECT 1")
      .select(Pii.counts(lit("a@b.co 10.0.0.1 10.0.0.2")): _*).collect()(0)
    assert(row.getLong(0) === 1L) // email
    assert(row.getLong(1) === 0L) // id
    assert(row.getLong(2) === 0L) // phone
    assert(row.getLong(3) === 2L) // ipv4
  }
}
