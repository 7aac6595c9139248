package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.TextFunctions

/** d23 PII scrub + d24 URL/domain-blocklist filter: kernel behavior on
  * literal rows, planted-span recovery on the fixture corpus, and the
  * d24 broadcast-join plan shape (the blocklist must never shuffle the
  * corpus side). */
class PiiUrlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("scrubPii replaces emails, phones and IPv4s with typed tags") {
    import spark.implicits._
    val got = Seq(
      "reach a.b-c_d@ex-1.example.co or 555-123-4567 from 10.0.0.1 now",
      "no pii here",
      "двa emails x@y.io z@w.org and ip 192.168.001.255 end")
      .toDF("text")
      .select(TextFunctions.scrubPii(col("text")).as("t"))
      .as[String].collect()
    assert(got(0) === "reach <EMAIL> or <PHONE> from <IP> now")
    assert(got(1) === "no pii here")
    assert(got(2) === "двa emails <EMAIL> <EMAIL> and ip <IP> end")
  }

  test("piiCounts counts matches per category on the original text") {
    import spark.implicits._
    val (ne, np, ni) = TextFunctions.piiCounts(col("text"))
    val r = Seq("a@b.co c@d.org 555-000-1111 1.2.3.4 5.6.7.8 not-a-phone 12-34")
      .toDF("text").select(ne, np, ni).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((2L, 1L, 2L)))
  }

  test("d23 finds exactly the planted spans: counts follow doc_id arithmetic") {
    val out = NorthStar.piiScrub(spark, dir)
      .select("doc_id", "n_emails", "n_phones", "n_ips").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === (if (id % 3 == 0) 1L else 0L), s"emails doc $id")
      assert(r.getLong(2) === (if (id % 5 == 0) 1L else 0L), s"phones doc $id")
      assert(r.getLong(3) === (if (id % 7 == 0) 1L else 0L), s"ips doc $id")
    }
  }

  test("d23 scrub leaves no residual PII in the scrubbed text") {
    val (ne, np, ni) = TextFunctions.piiCounts(TextFunctions.scrubPii(col("text")))
    val residual = NorthStar.withPlantedPii(spark, dir)
      .select((ne + np + ni).as("n")).agg(sum("n")).head.getLong(0)
    assert(residual === 0L, "scrubbed corpus must contain zero PII matches")
  }

  test("d24 keep/drop and counts follow the planted doc_id arithmetic") {
    val out = NorthStar.urlDomainFilter(spark, dir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val id = r.getLong(0)
      val expUrls = (if (id % 4 == 0) 1L else 0L) + (if (id % 10 == 0) 1L else 0L)
      assert(r.getLong(1) === expUrls, s"n_urls doc $id")
      assert(r.getLong(2) === (if (id % 10 == 0) 1L else 0L), s"n_blocked doc $id")
      assert(r.getBoolean(3) === (id % 10 != 0), s"keep doc $id")
    }
  }

  test("d24 joins the blocklist by BROADCAST — corpus never shuffles on domain") {
    val df = NorthStar.urlDomainFilter(spark, dir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"blocklist join must be broadcast:\n$plan")
    // the only hash-partitioned exchanges may be on doc_id (the
    // count-back agg and the widening repartition) — never on domain
    val badExchange = plan.linesIterator
      .filter(_.contains("hashpartitioning"))
      .filter(_.contains("domain"))
    assert(badExchange.isEmpty,
      s"corpus side must not shuffle on domain:\n$plan")
  }
}
