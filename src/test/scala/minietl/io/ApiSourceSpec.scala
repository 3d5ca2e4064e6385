package minietl.io

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import minietl.SparkTestBase
import minietl.scheduler.Retry
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the driver-side REST source against a local JDK HttpServer —
  * no network egress needed.
  */
class ApiSourceSpec extends AnyFunSuite with SparkTestBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val flakyCalls = new AtomicInteger(0)

  private def qparams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match { case Array(k, v) => Some(k -> v); case _ => None }
    }.toMap).getOrElse(Map.empty)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // 25 users, paginated via page/limit, nested under data.items
    server.createContext("/users", (ex: HttpExchange) => {
      val p = qparams(ex)
      val page = p.getOrElse("page", "1").toInt
      val limit = p.getOrElse("limit", "10").toInt
      val start = (page - 1) * limit
      val items = (start until math.min(start + limit, 25))
        .map(i => s"""{"id":$i,"name":"user_$i","score":${i * 10}}""")
      respond(ex, 200, s"""{"data":{"items":[${items.mkString(",")}]}}""")
    })
    // offset-style pagination, bare array response
    server.createContext("/events", (ex: HttpExchange) => {
      val p = qparams(ex)
      val offset = p.getOrElse("offset", "0").toInt
      val limit = p.getOrElse("limit", "10").toInt
      val items = (offset until math.min(offset + limit, 7)).map(i => s"""{"e":$i}""")
      respond(ex, 200, s"[${items.mkString(",")}]")
    })
    // auth check
    server.createContext("/secure", (ex: HttpExchange) => {
      Option(ex.getRequestHeaders.getFirst("Authorization")) match {
        case Some("Bearer sesame") => respond(ex, 200, """[{"ok":true}]""")
        case _ => respond(ex, 401, """{"error":"unauthorized"}""")
      }
    })
    // fails twice, then succeeds — exercises retry
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (flakyCalls.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, """[{"ok":1}]""")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private val noSleepRetry = Retry.RetryConfig(sleep = _ => ())

  test("page-style pagination walks pages until a short page; data_path navigates") {
    val df = ApiSource.fetch(spark, s"$base/users",
      dataPath = "data.items",
      pagination = ApiSource.Pagination.Page(limit = 10),
      retry = noSleepRetry)
    assert(df.count() === 25)
    assert(df.columns.sorted.toSeq === Seq("id", "name", "score"))
    assert(df.agg(sum("score")).collect()(0).getLong(0) === (0 until 25).map(_ * 10).sum)
  }

  test("offset-style pagination stops on short page") {
    val df = ApiSource.fetch(spark, s"$base/events",
      pagination = ApiSource.Pagination.Offset(limit = 3), retry = noSleepRetry)
    assert(df.count() === 7)
  }

  test("bearer auth header is sent; 4xx surfaces as IOException") {
    val ok = ApiSource.fetch(spark, s"$base/secure",
      auth = ApiSource.Auth.Bearer("sesame"), retry = noSleepRetry)
    assert(ok.count() === 1)
    intercept[java.io.IOException] {
      ApiSource.fetch(spark, s"$base/secure", retry = noSleepRetry)
    }
  }

  test("transient 5xx is retried with backoff until success") {
    flakyCalls.set(0)
    val df = ApiSource.fetch(spark, s"$base/flaky", retry = noSleepRetry)
    assert(df.count() === 1)
    assert(flakyCalls.get() === 3)
  }

  test("dotted data_path errors clearly on a missing segment") {
    val e = intercept[IllegalArgumentException] {
      ApiSource.fetch(spark, s"$base/users", dataPath = "data.nope", retry = noSleepRetry)
    }
    assert(e.getMessage.contains("nope"))
  }
}
