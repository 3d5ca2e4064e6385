package minietl.io.rest

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import minietl.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class RestDataSourceSpec extends AnyFunSuite with SparkTestBase with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  // which pages were fetched, to prove partition-parallel access
  private val fetchedPages = ConcurrentHashMap.newKeySet[Int]()

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // 12 pages x 25 records nested under data.rows
    server.createContext("/api", (ex: HttpExchange) => {
      val params = Option(ex.getRequestURI.getQuery).getOrElse("")
        .split("&").flatMap(_.split("=", 2) match {
          case Array(k, v) => Some(k -> v); case _ => None
        }).toMap
      val page = params.getOrElse("page", "1").toInt
      val limit = params.getOrElse("limit", "25").toInt
      fetchedPages.add(page)
      val start = (page - 1) * limit
      val items = (start until start + limit)
        .map(i => s"""{"id":$i,"name":"r_$i","score":${i * 0.5}}""")
      val body = s"""{"data":{"rows":[${items.mkString(",")}]}}"""
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private def read(numPartitions: Int) = spark.read
    .format("minietl.io.rest.RestDataSource")
    .schema("id LONG, name STRING, score DOUBLE")
    .option("url", s"$base/api")
    .option("pages", "12")
    .option("limit", "25")
    .option("dataPath", "data.rows")
    .option("numPartitions", numPartitions.toString)
    .load()

  test("reads all pages distributed across the requested partitions") {
    fetchedPages.clear()
    val df = read(numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    assert(df.count() === 300)
    assert(fetchedPages.size() === 12)
    assert(df.agg(sum("id")).collect()(0).getLong(0) === (0 until 300).map(_.toLong).sum)
    assert(df.filter(col("name") === "r_7").select("score").collect()(0).getDouble(0) === 3.5)
  }

  test("column pruning and filters still work through the source") {
    val out = read(numPartitions = 3).filter(col("id") < 10).select("name")
    assert(out.count() === 10)
  }

  test("schema is mandatory") {
    val e = intercept[Exception] {
      spark.read.format("minietl.io.rest.RestDataSource")
        .option("url", s"$base/api").option("pages", "1").load()
    }
    assert(e.getMessage.contains("schema"))
  }

  test("missing required option fails fast") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format("minietl.io.rest.RestDataSource")
        .schema("id LONG").option("url", s"$base/api").load().count()
    }
    assert(e.getMessage.contains("pages"))
  }
}
