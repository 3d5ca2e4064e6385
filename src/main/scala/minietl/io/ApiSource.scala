package minietl.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.{DataFrame, SparkSession}

import minietl.scheduler.Retry

/** Driver-side REST source (reference: mini_etl/components/extractors.py:359-523
  * `APIExtractor`): pagination (`page` or `offset` styles, stopping when a
  * page returns fewer than `limit` records), basic/bearer auth, a dotted
  * `dataPath` into the response JSON, and exponential-backoff retry.
  *
  * Scale posture: the FETCH is inherently driver-side (remote APIs are not
  * splittable without server cooperation), but parsing and everything
  * downstream is distributed — pages are forwarded as raw JSON lines into
  * `spark.read.json`, so schema inference and decoding run on executors.
  * For a splittable paged API the scale path is a DataSourceV2 with one
  * InputPartition per page range (SURVEY §2.1); out of scope here because
  * the build has no network egress to exercise it against.
  */
object ApiSource {

  sealed trait Pagination
  object Pagination {
    case object None_ extends Pagination
    /** `?page=1,2,...` with `limit` records per page (extractors.py:473-481). */
    final case class Page(pageParam: String = "page", limitParam: String = "limit",
                          limit: Int = 100, startPage: Int = 1) extends Pagination
    /** `?offset=0,limit,2*limit,...` (extractors.py:483-490). */
    final case class Offset(offsetParam: String = "offset", limitParam: String = "limit",
                            limit: Int = 100) extends Pagination
  }

  sealed trait Auth
  object Auth {
    case object None_ extends Auth
    final case class Basic(user: String, password: String) extends Auth
    final case class Bearer(token: String) extends Auth
  }

  private val mapper = new ObjectMapper()

  /** Navigate a dotted path ("data.items") into a JSON tree
    * (extractors.py:510-517); empty path = whole document.
    */
  private[io] def navigate(root: JsonNode, dataPath: String): JsonNode =
    if (dataPath.isEmpty) root
    else dataPath.split('.').foldLeft(root) { (n, seg) =>
      val nxt = n.get(seg)
      require(nxt != null, s"data_path segment '$seg' not found in response")
      nxt
    }

  /** Records of one response document as raw JSON strings (array → elements,
    * object → single record).
    */
  private[io] def records(body: String, dataPath: String): Seq[String] = {
    val node = navigate(mapper.readTree(body), dataPath)
    if (node.isArray) (0 until node.size).map(i => node.get(i).toString)
    else Seq(node.toString)
  }

  def fetch(
      spark: SparkSession,
      url: String,
      params: Map[String, String] = Map.empty,
      headers: Map[String, String] = Map.empty,
      dataPath: String = "",
      pagination: Pagination = Pagination.None_,
      auth: Auth = Auth.None_,
      timeoutSec: Int = 30,
      retry: Retry.RetryConfig = Retry.RetryConfig(),
      maxPages: Int = 10000): DataFrame = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(timeoutSec)).build()

    def get(extraParams: Map[String, String]): String = Retry.withBackoff(retry) {
      val all = params ++ extraParams
      val qs = all.map { case (k, v) =>
        java.net.URLEncoder.encode(k, "UTF-8") + "=" + java.net.URLEncoder.encode(v, "UTF-8")
      }.mkString("&")
      val full = if (qs.isEmpty) url else s"$url${if (url.contains("?")) "&" else "?"}$qs"
      val builder = HttpRequest.newBuilder(URI.create(full))
        .timeout(Duration.ofSeconds(timeoutSec)).GET()
      headers.foreach { case (k, v) => builder.header(k, v) }
      auth match {
        case Auth.Basic(u, pw) =>
          val enc = java.util.Base64.getEncoder.encodeToString(s"$u:$pw".getBytes("UTF-8"))
          builder.header("Authorization", s"Basic $enc")
        case Auth.Bearer(t) => builder.header("Authorization", s"Bearer $t")
        case Auth.None_ => ()
      }
      val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() >= 400)
        throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $full")
      resp.body()
    }

    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    pagination match {
      case Pagination.None_ =>
        lines ++= records(get(Map.empty), dataPath)
      case p: Pagination.Page =>
        var page = p.startPage
        var done = false
        while (!done && page - p.startPage < maxPages) {
          val recs = records(get(Map(p.pageParam -> page.toString,
            p.limitParam -> p.limit.toString)), dataPath)
          lines ++= recs
          done = recs.size < p.limit // short page = last page (extractors.py:453-457)
          page += 1
        }
      case o: Pagination.Offset =>
        var offset = 0L
        var done = false
        while (!done && offset / o.limit < maxPages) {
          val recs = records(get(Map(o.offsetParam -> offset.toString,
            o.limitParam -> o.limit.toString)), dataPath)
          lines ++= recs
          done = recs.size < o.limit
          offset += o.limit
        }
    }

    import spark.implicits._
    spark.read.json(lines.toSeq.toDS())
  }
}
