package minietl.io.rest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.{Map => JMap}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Distributed paged-REST source — the DataSourceV2 scale path for the
  * reference's APIExtractor (SURVEY §2.1): page ranges become
  * InputPartitions, so EXECUTORS fetch pages in parallel instead of the
  * driver looping (the posture of [[minietl.io.ApiSource]], which remains
  * the right tool when the page count is unknown up front).
  *
  * Usage:
  * {{{
  * spark.read.format("minietl.io.rest.RestDataSource")
  *   .schema("id LONG, name STRING, score DOUBLE")   // required; flat atomic fields
  *   .option("url", "http://host/api/users")
  *   .option("pages", "100")        // total page count (known-size APIs)
  *   .option("limit", "500")        // records per page
  *   .load()
  * }}}
  *
  * Options: url (required), pages (required), limit=100, pageParam=page,
  * limitParam=limit, startPage=1, dataPath="" (dotted navigation),
  * numPartitions=min(pages,16), bearerToken, timeoutSec=30.
  */
class RestDataSource extends TableProvider {
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new UnsupportedOperationException(
      "minietl-rest requires an explicit .schema(...) — REST payloads are not sampled for inference")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new RestTable(schema, RestConfig.from(properties))
}

private[rest] final case class RestConfig(
    url: String, pages: Int, limit: Int, pageParam: String, limitParam: String,
    startPage: Int, dataPath: String, numPartitions: Int,
    bearerToken: Option[String], timeoutSec: Int)

private[rest] object RestConfig {
  def from(props: JMap[String, String]): RestConfig = {
    def opt(k: String): Option[String] = Option(props.get(k))
    def req(k: String): String =
      opt(k).getOrElse(throw new IllegalArgumentException(s"minietl-rest needs option '$k'"))
    val pages = req("pages").toInt
    RestConfig(
      url = req("url"),
      pages = pages,
      limit = opt("limit").map(_.toInt).getOrElse(100),
      pageParam = opt("pageParam").getOrElse("page"),
      limitParam = opt("limitParam").getOrElse("limit"),
      startPage = opt("startPage").map(_.toInt).getOrElse(1),
      dataPath = opt("dataPath").getOrElse(""),
      numPartitions = opt("numPartitions").map(_.toInt).getOrElse(math.min(pages, 16)),
      bearerToken = opt("bearerToken"),
      timeoutSec = opt("timeoutSec").map(_.toInt).getOrElse(30))
  }
}

private[rest] class RestTable(schema: StructType, cfg: RestConfig)
  extends Table with SupportsRead {
  override def name(): String = s"rest(${cfg.url})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] = {
        val per = math.max(1, math.ceil(cfg.pages.toDouble / cfg.numPartitions).toInt)
        (cfg.startPage until (cfg.startPage + cfg.pages) by per).map { first =>
          RestInputPartition(first, math.min(first + per - 1, cfg.startPage + cfg.pages - 1))
            .asInstanceOf[InputPartition]
        }.toArray
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new RestReaderFactory(schema, cfg)
    }
}

private[rest] final case class RestInputPartition(firstPage: Int, lastPage: Int)
  extends InputPartition

private[rest] class RestReaderFactory(schema: StructType, cfg: RestConfig)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RestInputPartition]
    new RestPartitionReader(schema, cfg, p.firstPage, p.lastPage)
  }
}

private[rest] class RestPartitionReader(
    schema: StructType, cfg: RestConfig, firstPage: Int, lastPage: Int)
  extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(cfg.timeoutSec)).build()

  private var page = firstPage
  private var current: Iterator[JsonNode] = Iterator.empty
  private var row: InternalRow = _

  private def fetch(p: Int): Iterator[JsonNode] = {
    val sep = if (cfg.url.contains("?")) "&" else "?"
    val uri = URI.create(
      s"${cfg.url}$sep${cfg.pageParam}=$p&${cfg.limitParam}=${cfg.limit}")
    val builder = HttpRequest.newBuilder(uri)
      .timeout(Duration.ofSeconds(cfg.timeoutSec)).GET()
    cfg.bearerToken.foreach(t => builder.header("Authorization", s"Bearer $t"))
    val resp = client.send(builder.build(), HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() >= 400)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} from $uri")
    val node = cfg.dataPath.split('.').filter(_.nonEmpty)
      .foldLeft(mapper.readTree(resp.body())) { (n, seg) =>
        val nxt = n.get(seg)
        require(nxt != null, s"dataPath segment '$seg' not found")
        nxt
      }
    if (node.isArray) (0 until node.size).iterator.map(node.get)
    else Iterator.single(node)
  }

  private def toRow(node: JsonNode): InternalRow = {
    val vals: Array[Any] = schema.fields.map { f =>
      val v = node.get(f.name)
      if (v == null || v.isNull) null
      else f.dataType match {
        case LongType => v.asLong()
        case IntegerType => v.asInt()
        case DoubleType => v.asDouble()
        case FloatType => v.asDouble().toFloat
        case BooleanType => v.asBoolean()
        case StringType => UTF8String.fromString(if (v.isTextual) v.asText() else v.toString)
        case other => throw new UnsupportedOperationException(
          s"minietl-rest supports flat atomic schemas; field ${f.name} is $other")
      }
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def next(): Boolean = {
    while (!current.hasNext && page <= lastPage) {
      current = fetch(page)
      page += 1
    }
    if (current.hasNext) { row = toRow(current.next()); true } else false
  }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
