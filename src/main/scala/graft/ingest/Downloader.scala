package graft.ingest

import java.time.{LocalDate, LocalDateTime, LocalTime, ZoneId}
import java.time.format.DateTimeFormatter

/** Driver-side port of the reference's Elasticsearch download tooling
  * (`download_slow_queries.py`): the `_msearch` request builder (S3),
  * the Chrome copy-as-cURL config extractor (F9), and the ingest
  * time-interval resolver (F10). These are pure functions — the
  * network step itself stays outside the engine (the reference also
  * decouples download from analysis; a zero-egress build can't
  * exercise a live cluster), and the downloaded page files feed
  * [[KibanaReader]].
  *
  * The request body IS source-side filter pushdown: the match_phrase +
  * timestamp range run inside Elasticsearch
  * (download_slow_queries.py:186-243, optimization O2).
  */
object Downloader {

  val DefaultSize = 10000
  /** Abort threshold (download_slow_queries.py:105-106). */
  val MaxResults = 10000000L

  /** S3 — `_msearch` NDJSON header line
    * (download_slow_queries.py:246-260).
    */
  def buildRequestHeader(index: String): String =
    s"""{"index":["$index"],"ignore_unavailable":true,"timeout":30000,"preference":1541576165784}"""

  /** S3 — `_msearch` body line: bool query of match_phrase(message) AND
    * epoch-second timestamp range AND optional query_string, sorted
    * newest-first, paged via size/from
    * (download_slow_queries.py:186-243).
    */
  def buildRequestBody(
      message: String,
      startEpochSec: Long,
      endEpochSec: Long,
      size: Int = DefaultSize,
      from: Int = 0,
      queryString: Option[String] = None): String = {
    val must = new StringBuilder
    must.append(s"""{"match_phrase":{"message":{"query":"$message"}}}""")
    must.append(
      s""",{"range":{"@timestamp":{"gte":$startEpochSec,"lte":$endEpochSec,"format":"epoch_second"}}}""")
    queryString.foreach { q =>
      must.append(
        s""",{"query_string":{"query":"$q","analyze_wildcard":true,"default_field":"*"}}""")
    }
    s"""{"version":true,"size":$size,"from":$from,""" +
      s""""sort":[{"@timestamp":{"order":"desc","unmapped_type":"boolean"}}],""" +
      s""""query":{"bool":{"must":[${must.result()}],"filter":[],"should":[],"must_not":[]}}}"""
  }

  /** S2 — page count from a total-hits figure
    * (download_slow_queries.py:84-107): ceil(total/size), with the
    * sanity guard on runaway result sets.
    */
  def pageCount(totalHits: Long, size: Int): Int = {
    require(totalHits < MaxResults,
      s"Too many results ($totalHits >= $MaxResults); narrow the time range")
    math.ceil(totalHits.toDouble / size).toInt
  }

  /** F9 — extract (url, index, cookie) from a Chrome "Copy as cURL"
    * blob via the reference's find/slice probes
    * (download_slow_queries.py:300-323). Null fields when absent.
    */
  def fromCurl(curl: String): (String, String, String) = {
    import graft.parse.SlowQueryCatalog.strSlice
    val url = strSlice(curl, "curl '", "/elasticsearch")
    val index = strSlice(curl, "_msearch", "\n") match {
      case null => null
      case _    => strSlice(curl, "\"index\":[\"", "\"]")
    }
    val cookie = strSlice(curl, "cookie: ", "'")
    (url, index, cookie)
  }

  private val fmtDateTime = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm")
  private val fmtTime = DateTimeFormatter.ofPattern("HH:mm")

  /** F10 — resolve the ingest window (download_slow_queries.py:159-183):
    * defaults 05:00-12:00 of `today`; time-only inputs get today's
    * date; full "yyyy-MM-dd HH:mm" inputs pass through.
    */
  def timeInterval(
      start: Option[String],
      end: Option[String],
      today: LocalDate): (LocalDateTime, LocalDateTime) = {
    def resolve(s: Option[String], default: LocalTime): LocalDateTime = s match {
      case None => today.atTime(default)
      case Some(v) if v.contains(" ") => LocalDateTime.parse(v, fmtDateTime)
      case Some(v) => today.atTime(LocalTime.parse(v, fmtTime))
    }
    (resolve(start, LocalTime.of(5, 0)), resolve(end, LocalTime.of(12, 0)))
  }

  def toEpochSecond(dt: LocalDateTime, zone: ZoneId): Long =
    dt.atZone(zone).toEpochSecond
}
