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

  /** Minimal JSON string escaping (the reference goes through
    * json.dumps).
    */
  private def j(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** S3 — `_msearch` NDJSON header line, field-for-field as the
    * reference (download_slow_queries.py:248-260).
    */
  def buildRequestHeader(index: String): String =
    s"""{"index": ${j(index)}, "ignore_unavailable": true, "timeout": 30000}"""

  /** S3 — `_msearch` body line: bool query of match_phrase(message) AND
    * epoch-second timestamp range AND an optional query_string (which
    * the reference wraps in embedded quotes — an exact PHRASE, not
    * term OR), sorted newest-first, paged via size/from
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
    must.append(s"""{"match_phrase": {"message": {"query": ${j(message)}}}}""")
    must.append(
      s""", {"range": {"@timestamp": {"gte": $startEpochSec, "lte": $endEpochSec, "format": "epoch_second"}}}""")
    queryString.foreach { q =>
      // reference: "query": "\"{}\"".format(query) — embedded quotes
      must.append(
        s""", {"query_string": {"query": ${j("\"" + q + "\"")}, "analyze_wildcard": true, "default_field": "*"}}""")
    }
    s"""{"query": {"bool": {"must": [${must.result()}]}}, "size": $size, "from": $from, """ +
      s""""sort": [{"@timestamp": {"order": "desc", "unmapped_type": "boolean"}}]}"""
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

  private val fmtDateTime = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm[:ss]")
  private val fmtTime = DateTimeFormatter.ofPattern("HH:mm[:ss]")

  /** F10 — resolve the ingest window (download_slow_queries.py:159-183):
    * no inputs -> 05:00-12:00 of `today`; exactly one input -> error
    * (reference: 'Must provide both start and end time'); inputs
    * without a date part ('-' probe, as the reference) get today's
    * date; seconds optional.
    */
  def timeInterval(
      start: Option[String],
      end: Option[String],
      today: LocalDate): (LocalDateTime, LocalDateTime) = {
    (start, end) match {
      case (None, None) =>
        (today.atTime(LocalTime.of(5, 0)), today.atTime(LocalTime.of(12, 0)))
      case (Some(s), Some(e)) =>
        def resolve(v: String): LocalDateTime =
          if (v.contains("-")) LocalDateTime.parse(v, fmtDateTime)
          else today.atTime(LocalTime.parse(v, fmtTime))
        (resolve(s), resolve(e))
      case _ =>
        throw new IllegalArgumentException("Must provide both start and end time")
    }
  }

  def toEpochSecond(dt: LocalDateTime, zone: ZoneId): Long =
    dt.atZone(zone).toEpochSecond
}
