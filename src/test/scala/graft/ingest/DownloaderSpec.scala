package graft.ingest

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

class DownloaderSpec extends AnyFunSuite {

  test("request body is valid JSON with phrase, epoch range, paging, desc sort") {
    val body = Downloader.buildRequestBody(
      "Query too slow", 1700000000L, 1700025200L, size = 500, from = 1000)
    assert(body.contains(""""match_phrase": {"message": {"query": "Query too slow"}}"""))
    assert(body.contains(""""gte": 1700000000, "lte": 1700025200, "format": "epoch_second""""))
    assert(body.contains(""""size": 500, "from": 1000"""))
    assert(body.contains(""""order": "desc""""))
    assert(!body.contains("query_string"))
  }

  test("optional query_string is phrase-quoted like the reference") {
    // download_slow_queries.py:237 wraps the query in embedded quotes
    val body = Downloader.buildRequestBody("m", 0, 1,
      queryString = Some("keyspace ks1"))
    assert(body.contains(""""query_string": {"query": "\"keyspace ks1\""""))
  }

  test("strings with quotes are JSON-escaped") {
    val body = Downloader.buildRequestBody("""say "slow"""", 0, 1)
    assert(body.contains("""say \"slow\""""))
    val header = Downloader.buildRequestHeader("""idx"x""")
    assert(header == """{"index": "idx\"x", "ignore_unavailable": true, "timeout": 30000}""")
  }

  test("page count ceils and guards runaway totals") {
    assert(Downloader.pageCount(10000, 10000) == 1)
    assert(Downloader.pageCount(10001, 10000) == 2)
    assert(Downloader.pageCount(0, 10000) == 0)
    intercept[IllegalArgumentException] {
      Downloader.pageCount(10000000L, 10000)
    }
  }

  test("curl blob extraction") {
    val curl =
      "curl 'https://kibana.example.com/elasticsearch/_msearch' " +
        "-H 'cookie: session=abc123' --data-binary $'{\"index\":[\"logstash-*\"]}\n'"
    val (url, index, cookie) = Downloader.fromCurl(curl)
    assert(url == "https://kibana.example.com")
    assert(index == "logstash-*")
    assert(cookie == "session=abc123")
  }

  test("time interval defaults, time-only inputs, seconds, both-or-none") {
    val today = LocalDate.of(2026, 8, 12)
    assert(Downloader.timeInterval(None, None, today) ==
      (LocalDateTime.of(2026, 8, 12, 5, 0), LocalDateTime.of(2026, 8, 12, 12, 0)))
    assert(Downloader.timeInterval(Some("06:30"), Some("2026-08-11 23:15"), today) ==
      (LocalDateTime.of(2026, 8, 12, 6, 30), LocalDateTime.of(2026, 8, 11, 23, 15)))
    // the reference's own docstring example uses seconds
    assert(Downloader.timeInterval(Some("10:00:00"), Some("11:00:00"), today) ==
      (LocalDateTime.of(2026, 8, 12, 10, 0), LocalDateTime.of(2026, 8, 12, 11, 0)))
    intercept[IllegalArgumentException] {
      Downloader.timeInterval(Some("10:00"), None, today)
    }
  }
}
