package graft.locate

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Paths}
import java.time.Duration

import scala.util.Try

import graft.model.Model

/** Discovers the corpus layout by fetching `{root}/{organism}/homes_index`
  * and parsing one data-source path per non-blank line into
  * {basename -> path} (api.py:22-36). Retries with exponential backoff
  * 2^attempt, and degrades silently to an empty source map on total
  * failure (api.py:28-29, 56-57 — preserved quirk, documented in SURVEY
  * §7.4.4). `file:` URIs and bare paths are served from the local
  * filesystem so the zero-egress test environment works unchanged.
  */
final class EndpointConnector(
    val organism: String,
    val rootUrl: String,
    attempts: Int = 3,
    sleepMs: Long => Unit = ms => Thread.sleep(ms)) {

  val rootOrganismUrl: String = s"${rootUrl.stripSuffix("/")}/$organism"

  val dataSources: Map[String, String] =
    fetch(s"$rootOrganismUrl/${Model.HomesIndex}") match {
      case Some(body) =>
        body.linesIterator.map(_.trim).filter(_.nonEmpty)
          .map(p => p.split('/').last -> p).toMap
      case None => Map.empty
    }

  private def fetch(endpoint: String): Option[String] = {
    val uri = URI.create(endpoint)
    Option(uri.getScheme) match {
      case Some("http") | Some("https") => fetchHttp(endpoint)
      case Some("file") => Try(Files.readString(Paths.get(uri))).toOption
      case _ => Try(Files.readString(Paths.get(endpoint))).toOption
    }
  }

  private def fetchHttp(endpoint: String): Option[String] = {
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(5)).build()
    val req = HttpRequest.newBuilder(URI.create(endpoint))
      .timeout(Duration.ofSeconds(30)).GET().build()
    (1 to attempts).iterator.flatMap { attempt =>
      val resp = Try(client.send(req, HttpResponse.BodyHandlers.ofString()))
        .toOption.filter(r => r.statusCode >= 200 && r.statusCode < 300)
      if (resp.isEmpty && attempt < attempts) sleepMs(math.pow(2, attempt).toLong * 1000)
      resp.map(_.body)
    }.nextOption()
  }
}
