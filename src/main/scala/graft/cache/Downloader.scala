package graft.cache

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Local-mirror file cache: each URL lands at {mirrorRoot}/{url path}
  * (accessor.py:107-120, 302-312), skipping files already present.
  * Unlike the reference's unbounded asyncio fan-out (noted in-code at
  * accessor.py:118), parallelism is bounded by a fixed thread pool — the
  * shape that survives a million-file corpus. `file:` URLs are copied,
  * which is what the zero-egress tests use.
  */
final class Downloader(mirrorRoot: Path, parallelism: Int = 8) {

  /** Mirror path for a URL: its URI path with the leading '/' stripped
    * (accessor.py:111).
    */
  def localPath(url: String): Path = {
    val p = Option(URI.create(url).getPath).getOrElse(url)
    mirrorRoot.resolve(p.stripPrefix("/"))
  }

  /** Download every URL not already mirrored; returns the local paths of
    * all requested URLs (cached or fresh).
    */
  def cache(urls: Seq[String]): Seq[Path] = {
    val pool = Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val work = urls.map { url =>
        val dest = localPath(url)
        if (Files.exists(dest)) Future.successful(dest)
        else Future {
          Files.createDirectories(dest.getParent)
          fetchTo(url, dest)
          dest
        }
      }
      Await.result(Future.sequence(work), Duration.Inf)
    } finally pool.shutdown()
  }

  private def fetchTo(url: String, dest: Path): Unit = {
    val uri = URI.create(url)
    Option(uri.getScheme) match {
      case Some("http") | Some("https") =>
        val client = HttpClient.newBuilder().build()
        val req = HttpRequest.newBuilder(uri).GET().build()
        val resp = client.send(req, HttpResponse.BodyHandlers.ofFile(dest))
        if (resp.statusCode >= 400) {
          Files.deleteIfExists(dest)
          throw new RuntimeException(s"HTTP ${resp.statusCode} for $url")
        }
      case Some("file") =>
        Files.copy(Paths.get(uri), dest, StandardCopyOption.REPLACE_EXISTING)
      case _ =>
        Files.copy(Paths.get(url), dest, StandardCopyOption.REPLACE_EXISTING)
    }
  }
}
