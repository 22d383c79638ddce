package graft.cache

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{AtomicMoveNotSupportedException, Files, Path, Paths,
  StandardCopyOption, StandardOpenOption}
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
    * (accessor.py:111). URL paths come from remote-controlled input (the
    * homes_index listing and metadata-derived project ids), so the
    * resolved path is normalized and MUST stay under mirrorRoot — a
    * crafted '..' segment would otherwise escape the mirror and write
    * arbitrary local files.
    */
  def localPath(url: String): Path = {
    val p = Option(URI.create(url).getPath).getOrElse(url)
    val resolved = mirrorRoot.resolve(p.stripPrefix("/")).normalize()
    require(resolved.startsWith(mirrorRoot.normalize()),
      s"url path escapes the mirror root: $url")
    resolved
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

  /** Fetch to a temp file in the destination directory, then move it
    * into place atomically — a crash mid-download must never leave a
    * truncated file that `Files.exists` would treat as cached forever.
    * Redirects are followed (the reference's urlretrieve does; the
    * corpus root is plain http and commonly 301s to https) and anything
    * other than a 2xx is a failure — without this, a 301 body (empty or
    * an HTML stub) would be cached as the file.
    */
  private def fetchTo(url: String, dest: Path): Unit = {
    val uri = URI.create(url)
    val tmp = Files.createTempFile(dest.getParent, s".${dest.getFileName}.", ".part")
    try {
      Option(uri.getScheme) match {
        case Some("http") | Some("https") =>
          val client = HttpClient.newBuilder()
            .followRedirects(HttpClient.Redirect.NORMAL)
            .build()
          val req = HttpRequest.newBuilder(uri).GET().build()
          val resp = client.send(req,
            HttpResponse.BodyHandlers.ofFile(tmp, StandardOpenOption.WRITE,
              StandardOpenOption.TRUNCATE_EXISTING))
          if (resp.statusCode < 200 || resp.statusCode >= 300)
            throw new RuntimeException(s"HTTP ${resp.statusCode} for $url")
        case Some("file") =>
          Files.copy(Paths.get(uri), tmp, StandardCopyOption.REPLACE_EXISTING)
        case _ =>
          Files.copy(Paths.get(url), tmp, StandardCopyOption.REPLACE_EXISTING)
      }
      try Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      catch { case _: AtomicMoveNotSupportedException =>
        Files.move(tmp, dest, StandardCopyOption.REPLACE_EXISTING)
      }
    } finally Files.deleteIfExists(tmp)
  }
}
