package graft.io

import java.io.{BufferedInputStream, FileOutputStream, InputStream}
import java.net.URI
import scala.jdk.CollectionConverters._
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.{Files, Path, Paths}
import java.util.zip.ZipInputStream

/** Driver-side ingestion utilities (SURVEY.md §2.1 S6/S7).
  *
  * The reference stream-downloads a zip in 1 KB chunks and extracts it to a
  * versioned directory (etl_io.py:679-708), and discovers the newest local
  * version by parsing directory names (etl_io.py:666-677, :710-736). These
  * are NOT distributed operators — they stage files for the scan layer. At
  * 100 TB the landing zone is an object store and this becomes an external
  * loader; the version-discovery logic is what survives.
  *
  * NB the reference's auto-update path is dead code (it calls a misspelled
  * method, etl_io.py:732) — behavior deliberately not replicated.
  */
object Ingest {

  /** S6: download `url` to `dest` (streaming, constant memory). The default
    * client follows redirects — dataset links are near-universally 301/302
    * (mirrors, presigned storage URLs); the JDK default of NEVER would fail
    * them at the 2xx check. */
  def download(url: String, dest: Path,
               client: HttpClient = HttpClient.newBuilder()
                 .followRedirects(HttpClient.Redirect.NORMAL).build()): Path = {
    val req = HttpRequest.newBuilder(URI.create(url)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofInputStream())
    require(resp.statusCode() / 100 == 2, s"GET $url -> ${resp.statusCode()}")
    copyStream(resp.body(), dest)
    dest
  }

  /** S6: extract a zip archive into `destDir` (zip-slip-guarded). */
  def extractZip(zipFile: Path, destDir: Path): Seq[Path] = {
    Files.createDirectories(destDir)
    val zis = new ZipInputStream(new BufferedInputStream(Files.newInputStream(zipFile)))
    try {
      Iterator.continually(zis.getNextEntry).takeWhile(_ != null).flatMap { e =>
        val out = destDir.resolve(e.getName).normalize()
        require(out.startsWith(destDir.normalize()), s"zip-slip entry: ${e.getName}")
        if (e.isDirectory) { Files.createDirectories(out); None }
        else {
          Files.createDirectories(out.getParent)
          copyStream(zis, out, closeIn = false)
          Some(out)
        }
      }.toList
    } finally zis.close()
  }

  /** F6/S7: parse a version out of a versioned directory name —
    * "db_25_1_text" -> (25, 1) (etl_io.py:672). Returns None on
    * non-matching names instead of the reference's crash. (major, minor)
    * Int pairs, NOT the reference's float parse: as floats, db_9_10 reads
    * 9.1 and sorts BELOW db_9_2 — a misordering bug deliberately not
    * replicated, like the reference's dead auto-update path. */
  def parseVersion(dirName: String): Option[(Int, Int)] = {
    val m = "db_(\\d+)_(\\d+)".r.findFirstMatchIn(dirName)
    m.map(g => (g.group(1).toInt, g.group(2).toInt))
  }

  private val newestFirst = Ordering[(Int, Int)].reverse

  /** S7: newest locally-staged version directory under `root` (the
    * reference's lexicographic max over dir names, etl_io.py:670 — done
    * numerically here so db_10_0 > db_9_9). */
  def newestLocalVersion(root: Path): Option[(Path, (Int, Int))] = {
    if (!Files.isDirectory(root)) return None
    val listing = Files.list(root) // MUST close: each stream holds an fd
    val versioned =
      try listing.iterator().asScala
        .flatMap(p => parseVersion(p.getFileName.toString).map(v => (p, v)))
        .toList
      finally listing.close()
    versioned.sortBy(_._2)(newestFirst).headOption
  }

  /** S7: check whether a published version is newer than the local stage. */
  def needsUpdate(root: Path, publishedVersion: (Int, Int)): Boolean =
    newestLocalVersion(root).forall(v => Ordering[(Int, Int)].lt(v._2, publishedVersion))

  /** S7 publish side: discover advertised versions in a fetched HTML or
    * manifest string — every token matching the versioned-name pattern,
    * newest first (the reference scrapes its download page for db_MM_m
    * links, etl_io.py:710-736; its auto-update call site is dead code due
    * to a typo, so only this pure, offline-testable parse is replicated). */
  def discoverPublishedVersions(html: String): Seq[(String, (Int, Int))] =
    "db_(\\d+)_(\\d+)".r.findAllMatchIn(html)
      .map(m => m.matched -> ((m.group(1).toInt, m.group(2).toInt)))
      .toSeq.distinct.sortBy(_._2)(newestFirst)

  /** S7: the newest advertised version, if any. */
  def newestPublishedVersion(html: String): Option[(Int, Int)] =
    discoverPublishedVersions(html).headOption.map(_._2)

  private def copyStream(in: InputStream, dest: Path, closeIn: Boolean = true): Unit = {
    // a bare relative dest ("x.zip") has a null parent — nothing to create
    Option(dest.getParent).foreach(Files.createDirectories(_))
    val out = new FileOutputStream(dest.toFile)
    try {
      val buf = new Array[Byte](64 * 1024)
      Iterator.continually(in.read(buf)).takeWhile(_ >= 0)
        .foreach(n => out.write(buf, 0, n))
    } finally {
      out.close()
      if (closeIn) in.close()
    }
  }
}
