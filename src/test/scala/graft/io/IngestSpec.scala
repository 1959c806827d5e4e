package graft.io

import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {

  test("extractZip unpacks entries and guards against zip-slip") {
    val dir = Files.createTempDirectory("ingest")
    val zip = dir.resolve("a.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new ZipEntry("sub/data.tsv"))
    zos.write("k\tv\n1\t2\n".getBytes)
    zos.closeEntry(); zos.close()
    val out = Ingest.extractZip(zip, dir.resolve("db_25_1_text"))
    assert(out.map(_.getFileName.toString) == Seq("data.tsv"))
    assert(new String(Files.readAllBytes(out.head)).startsWith("k\tv"))
  }

  test("extractZip rejects zip-slip entries") {
    val dir = Files.createTempDirectory("ingest")
    val zip = dir.resolve("evil.zip")
    val zos = new ZipOutputStream(Files.newOutputStream(zip))
    zos.putNextEntry(new ZipEntry("../evil.txt"))
    zos.write("x".getBytes)
    zos.closeEntry(); zos.close()
    intercept[IllegalArgumentException] {
      Ingest.extractZip(zip, dir.resolve("out"))
    }
  }

  test("parseVersion parses db_MAJOR_MINOR names (etl_io.py:672)") {
    assert(Ingest.parseVersion("db_25_1_text") == Some((25, 1)))
    assert(Ingest.parseVersion("db_10_0") == Some((10, 0)))
    assert(Ingest.parseVersion("not_a_db") == None)
  }

  test("discoverPublishedVersions parses versions out of a listing page (etl_io.py:710-736)") {
    val html =
      """<html><body>
        |<a href="/downloads/db_25_1_text.zip">db_25_1_text.zip</a>
        |<a href="/downloads/db_25_0_text.zip">db_25_0_text.zip</a>
        |<a href="/downloads/db_9_9_text.zip">old db_9_9</a>
        |<a href="/other/readme.html">readme</a>
        |</body></html>""".stripMargin
    val found = Ingest.discoverPublishedVersions(html)
    assert(found.map(_._2) == Seq((25, 1), (25, 0), (9, 9))) // newest first
    assert(Ingest.newestPublishedVersion(html) == Some((25, 1)))
    assert(Ingest.newestPublishedVersion("<html>no links</html>") == None)
    // end-to-end with the local stage: published 25.1 vs staged 10.0
    val root = Files.createTempDirectory("pubversions")
    Files.createDirectory(root.resolve("db_10_0_text"))
    assert(Ingest.needsUpdate(root, Ingest.newestPublishedVersion(html).get))
  }

  test("newestLocalVersion picks numerically-newest staged dir") {
    val root = Files.createTempDirectory("versions")
    Files.createDirectory(root.resolve("db_9_9_text"))
    Files.createDirectory(root.resolve("db_10_0_text"))
    val newest = Ingest.newestLocalVersion(root)
    assert(newest.map(_._2) == Some((10, 0)))
    assert(Ingest.needsUpdate(root, (10, 1)))
    assert(!Ingest.needsUpdate(root, (10, 0)))
  }

  test("version ordering is numeric per component: minor 10 beats minor 2 (float parse would invert)") {
    val root = Files.createTempDirectory("versions10")
    Files.createDirectory(root.resolve("db_9_2_text"))
    Files.createDirectory(root.resolve("db_9_10_text"))
    assert(Ingest.newestLocalVersion(root).map(_._2) == Some((9, 10)))
    assert(!Ingest.needsUpdate(root, (9, 10)))
    assert(Ingest.needsUpdate(root, (9, 11)))
  }
}
