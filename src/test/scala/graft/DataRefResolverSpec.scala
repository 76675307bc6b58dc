package graft

import java.io.ByteArrayInputStream
import java.nio.file.Files
import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.DataRefResolver

/** ETL plumbing parity (SURVEY §2 S5/S6): pattern path formatting,
  * local-else-remote first-success fallback, one-shot mirror cache —
  * mirrors `RefResolverTest`/`LocalMirrorCacheTest` behaviors. */
class DataRefResolverSpec extends AnyFunSuite {

  private val day = LocalDate.of(2012, 2, 1)

  test("pattern formatting reproduces the reference archive path") {
    // reference pattern "'/F/'yyyy'/FT'yyMMdd'.zip'" -> /F/2012/FT120201.zip
    assert(DataRefResolver.formatPath("'/F/'yyyy'/FT'yyMMdd'.zip'", day)
      === "/F/2012/FT120201.zip")
  }

  test("fallback composition is first-success; all-miss yields None") {
    var remoteCalls = 0
    val local: LocalDate => Option[String] = _ => None
    val remote: LocalDate => Option[String] = d => {
      remoteCalls += 1; Some(s"http://archive/FT$d.zip")
    }
    assert(DataRefResolver.resolve(day, Seq(local, remote)).isDefined)
    assert(remoteCalls === 1)
    assert(DataRefResolver.resolve(day, Seq(local, local)).isEmpty)
    // local hit short-circuits: the remote resolver is never consulted
    val hit: LocalDate => Option[String] = _ => Some("/mirror/FT120201.zip")
    remoteCalls = 0
    assert(DataRefResolver.resolve(day, Seq(hit, remote))
      === Some("/mirror/FT120201.zip"))
    assert(remoteCalls === 0)
  }

  test("mirror cache fetches once, serves from disk afterwards") {
    val dir = Files.createTempDirectory("mirror")
    var opens = 0
    def open() = { opens += 1; new ByteArrayInputStream("payload".getBytes) }
    val p1 = DataRefResolver.cached(dir, "FT120201.zip")(open _)
    val p2 = DataRefResolver.cached(dir, "FT120201.zip")(open _)
    assert(p1 === p2)
    assert(opens === 1)
    assert(new String(Files.readAllBytes(p1)) === "payload")
  }

  test("a failing fetch never half-populates the cache") {
    val dir = Files.createTempDirectory("mirror2")
    def bad() = new java.io.InputStream {
      private var n = 0
      override def read(): Int =
        if (n < 3) { n += 1; 'x' } else throw new java.io.IOException("mid-stream")
    }
    intercept[java.io.IOException] {
      DataRefResolver.cached(dir, "FT120202.zip")(bad _)
    }
    assert(!Files.isRegularFile(dir.resolve("FT120202.zip")))
    // a later good fetch succeeds
    val ok = DataRefResolver.cached(dir, "FT120202.zip")(
      () => new ByteArrayInputStream("good".getBytes))
    assert(new String(Files.readAllBytes(ok)) === "good")
  }

  test("local resolver answers only for existing files") {
    val root = Files.createTempDirectory("archives")
    val resolver = DataRefResolver.localResolver(root.toString, "'FT'yyMMdd'.zip'")
    assert(resolver(day).isEmpty)
    Files.write(root.resolve("FT120201.zip"), "x".getBytes)
    assert(resolver(day).exists(_.endsWith("FT120201.zip")))
  }
}
