package graft.sources

import java.io.InputStream
import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.LocalDate
import java.time.format.DateTimeFormatter

/** Archive-reference resolution — the reference's ETL plumbing (SURVEY
  * §2 rows S5/S6), reproduced as driver-side utilities (they feed
  * paths INTO `spark.read`, they are not engine operators):
  *
  *  - first-success fallback composition over resolvers — the
  *    reference's `local <+> ftp` alternative
  *    (`marketdb-loader/.../loader/TradeLoader.scala:22-36`,
  *    `TradeResolver.scala:10-57`: a resolver answers `None` on 404 /
  *    IO error and the next one is consulted);
  *  - pattern-based day→path formatting, e.g. `'/F/'yyyy'/FT'yyMMdd'.zip'`
  *    (`TradeResolver.scala:28-36`; pattern value in
  *    `marketdb-loader/src/main/resources/config/rts_home_kestrel.scala`);
  *  - a local mirror cache that tees a remote stream to disk once and
  *    serves the file afterwards (`loader/DataRef.scala:33-65`, cache
  *    `:70-111`).
  */
object DataRefResolver {

  /** First-success over resolvers; a resolver returns None when it
    * cannot serve the day (missing file, failed HEAD, ...). */
  def resolve(day: LocalDate,
      resolvers: Seq[LocalDate => Option[String]]): Option[String] =
    resolvers.view.flatMap(r => r(day)).headOption

  /** Day → path via a java.time pattern with quoted literals
    * (C5 scalar surface; equivalent of the reference's Joda pattern). */
  def formatPath(pattern: String, day: LocalDate): String =
    DateTimeFormatter.ofPattern(pattern).format(day)

  /** Local-file resolver: Some(path) iff the formatted path exists. */
  def localResolver(rootDir: String, pattern: String): LocalDate => Option[String] =
    day => {
      val p = java.nio.file.Paths.get(rootDir, formatPath(pattern, day))
      if (Files.isRegularFile(p)) Some(p.toString) else None
    }

  /** Mirror cache: on miss, drain `open()` into `cacheDir/key` (via a
    * temp file + atomic move, so a failed fetch never half-populates
    * the cache); on hit, serve the cached file without calling
    * `open()`. */
  def cached(cacheDir: Path, key: String)(open: () => InputStream): Path = {
    val target = cacheDir.resolve(key)
    if (!Files.isRegularFile(target)) {
      Files.createDirectories(target.getParent)
      val tmp = Files.createTempFile(cacheDir, s".$key", ".part")
      val in = open()
      try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    }
    target
  }
}
