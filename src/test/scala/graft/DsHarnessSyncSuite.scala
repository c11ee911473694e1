package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Drift tripwire between `tools/ds_harness.py` (the DuckDB-first authoring
  * harness) and `graft.queries.DsOfficial` (the shipped battery): the
  * battery's oracle-exact claim rests on the harness validating the SAME
  * texts in DuckDB, so a one-sided edit must fail loudly, not silently
  * invalidate the validation. Compares the assembled PREFIX + Q[body] from
  * the Python source against every DsOfficial entry's oracle SQL,
  * whitespace-normalized, in both directions.
  */
class DsHarnessSyncSuite extends AnyFunSuite {

  private def norm(s: String): String = s.replaceAll("\\s+", " ").trim

  private lazy val py: String = {
    // the suite runs from the repo root under sbt; fall back to the
    // absolute layout the build uses
    val candidates = Seq("tools/ds_harness.py", "/root/repo/tools/ds_harness.py")
    val p = candidates.map(Paths.get(_)).find(Files.exists(_))
      .getOrElse(fail("tools/ds_harness.py not found"))
    new String(Files.readAllBytes(p), UTF_8)
  }

  private lazy val pyPrefix: String = {
    val re = """(?s)\nPREFIX = \"\"\"(.*?)\"\"\"""".r
    re.findFirstMatchIn(py).map(_.group(1))
      .getOrElse(fail("PREFIX triple-quoted literal not found in harness"))
  }

  private lazy val pyBodies: Map[String, String] = {
    val re = """(?s)Q\['(\w+)'\] = \"\"\"(.*?)\"\"\"""".r
    re.findAllMatchIn(py).map(m => m.group(1) -> m.group(2)).toMap
  }

  private lazy val scalaTexts: Map[String, String] =
    graft.queries.DsOfficial.entries.map { e =>
      // q248_ds_q1 -> ds_q1 (the harness's Q[...] key)
      val key = e.name.dropWhile(_ != '_').drop(1)
      key -> e.oracle.getOrElse(fail(s"${e.name} has no oracle SQL"))
    }.toMap

  test("every DsOfficial entry text matches the harness byte-for-byte " +
    "(modulo whitespace)") {
    scalaTexts.foreach { case (key, sql) =>
      val body = pyBodies.getOrElse(key,
        fail(s"$key present in DsOfficial but missing from ds_harness.py"))
      assert(norm(sql) == norm(pyPrefix + body),
        s"text drift for $key: edit BOTH tools/ds_harness.py and " +
          "DsOfficial.scala (DuckDB-first, then regenerate the Scala)")
    }
  }

  test("every harness query is shipped in DsOfficial") {
    val missing = pyBodies.keySet -- scalaTexts.keySet
    assert(missing.isEmpty,
      s"harness-only queries (validated but not shipped): $missing")
  }
}
