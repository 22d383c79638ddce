package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Guards the type-exact oracle gate ITSELF: `tools/check.py --selftest`
  * plants a seeded engine-drift case (DuckDB window-sum HUGEINT vs
  * Spark BIGINT with EQUAL values) and asserts the comparator still
  * flags it. The gate's whole value is that it hashes dtype + value; a
  * comparator refactor that drops the dtype would turn every future
  * type drift invisible while all rows stay "green" — this spec makes
  * that rot a test failure instead. (VERDICT r8 item 7.)
  */
class CheckSelftestSpec extends AnyFunSuite {

  test("tools/check.py --selftest catches seeded type drift") {
    val script = new java.io.File("tools/check.py")
    assert(script.isFile,
      s"tools/check.py not found from test cwd ${new java.io.File(".").getCanonicalPath}")
    val pb = new ProcessBuilder("python3", script.getPath, "--selftest")
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val exit = p.waitFor()
    assert(exit == 0 && out.contains("selftest PASS"),
      s"check.py --selftest failed (exit $exit):\n$out")
  }
}
