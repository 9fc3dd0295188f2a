package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the hardened t2 gate's RAISE paths (VERDICT r10 item 2 / r11
  * "What's wrong" 1): tools/check_oracles.py must FAIL a dump containing a
  * DECIMAL output column (even when the oracle twin is decimal too — types
  * and values equal) and a type-drifted column (equal values, different
  * arrow types), while a clean control stays OK. The fixture itself lives
  * in tools/test_gate_negative.py so it can also run standalone; this spec
  * keeps it inside the default `sbt test` so a gate regression cannot land
  * silently.
  */
class GateNegativeSpec extends AnyFunSuite {

  test("check_oracles gate fails decimal outputs and type drift, passes clean control") {
    val script = new java.io.File("tools/test_gate_negative.py")
    assert(script.exists(), s"missing ${script.getAbsolutePath}")
    val pb = new ProcessBuilder("python3", script.getPath)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0, s"negative fixture failed (exit $code):\n$out")
    assert(out.contains("GATE NEGATIVE FIXTURE: ok"), out)
  }
}
