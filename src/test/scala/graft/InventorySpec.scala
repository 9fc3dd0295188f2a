package graft

import org.scalatest.funsuite.AnyFunSuite

/** The declared inventory (SURVEY.md §2.3 tables) and the shipped registry
  * must match name-for-name: a registry entry with no SURVEY row is an
  * undeclared capability, a SURVEY row with no registry entry is an
  * unimplemented claim — both are coverage-audit findings. Every query must
  * also carry an oracle, except the single sanctioned rows-only debug twin
  * (CLAUDE.md).
  */
class InventorySpec extends AnyFunSuite {

  private lazy val declared: Set[String] = {
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    try "`(q_[a-z0-9_]+)`".r.findAllMatchIn(survey.mkString)
      .map(_.group(1)).toSet
    finally survey.close()
  }

  test("every registered query is declared in SURVEY.md") {
    val missing = SparkEntry.registry.keySet -- declared
    assert(missing.isEmpty, s"undeclared queries: ${missing.toSeq.sorted}")
  }

  test("every SURVEY.md query name is registered") {
    val missing = declared -- SparkEntry.registry.keySet
    assert(missing.isEmpty, s"unimplemented claims: ${missing.toSeq.sorted}")
  }

  test("every query carries an oracle except the sanctioned debug twin") {
    val unoracled = SparkEntry.registry.collect {
      case (name, GQuery(_, None, _)) => name
    }.toSet
    assert(unoracled == Set("q_agg_approx_debug"),
      s"rows-only queries beyond the sanctioned twin: ${unoracled.toSeq.sorted}")
  }
}
