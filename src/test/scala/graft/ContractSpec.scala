package graft

import org.scalatest.funsuite.AnyFunSuite

/** CI check: the committed CONTRACT.md must match what the registry
  * actually contains (forked tests run from the project base directory). */
class ContractSpec extends AnyFunSuite {
  test("CONTRACT.md matches the registry") {
    val p = java.nio.file.Paths.get("CONTRACT.md")
    assert(java.nio.file.Files.exists(p), "CONTRACT.md missing — run `sbt \"runMain graft.tools.ContractTable\"`")
    val committed = java.nio.file.Files.readString(p)
    assert(committed == graft.tools.ContractTable.render,
      "CONTRACT.md is stale — regenerate with `sbt \"runMain graft.tools.ContractTable\"`")
  }

  test("every registry kind is a known value") {
    val known = Set("headline", "arm", "sketch")
    val bad = SparkEntry.registry.filterNot(r => known(r.kind))
    assert(bad.isEmpty, s"unknown kinds: ${bad.map(r => s"${r.name}=${r.kind}").mkString(", ")}")
  }

  test("every entry carries an oracle — the r11 zero-rows-only contract") {
    // Round 11 converted the three HLL/KLL sketch entries to bound-style
    // oracled arms (exact value hash-replayed + a within_bound flag that
    // flips the hash on an accuracy violation), so the registry now has
    // ZERO rows-only entries of any kind. A new sketch whose output is
    // engine-specific must follow the same conversion, not reopen the
    // rows-only hole; this gate makes that the default.
    assert(SparkEntry.registry.filter(_.kind == "sketch").isEmpty,
      "sketch-kind entries reappeared — convert to bound-style arm oracles")
    val rowsOnly = SparkEntry.registry.filter(_.oracle.isEmpty)
    assert(rowsOnly.isEmpty,
      s"rows-only entries: ${rowsOnly.map(_.name).mkString(", ")}")
  }
}
