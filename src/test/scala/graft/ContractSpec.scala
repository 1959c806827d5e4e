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

  test("sketch-kind entries are exactly the no-oracle-by-nature set") {
    val sketches = SparkEntry.registry.filter(_.kind == "sketch").map(_.name).toSet
    assert(sketches == Set("a9_approx_distinct", "a11_approx_quantiles",
      "profile_orders_approx"))
    // sketches can never carry an oracle; arms and headlines without an
    // oracle must be deliberate (currently: none — ann_recall gained its
    // seeded-replay oracle in round 8)
    assert(SparkEntry.registry.filter(_.kind == "sketch").forall(_.oracle.isEmpty))
    val rowsOnlyNonSketch =
      SparkEntry.registry.filter(r => r.oracle.isEmpty && r.kind != "sketch")
    assert(rowsOnlyNonSketch.isEmpty,
      s"rows-only non-sketch entries: ${rowsOnlyNonSketch.map(_.name).mkString(", ")}")
  }
}
