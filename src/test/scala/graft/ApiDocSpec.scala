package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.{ApiDoc, ApiIndex}

/** CI gate for the generated README API index (the ContractSpec pattern):
  * every indexed method must still resolve, every example must be a
  * registered query, and the committed README section must match a fresh
  * render — regenerate with `sbt "runMain graft.tools.ApiDoc"`. */
class ApiDocSpec extends AnyFunSuite {

  test("every ApiIndex entry resolves to a real method") {
    ApiIndex.entries.foreach { en =>
      val sig = ApiDoc.signatureOf(en.module, en.method)
      assert(sig.nonEmpty, s"${en.module}.${en.method}")
    }
  }

  test("every example is a registered query") {
    val names = SparkEntry.queries.keySet
    val bad = ApiIndex.entries.flatMap(_.example).filterNot(names)
    assert(bad.isEmpty, s"not registered: ${bad.mkString(", ")}")
  }

  test("README API-index section matches the registry (regenerate with ApiDoc)") {
    val readme = java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))
    assert(readme.contains(ApiDoc.startMarker), "README has no API index section")
    assert(readme.contains(ApiDoc.render),
      "README API index is stale — run: sbt \"runMain graft.tools.ApiDoc\"")
  }
}
