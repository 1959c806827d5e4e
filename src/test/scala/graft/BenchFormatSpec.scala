package graft

import org.scalatest.funsuite.AnyFunSuite

class BenchFormatSpec extends AnyFunSuite {

  test("bench JSON numbers are locale-independent (comma-decimal default locale)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY)
      assert(BenchFormat.sec(0.1234567) == "0.123")
      assert(BenchFormat.sec(1234.5) == "1234.500")
      // the f-interpolator under de_DE is what Bench must NOT do
      assert(f"${0.5}%.3f" == "0,500", "precondition: de_DE formats with comma")
      // a representative line assembles to valid JSON
      val line = s"""{"queries":{"q":${BenchFormat.sec(0.5)}},"value":${BenchFormat.sec(12.3)}}"""
      assert(line == """{"queries":{"q":0.500},"value":12.300}""")
    } finally java.util.Locale.setDefault(prev)
  }

  test("esc escapes quotes, backslashes and control chars") {
    assert(BenchFormat.esc("a\"b\\c\nd") == "a\\\"b\\\\c\\u000ad")
  }
}
