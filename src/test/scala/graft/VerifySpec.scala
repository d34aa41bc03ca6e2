package graft

import org.scalatest.funsuite.AnyFunSuite

/** The oracle_sql.json escaping guards the whole round's correctness file
  * — a single bad byte makes the driver's json.load fail and zero every
  * query. Round-trip every oracle through a real JSON parser. */
class VerifySpec extends AnyFunSuite {

  test("jsonEscape: quotes, backslashes, newlines, tabs, control chars") {
    assert(Verify.jsonEscape("""a"b""") == """"a\"b"""")
    assert(Verify.jsonEscape("""a\b""") == """"a\\b"""")
    assert(Verify.jsonEscape("a\nb\tc\rd") == "\"a\\nb\\tc\\rd\"")
    assert(Verify.jsonEscape("xy") == "\"x\\u0001y\"")
    assert(Verify.jsonEscape("plain") == "\"plain\"")
  }

  test("every registered oracle survives a JSON round-trip") {
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${Verify.jsonEscape(k)}: ${Verify.jsonEscape(v)}" }
      .mkString("{", ",", "}")
    // parse with a real JSON parser (Jackson ships with Spark)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(json)
    assert(node.size() == SparkEntry.oracleSql.size)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      assert(node.get(k) != null, s"key $k lost in serialization")
      assert(node.get(k).asText() == v, s"oracle for $k corrupted")
    }
  }
}
