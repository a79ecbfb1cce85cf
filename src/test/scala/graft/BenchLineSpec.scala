package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** Pins the bench's final-machine-line contract (r21 verdict, next-round
  * item 1): the LAST stdout line must be a COMPLETE JSON object that fits
  * inside the driver's ~2 KB tail — 12 consecutive BENCH artifacts carried
  * parsed:null because the full headline never could. The line must carry
  * every headline scalar, keep the SLOWEST queries under the byte budget,
  * and parse with a stock JSON reader (jackson ships with Spark).
  */
class BenchLineSpec extends AnyFunSuite {

  private val om = new ObjectMapper

  // a 107-query-shaped min map with realistic name lengths
  private def mins(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q_synthetic_operator_$i%03d", i * 0.003))

  test("compact line is complete JSON within budget, slowest queries first") {
    val line = Bench.compactLine(mins(107), Nil, "/root/testdata/sf0.1")
    assert(line.length <= 1250, s"line ${line.length} B exceeds budget")
    val node = om.readTree(line) // throws on malformed JSON
    assert(node.get("metric").asText == "total")
    assert(node.get("unit").asText == "sec")
    assert(node.get("sf").asText == "/root/testdata/sf0.1")
    assert(node.get("n_errors").asInt == 0)
    assert(node.get("queries_total").asInt == 107)
    val qs = node.get("queries")
    assert(qs.size == node.get("queries_in_line").asInt)
    assert(qs.size < 107, "107 entries cannot fit 1250 B — budget must bind")
    // the kept set is exactly the slowest ones: every kept value must be
    // >= every omitted value
    val keptNames = qs.fieldNames
    var minKept = Double.MaxValue
    while (keptNames.hasNext) {
      val v = qs.get(keptNames.next()).asDouble
      if (v < minKept) minKept = v
    }
    val omittedMax = mins(107).filterNot { case (k, _) => qs.has(k) }.map(_._2).max
    assert(minKept >= omittedMax, s"kept min $minKept < omitted max $omittedMax")
    // value is the TOTAL across all queries, not just the kept subset
    val expectedTotal = mins(107).map(_._2).sum
    assert(math.abs(node.get("value").asDouble - expectedTotal) < 1e-3)
  }

  test("error sample is bounded and messages truncated; scalars still parse") {
    val errs = (1 to 9).map(i => (s"q_fail_$i", "x" * 500 + "\n\"tail\""))
    val line = Bench.compactLine(mins(107), errs, "/root/testdata/sf0.01")
    assert(line.length <= 1250, "errors must squeeze out queries, not grow the line")
    val node = om.readTree(line)
    assert(node.get("n_errors").asInt == 9)
    assert(node.get("errors").size == 3)
    // messages are cut to 60 chars BEFORE escaping, so control chars in a
    // long message can never split the line
    node.get("errors").elements.forEachRemaining(e => assert(e.asText.length <= 60))
  }

  test("a small registry fits whole — nothing omitted") {
    val small = mins(12)
    val node = om.readTree(Bench.compactLine(small, Nil, "/tmp/sf"))
    assert(node.get("queries").size == 12)
    assert(node.get("queries_in_line").asInt == 12)
  }
}
