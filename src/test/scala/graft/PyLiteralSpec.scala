package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.JsonNodeFactory
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.parse.PyLiteral

/** Unit + property coverage of the Python-literal → JSON converter
  * (SURVEY.md §5.3: "round-trip arbitrary records incl. apostrophes/None/
  * unicode" — the highest-risk component). Property cases are driven from
  * ScalaCheck generators with fixed seeds (no scalatest bridge in the
  * offline cache). */
class PyLiteralSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper
  private def js(s: String) = mapper.readTree(s)

  private def conv(s: String): String = PyLiteral.toJson(s)

  test("the reference's real cell shapes") {
    assert(js(conv("[{'id': 16, 'name': 'Animation'}]"))
      == js("""[{"id":16,"name":"Animation"}]"""))
    assert(js(conv("{'id': 10, 'name': 'Star Wars Collection'}"))
      == js("""{"id":10,"name":"Star Wars Collection"}"""))
    assert(js(conv("[{'iso_639_1': 'en', 'name': 'English'}]"))
      == js("""[{"iso_639_1":"en","name":"English"}]"""))
    assert(js(conv("[]")) == js("[]"))
    assert(js(conv("{}")) == js("{}"))
  }

  test("apostrophes, escapes, unicode") {
    assert(js(conv("""[{'name': "Miller's Crossing"}]"""))
      == js("""[{"name":"Miller's Crossing"}]"""))
    assert(js(conv("""[{'name': 'Miller\'s Crossing'}]"""))
      == js("""[{"name":"Miller's Crossing"}]"""))
    assert(js(conv("'caf\\xe9'")) == js("\"café\""))
    assert(js(conv("'\\u00e9\\n\\t'")) == js("\"é\\n\\t\""))
    assert(js(conv("'\\U0001F600'")) == js("\"😀\""))
    assert(js(conv("'Français'")) == js("\"Français\""))
    // unknown escape stays verbatim, like non-raw Python
    assert(js(conv("'a\\qb'")) == js("\"a\\\\qb\""))
    // raw string keeps the backslash
    assert(js(conv("r'a\\nb'")) == js("\"a\\\\nb\""))
  }

  test("None / True / False / numbers") {
    assert(js(conv("[None, True, False]")) == js("[null,true,false]"))
    assert(js(conv("[+5, -3, .5, 5., 1e3, 1.5E-2]"))
      == js("[5,-3,0.5,5.0,1e3,1.5e-2]"))
  }

  test("tuples and sets become arrays; non-string keys stringify") {
    assert(js(conv("(1, 2)")) == js("[1,2]"))
    assert(js(conv("(1,)")) == js("[1]"))
    assert(js(conv("{1, 2}")) == js("[1,2]"))
    assert(js(conv("{1: 'a', None: 'b'}")) == js("""{"1":"a","null":"b"}"""))
  }

  test("trailing commas") {
    assert(js(conv("[1, 2,]")) == js("[1,2]"))
    assert(js(conv("{'a': 1,}")) == js("""{"a":1}"""))
  }

  test("adversarial depth degrades to null, wide flat lists still parse") {
    val deep = "[" * 10000 + "]" * 10000
    assert(conv(deep) == null) // depth cap, not a StackOverflowError
    val wide = (1 to 5000).mkString("[", ", ", "]")
    assert(conv(wide) != null) // siblings don't count as depth
  }

  test("malformed input returns null (skip-and-continue)") {
    for (bad <- Seq("", "  ", "[1, 2", "{'a': }", "{'a' 1}", "nan", "'abc",
        "[1] trailing", "{'a': 1}}", "TrueX"))
      assert(conv(bad) == null, s"input: $bad")
    assert(conv(null) == null)
  }

  // ---- property: round-trip arbitrary literal trees ----------------------

  private sealed trait PV
  private case object PNone extends PV
  private final case class PBool(b: Boolean) extends PV
  private final case class PInt(v: Long) extends PV
  private final case class PStr(s: String) extends PV
  private final case class PList(xs: List[PV]) extends PV
  private final case class PDict(m: List[(String, PV)]) extends PV

  private val genStr: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\'', '"', '\\', ' ', '\n', '\t', 'é', 'ß', '中'),
  )).map(_.mkString)

  private def genPV(depth: Int): Gen[PV] =
    if (depth <= 0)
      Gen.oneOf(
        Gen.const(PNone), Arbitrary.arbitrary[Boolean].map(PBool),
        Arbitrary.arbitrary[Long].map(PInt), genStr.map(PStr))
    else
      Gen.frequency(
        3 -> genPV(0),
        1 -> Gen.listOfN(3, genPV(depth - 1)).map(PList),
        1 -> Gen.listOfN(3, Gen.zip(genStr, genPV(depth - 1)))
          .map(kvs => PDict(kvs.distinctBy(_._1))))

  /** Python-repr-style rendering (single quotes, \x escapes). */
  private def pyRepr(v: PV): String = v match {
    case PNone => "None"
    case PBool(b) => if (b) "True" else "False"
    case PInt(n) => n.toString
    case PStr(s) => "'" + s.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case c if c < ' ' => f"\\x${c.toInt}%02x"
      case c => c.toString
    } + "'"
    case PList(xs) => xs.map(pyRepr).mkString("[", ", ", "]")
    case PDict(m) =>
      m.map { case (k, x) => pyRepr(PStr(k)) + ": " + pyRepr(x) }
        .mkString("{", ", ", "}")
  }

  private def toJackson(v: PV): com.fasterxml.jackson.databind.JsonNode = {
    val f = JsonNodeFactory.instance
    v match {
      case PNone => f.nullNode()
      case PBool(b) => f.booleanNode(b)
      case PInt(n) => f.numberNode(n)
      case PStr(s) => f.textNode(s)
      case PList(xs) =>
        val a = f.arrayNode(); xs.foreach(x => a.add(toJackson(x))); a
      case PDict(m) =>
        val o = f.objectNode()
        m.foreach { case (k, x) =>
          o.set[com.fasterxml.jackson.databind.JsonNode](k, toJackson(x))
        }
        o
    }
  }

  test("property: arbitrary literal trees round-trip (500 cases)") {
    val gen = genPV(3)
    (0 until 500).foreach { i =>
      val v = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      val out = conv(pyRepr(v))
      assert(out != null, s"failed to parse: ${pyRepr(v)}")
      // serialize+reparse the expected tree so LongNode(-1) and IntNode(-1)
      // normalize to the same node type before comparing
      val expected = js(mapper.writeValueAsString(toJackson(v)))
      assert(js(out) == expected, s"input: ${pyRepr(v)}")
    }
  }
}
