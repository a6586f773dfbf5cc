package graft.http

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

class JsonSpec extends AnyFunSuite {

  test("parses the reference payload shapes") {
    val v = Json.parse("""{"ids": [1, 2, 3], "priority": "HIGH"}""")
    val obj = v.asInstanceOf[Json.JObj]
    assert(obj.fields("ids").asInstanceOf[Json.JArr].items.map {
      case n: Json.JNum => n.toLong
      case other => fail(s"unexpected $other")
    } == Vector(1L, 2L, 3L))
    assert(obj.fields("priority") == Json.JStr("HIGH"))
  }

  test("rejects malformed documents with ParseError, never other exceptions") {
    val bad = Seq("", "{", "[1,", """{"a": }""", """{"a": 1..2}""",
      """{"a": 01}""", """{"a": -}""", """{"a": 1e}""", "tru", "nul",
      """{"a" 1}""", """{1: 2}""", """{"a": 1} trailing""",
      "\"unterminated", """{"a": "\q"}""")
    bad.foreach { s =>
      assertThrows[Json.ParseError](Json.parse(s))
    }
  }

  test("random byte soup never escapes as a non-ParseError crash") {
    val rnd = new Random(1234)
    for (_ <- 1 to 2000) {
      val s = rnd.alphanumeric.take(rnd.nextInt(30)).mkString
        .flatMap(c => if (rnd.nextBoolean()) s"$c" else s"${"{}[]\",:".charAt(rnd.nextInt(7))}")
      try { Json.parse(s); () }
      catch { case _: Json.ParseError => () } // only this is allowed
    }
  }

  test("writer escapes are parsed back verbatim (round trip)") {
    val nasty = Seq("plain", "with \"quotes\"", "back\\slash",
      "line\nbreak", "tab\there", "ctrlchar", "uni 你好")
    nasty.foreach { s =>
      val rendered = Json.obj("k" -> Json.escape(s))
      val back = Json.parse(rendered).asInstanceOf[Json.JObj]
      assert(back.fields("k") == Json.JStr(s), s"round trip of $s")
    }
  }

  test("number grammar accepts valid JSON numbers") {
    val ok = Seq("0", "-0", "42", "-17", "3.14", "0.5", "1e6", "1E-6",
      "2.5e+10")
    ok.foreach { n =>
      val v = Json.parse(s"""{"x": $n}""").asInstanceOf[Json.JObj]
      assert(v.fields("x").isInstanceOf[Json.JNum])
    }
  }

  test("isIntegral follows JS Number.isInteger value semantics") {
    def num(raw: String): Json.JNum =
      Json.parse(s"""{"x": $raw}""").asInstanceOf[Json.JObj]
        .fields("x").asInstanceOf[Json.JNum]
    // integral VALUES, whatever the lexical form
    Seq("1" -> 1L, "1.0" -> 1L, "1e2" -> 100L, "-3.000" -> -3L,
      "2.5e+1" -> 25L).foreach { case (raw, want) =>
      assert(num(raw).isIntegral, raw)
      assert(num(raw).toLong == want, raw)
    }
    // fractional or beyond-Long values are not
    Seq("1.5", "0.1", "1e-2", "1e20").foreach { raw =>
      assert(!num(raw).isIntegral, raw)
    }
  }

  test("\\u escape with non-hex chars is ParseError, not NumberFormatException") {
    assertThrows[Json.ParseError](Json.parse("\"\\uzzzz\""))
    assertThrows[Json.ParseError](Json.parse("\"\\u12g4\""))
    assertThrows[Json.ParseError](Json.parse("\"\\u12\""))
    assert(Json.parse("\"\\u0041\"") == Json.JStr("A"))
    assert(Json.parse("\"\\u00E9\"") == Json.JStr("é"))
    // Unicode digits are NOT hex: Char.isDigit would accept U+0660
    // (and parseInt(16) parses it) but JSON requires ASCII hex
    assertThrows[Json.ParseError](Json.parse("\"\\u\u0660\u0660\u0034\u0031\""))
  }
}
