package graft.http

import scala.collection.mutable

/** Minimal JSON support for the two-endpoint API surface — the build
  * is offline (no new deps, build.sbt:5-11), and the reference's
  * payloads (reference: test/test_api.js throughout) need only
  * objects, arrays, strings, integers, booleans and null.
  */
object Json {

  sealed trait Value
  final case class JObj(fields: Map[String, Value]) extends Value
  final case class JArr(items: Vector[Value]) extends Value
  final case class JStr(s: String) extends Value
  final case class JNum(raw: String) extends Value {
    private def dec: BigDecimal = BigDecimal(raw)
    /** Whole-number check on the VALUE, not the lexical form — JS's
      * Number.isInteger accepts 1.0 and 1e2 (JSON floats that parse to
      * integers), and the reference validates with it (src/app.js:112).
      * Values outside Long range report non-integral; the reference
      * would accept then range-reject them — same 400 either way.
      */
    def isIntegral: Boolean = dec.isWhole && dec.isValidLong
    def toLong: Long = dec.toLongExact
  }
  final case class JBool(b: Boolean) extends Value
  case object JNull extends Value

  final case class ParseError(msg: String) extends RuntimeException(msg)

  /** Strict recursive-descent parser; throws [[ParseError]] on any
    * malformed input (Express's json() middleware likewise 400s).
    */
  def parse(input: String): Value = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    if (!p.atEnd) throw ParseError(s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def peek: Char =
      if (atEnd) throw ParseError("unexpected end of input") else s.charAt(pos)
    def next(): Char = { val c = peek; pos += 1; c }
    def expect(c: Char): Unit = {
      if (next() != c) throw ParseError(s"expected '$c' at ${pos - 1}")
    }
    def skipWs(): Unit = {
      while (!atEnd && (s.charAt(pos) == ' ' || s.charAt(pos) == '\t' ||
        s.charAt(pos) == '\n' || s.charAt(pos) == '\r')) pos += 1
    }

    def parseValue(): Value = {
      skipWs()
      peek match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case c if c == '-' || c.isDigit => parseNum()
        case c => throw ParseError(s"unexpected '$c' at $pos")
      }
    }

    private def literal(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) throw ParseError(s"bad literal at $pos")
      pos += lit.length
    }

    private def parseObj(): JObj = {
      expect('{'); skipWs()
      val fields = mutable.LinkedHashMap.empty[String, Value]
      if (peek == '}') { next() }
      else {
        var done = false
        while (!done) {
          skipWs()
          val k = parseString()
          skipWs(); expect(':')
          fields(k) = parseValue()
          skipWs()
          next() match {
            case ',' => ()
            case '}' => done = true
            case c => throw ParseError(s"expected ',' or '}' got '$c'")
          }
        }
      }
      JObj(fields.toMap)
    }

    private def parseArr(): JArr = {
      expect('['); skipWs()
      val items = Vector.newBuilder[Value]
      if (peek == ']') { next() }
      else {
        var done = false
        while (!done) {
          items += parseValue()
          skipWs()
          next() match {
            case ',' => ()
            case ']' => done = true
            case c => throw ParseError(s"expected ',' or ']' got '$c'")
          }
        }
      }
      JArr(items.result())
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      var done = false
      while (!done) {
        next() match {
          case '"' => done = true
          case '\\' => next() match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              val hex = s.substring(pos, math.min(pos + 4, s.length))
              // non-hex chars must surface as the documented ParseError,
              // not leak NumberFormatException from parseInt
              // ASCII hex only: Char.isDigit also accepts Unicode
              // digits (e.g. U+0660), which Integer.parseInt(16) then
              // parses — JSON (and JS's JSON.parse) rejects those
              if (hex.length < 4 ||
                !hex.forall(c => ('0' <= c && c <= '9') ||
                  ('a' <= c.toLower && c.toLower <= 'f')))
                throw ParseError("bad \\u escape")
              sb += Integer.parseInt(hex, 16).toChar
              pos += 4
            case c => throw ParseError(s"bad escape '\\$c'")
          }
          case c => sb += c
        }
      }
      sb.result()
    }

    private def parseNum(): JNum = {
      val start = pos
      if (peek == '-') next()
      while (!atEnd && (s.charAt(pos).isDigit || "+-.eE".contains(s.charAt(pos))))
        pos += 1
      val raw = s.substring(start, pos)
      // enforce the JSON number grammar — the greedy scan above accepts
      // digit/sign/dot soup like "1..2" that Express's parser 400s
      if (!Parser.NumberGrammar.matcher(raw).matches())
        throw ParseError(s"bad number '$raw' at $start")
      JNum(raw)
    }
  }

  private object Parser {
    // compiled once: parseNum runs per numeric token on the request path
    val NumberGrammar: java.util.regex.Pattern = java.util.regex.Pattern
      .compile("-?(0|[1-9][0-9]*)(\\.[0-9]+)?([eE][+-]?[0-9]+)?")
  }

  // ---------------------------------------------------------- writer
  def escape(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    (sb += '"').result()
  }

  def obj(fields: (String, String)*): String =
    fields.map { case (k, v) => s"${escape(k)}: $v" }
      .mkString("{ ", ", ", " }")

  def arr(items: Seq[String]): String = items.mkString("[", ", ", "]")
}
