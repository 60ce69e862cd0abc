package graft.export

/** Minimal recursive-descent JSON parser producing the same JValue AST the
  * generators emit — enough to read back `neo4j_importer_model.json`
  * packages (no external dependencies available in this build). */
object JsonParser {

  final case class ParseError(msg: String, pos: Int) extends RuntimeException(s"$msg at $pos")

  def parse(input: String): JValue = {
    val p = new P(input)
    val v = p.value()
    p.ws()
    if (!p.eof) throw ParseError("trailing content", p.i)
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && (s(i) == ' ' || s(i) == '\n' || s(i) == '\r' || s(i) == '\t')) i += 1
    def expect(c: Char): Unit = {
      if (eof || s(i) != c) throw ParseError(s"expected '$c'", i)
      i += 1
    }

    def value(): JValue = {
      ws()
      if (eof) throw ParseError("unexpected end", i)
      s(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(string())
        case 't' => lit("true", JBool(true))
        case 'f' => lit("false", JBool(false))
        case 'n' => lit("null", JNull)
        case _   => number()
      }
    }

    private def lit(word: String, v: JValue): JValue = {
      if (!s.startsWith(word, i)) throw ParseError(s"expected $word", i)
      i += word.length
      v
    }

    private def obj(): JObj = {
      expect('{'); ws()
      val fields = scala.collection.mutable.ArrayBuffer.empty[(String, JValue)]
      if (!eof && s(i) == '}') { i += 1; return JObj(fields.toSeq) }
      var done = false
      while (!done) {
        ws()
        val k = string()
        ws(); expect(':')
        fields += k -> value()
        ws()
        if (!eof && s(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      JObj(fields.toSeq)
    }

    private def arr(): JArr = {
      expect('['); ws()
      val items = scala.collection.mutable.ArrayBuffer.empty[JValue]
      if (!eof && s(i) == ']') { i += 1; return JArr(items.toSeq) }
      var done = false
      while (!done) {
        items += value()
        ws()
        if (!eof && s(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      JArr(items.toSeq)
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          if (eof) throw ParseError("bad escape", i)
          s(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'n'  => sb += '\n'
            case 'r'  => sb += '\r'
            case 't'  => sb += '\t'
            case 'u'  =>
              if (i + 4 >= s.length) throw ParseError("bad unicode escape", i)
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => throw ParseError(s"bad escape \\$c", i)
          }
          i += 1
        } else { sb += s(i); i += 1 }
      }
      expect('"')
      sb.toString
    }

    private def number(): JNum = {
      val start = i
      if (!eof && (s(i) == '-' || s(i) == '+')) i += 1
      while (!eof && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' || s(i) == '-' || s(i) == '+')) i += 1
      if (i == start) throw ParseError("expected number", i)
      JNum(BigDecimal(s.substring(start, i)))
    }
  }

  /** Navigation helpers. */
  implicit final class JOps(private val v: JValue) extends AnyVal {
    def /(key: String): JValue = v match {
      case JObj(fs) => fs.collectFirst { case (k, fv) if k == key => fv }
        .getOrElse(throw ParseError(s"missing key $key", 0))
      case _ => throw ParseError(s"not an object for key $key", 0)
    }
    def items: Seq[JValue] = v match {
      case JArr(xs) => xs
      case _ => throw ParseError("not an array", 0)
    }
    def fields: Seq[(String, JValue)] = v match {
      case JObj(fs) => fs
      case _ => throw ParseError("not an object", 0)
    }
    def str: String = v match {
      case JStr(x) => x
      case _ => throw ParseError("not a string", 0)
    }
  }
}
