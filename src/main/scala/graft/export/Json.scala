package graft.export

/** Minimal ordered JSON AST + renderer for the importer model files.
  * Field order is insertion order (the reference relies on Python dict
  * ordering); rendering matches `json.dump(indent=2)` closely enough for
  * structural diffing.
  */
sealed trait JValue {
  def render(indent: Int = 0): String = JValue.render(this, indent)
}
final case class JObj(fields: Seq[(String, JValue)]) extends JValue
final case class JArr(items: Seq[JValue]) extends JValue
final case class JStr(s: String) extends JValue
final case class JNum(n: BigDecimal) extends JValue
final case class JBool(b: Boolean) extends JValue
case object JNull extends JValue

object JValue {
  def apply(s: String): JValue = JStr(s)
  def apply(n: Int): JValue = JNum(BigDecimal(n))
  def apply(n: Long): JValue = JNum(BigDecimal(n))
  def apply(b: Boolean): JValue = JBool(b)
  def ref(id: String): JObj = JObj(Seq("$ref" -> JStr(s"#$id")))

  private def escape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def render(v: JValue, indent: Int): String = {
    val pad = "  " * indent
    val childPad = "  " * (indent + 1)
    v match {
      case JNull => "null"
      case JBool(b) => b.toString
      case JNum(n) => n.bigDecimal.stripTrailingZeros.toPlainString
      case JStr(s) => "\"" + escape(s) + "\""
      case JArr(Seq()) => "[]"
      case JArr(items) =>
        items.map(i => childPad + render(i, indent + 1)).mkString("[\n", ",\n", s"\n$pad]")
      case JObj(Seq()) => "{}"
      case JObj(fields) =>
        fields.map { case (k, fv) => s"""$childPad"${escape(k)}": ${render(fv, indent + 1)}""" }
          .mkString("{\n", ",\n", s"\n$pad}")
    }
  }
}
