package graft.serving

/**
 * Minimal JSON string escaping shared by the serving endpoints
 * ([[RestServer]], [[RetrievalServer]]). Error bodies serialize exception
 * messages, and Spark exception text routinely carries newlines, tabs and
 * other control characters — RFC 8259 requires every char below 0x20 be
 * escaped or the body is malformed JSON and the client's parser (not the
 * user's eyes) sees the failure first.
 */
private[graft] object Json {

  /** Escape `s` for embedding inside a JSON string literal: backslash,
    * quote, the named control escapes, and `\u00XX` for the rest of the
    * C0 range. */
  def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\\' => sb.append("\\\\")
        case '"'  => sb.append("\\\"")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
