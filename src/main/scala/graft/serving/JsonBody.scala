package graft.serving

/** Minimal ANCHORED extraction of fields from POST bodies — one
  * tested implementation of the "bind to the key, scan its balanced
  * value" discipline, so the next endpoint cannot reintroduce the
  * pre-anchor bug class the r13 review wave closed (a bare
  * `indexOf('[')` after a substring match can land on a SIBLING
  * key's array — phantom values — or on nothing at all when the key
  * text appears inside a string value). Deliberately NOT a general
  * JSON parser: exactly the primitives the front door's small
  * protocol bodies need, loud (IllegalArgumentException → 400) on
  * malformed input. The full ReportingRequest grammar keeps its own
  * parser in `analyzer.request`.
  *
  * Reference shape: yahoo/maha's service layer binds request JSON
  * with Jackson; with zero-egress dependencies the equivalent here is
  * this scoped scanner plus the analyzer's recursive parser. */
object JsonBody {

  /** The [start, end] indexes of `key`'s balanced ARRAY value in
    * `body` (both pointing at the brackets), or None when the key is
    * absent. The key must be a TOP-LEVEL member of the body object —
    * a same-named key inside a nested object or array must not hijack
    * the span (a takedown body {"meta":{"vecIds":[9]},"vecIds":[1,2]}
    * must delete 1,2 — never 9). Bracket/brace characters inside
    * string literals are skipped (escape-aware), so a payload like
    * `["a[b"]` cannot unbalance the scan; a genuinely unbalanced
    * array is a loud error. */
  def arraySpan(body: String, key: String): Option[(Int, Int)] = {
    val token = "\"" + key + "\""
    var i = 0
    var depth = 0 // object/array nesting depth; top-level members sit at 1
    var inStr = false; var esc = false
    var strStart = -1
    var keyAt = -1 // index just past a matched top-level key token
    while (keyAt < 0 && i < body.length) {
      val c = body.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') {
          inStr = false
          // a top-level string that spells the key, followed by ':',
          // is the member we want
          if (depth == 1 && body.substring(strStart, i + 1) == token) {
            var j = i + 1
            while (j < body.length && body.charAt(j).isWhitespace) j += 1
            if (j < body.length && body.charAt(j) == ':') keyAt = j + 1
          }
        }
      } else c match {
        case '"' => inStr = true; strStart = i
        case '{' | '[' => depth += 1
        case '}' | ']' => depth -= 1
        case _ =>
      }
      i += 1
    }
    if (keyAt < 0) return None
    var o = keyAt
    while (o < body.length && body.charAt(o).isWhitespace) o += 1
    if (o >= body.length || body.charAt(o) != '[')
      throw new IllegalArgumentException(
        s"""malformed body: "$key" must be an array""")
    var d2 = 0; var k = o; var end = -1
    inStr = false; esc = false
    while (end < 0 && k < body.length) {
      val c = body.charAt(k)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else c match {
        case '"' => inStr = true
        case '[' => d2 += 1
        case ']' => d2 -= 1; if (d2 == 0) end = k
        case _ =>
      }
      k += 1
    }
    if (end < 0) throw new IllegalArgumentException(
      s"""malformed body: unbalanced "$key" array""")
    Some((o, end))
  }

  /** `key`'s value as an array of float arrays — the /index batch
    * search body `{"vecs":[[0.1,0.2],[...]]}`. Empty when the key is
    * absent; loud on unbalanced arrays or non-numeric components
    * (NumberFormatException → 400 at the endpoint). Inner arrays are
    * read ONLY from inside the anchored span, never from siblings —
    * and the span is validated STRUCTURALLY before the extraction
    * regex runs: a legitimate vecs value contains nothing but
    * brackets (depth exactly 2), numbers, commas and whitespace, so
    * objects (`[{"v":[1,2]}]` — the '{' hides the true nesting from a
    * bracket count), string literals (`"[3,4]"` — the regex would
    * extract it as a phantom query) and over-nesting (`[[[1,2]]]`)
    * are all loud errors, never silently-parsed queries (the
    * longArray flat-array discipline, extended). */
  def floatArrays(body: String, key: String): Seq[Seq[Float]] =
    arraySpan(body, key) match {
      case None => Seq.empty
      case Some((o, e)) =>
        var d = 0; var i = o
        while (i <= e) {
          val c = body.charAt(i)
          c match {
            case '[' =>
              d += 1
              if (d > 2) throw new IllegalArgumentException(
                s"""malformed body: "$key" must be a flat array of """ +
                  "number arrays (nesting too deep)")
            case ']' => d -= 1
            case _ if c == '{' || c == '}' || c == '"' =>
              throw new IllegalArgumentException(
                s"""malformed body: "$key" must contain only number """ +
                  s"arrays (found '$c')")
            case _ =>
              // depth 1 (between the outer brackets, outside every
              // inner array) admits only separators: a BARE component
              // there ({"vecs":[1,2,[3,4]]}) would be silently
              // dropped by the bracketed-group extraction below —
              // depth is exactly 2 or the shape is loudly wrong
              if (d == 1 && c != ',' && !c.isWhitespace)
                throw new IllegalArgumentException(
                  s"""malformed body: "$key" must nest every """ +
                    s"component in an inner array (found '$c' at " +
                    "the outer level)")
              // inside an inner array: numbers, signs, exponents —
              // component-level garbage is caught by toFloat below
          }
          i += 1
        }
        """\[([^\[\]]*)\]""".r
          .findAllMatchIn(body.substring(o + 1, e + 1))
          .map(_.group(1).split(',').toSeq
            .map(_.trim).filter(_.nonEmpty).map(_.toFloat))
          .toSeq
    }

  /** `key`'s array of LONG ids — `{"vecIds":[3,5,8]}`. Empty when
    * absent; loud on nesting (an ids array has no inner arrays) and
    * non-numeric entries. */
  def longArray(body: String, key: String): Seq[Long] =
    arraySpan(body, key) match {
      case None => Seq.empty
      case Some((o, e)) =>
        val inner = body.substring(o + 1, e)
        if (inner.contains('[')) throw new IllegalArgumentException(
          s"""malformed body: "$key" must be a flat array of ids""")
        inner.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong)
    }
}
