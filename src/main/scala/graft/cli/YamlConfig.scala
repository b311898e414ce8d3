package graft.cli

/** Minimal flat-YAML reader for the CLI config file — the subset the
  * reference's config surface actually uses (main/main.go:567 loads the
  * file through altsrc, whose yaml keys are the flag names):
  *
  * {{{
  * # comment
  * slot: my_slot
  * workers: 4
  * create-slot: true
  * whitelist:
  *   - public.users
  *   - public.orders
  * blacklist-regex: [^public\.tmp_.*$, ^public\.scratch$]
  * }}}
  *
  * Supported: `key: scalar`, `key:` + indented `- item` block lists,
  * `key: [a, b]` inline lists, single/double-quoted scalars, `#`
  * comments. Anything nested or multi-document is rejected with a
  * line-numbered error — config typos should fail loudly, not be
  * ignored.
  */
object YamlConfig {

  /** Ordered (key → values) pairs; scalars arrive as a single-element
    * list. Later duplicate keys override earlier ones at the applier.
    */
  def parse(text: String): Either[String, Seq[(String, Seq[String])]] = {
    val out = Vector.newBuilder[(String, Seq[String])]
    var pendingKey: Option[String] = None
    var pendingLine = 0
    var pendingItems = Vector.empty[String]

    def flush(): Either[String, Unit] = pendingKey match {
      case Some(k) if pendingItems.isEmpty =>
        Left(s"line $pendingLine: key '$k' has no value")
      case Some(k) =>
        out += k -> pendingItems; pendingKey = None; pendingItems = Vector.empty
        Right(())
      case None => Right(())
    }

    val lines = text.linesIterator.zipWithIndex
    for ((raw, idx) <- lines) {
      val lineNo = idx + 1
      val line = stripComment(raw).trim
      if (line.isEmpty) {
        // blank/comment: allowed anywhere, including inside a block list
      } else if (line == "---") {
        if (out.result().nonEmpty || pendingKey.isDefined)
          return Left(s"line $lineNo: multi-document YAML is not supported")
      } else if (line.startsWith("-")) {
        if (pendingKey.isEmpty)
          return Left(s"line $lineNo: list item without a preceding 'key:' line")
        val item = unquote(line.drop(1).trim)
        if (item.isEmpty) return Left(s"line $lineNo: empty list item")
        pendingItems :+= item
      } else {
        flush() match { case Left(e) => return Left(e); case Right(_) => () }
        val ci = line.indexOf(':')
        if (ci <= 0) return Left(s"line $lineNo: expected 'key: value'")
        val key = line.substring(0, ci).trim
        val value = line.substring(ci + 1).trim
        if (key.isEmpty || key.exists(_.isWhitespace))
          return Left(s"line $lineNo: bad key '$key' (nested YAML is not supported)")
        if (value.isEmpty) {
          pendingKey = Some(key); pendingLine = lineNo
        } else if (value.startsWith("[")) {
          if (!value.endsWith("]")) return Left(s"line $lineNo: unterminated inline list")
          splitInline(value.substring(1, value.length - 1)) match {
            case Left(err)    => return Left(s"line $lineNo: $err")
            case Right(items) => out += key -> items.map(unquote).filter(_.nonEmpty)
          }
        } else {
          out += key -> Vector(unquote(value))
        }
      }
    }
    flush() match { case Left(e) => return Left(e); case Right(_) => () }
    Right(out.result())
  }

  /** Split an inline list body on commas OUTSIDE quotes, so quoted
    * items containing commas (regex quantifiers like `'^tmp_{1,3}$'`
    * are the common case) survive as one item.
    */
  private def splitInline(body: String): Either[String, Vector[String]] = {
    val items = Vector.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < body.length) {
      val ch = body.charAt(i)
      if (quote != 0) {
        if (ch == quote) quote = 0
        cur.append(ch)
      } else ch match {
        case '"' | '\'' => quote = ch; cur.append(ch)
        case ','        => items += cur.result().trim; cur.clear()
        case _          => cur.append(ch)
      }
      i += 1
    }
    if (quote != 0) Left(s"unterminated $quote-quote in inline list")
    else { items += cur.result().trim; Right(items.result()) }
  }

  /** Cut a trailing comment: `#` at line start, or ` #` outside quotes. */
  private def stripComment(line: String): String = {
    if (line.trim.startsWith("#")) return ""
    var quote: Char = 0
    var i = 0
    while (i < line.length) {
      val ch = line.charAt(i)
      if (quote != 0) { if (ch == quote) quote = 0 }
      else if (ch == '"' || ch == '\'') quote = ch
      else if (ch == '#' && i > 0 && line.charAt(i - 1).isWhitespace)
        return line.substring(0, i)
      i += 1
    }
    line
  }

  private def unquote(s: String): String =
    if (s.length >= 2 &&
      ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
