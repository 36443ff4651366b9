package graft.text

import scala.collection.mutable.StringBuilder

/** HTML -> text extraction for Common-Crawl-style pages.
  *
  * Contract (BASELINE.json input_hint): extraction must be byte-identical
  * per url to the corpus `text` column. The rules below are the spec; the
  * corpus generator (graft.corpus.CorpusGen) emits html whose extraction
  * under these rules reproduces its `text` exactly, and the test suite
  * asserts it row-wise.
  *
  * Rules:
  *  - <script>/<style> elements are dropped whole;
  *  - block-level tags (title, p, div, li, h1-h6, br, tr) emit "\n"
  *    separators; other tags are removed;
  *  - the standard five entities plus &nbsp; and numeric &#NN; are decoded;
  *  - the result is folded to ASCII (utf8_to_ascii analogue,
  *    /root/reference/text/utf8_to_ascii.pl:36-1512) and control chars,
  *    tabs included, become spaces
  *    (/root/reference/lib/nls_strings.pl:1129-1156);
  *  - leading/trailing newlines are trimmed and runs of >1 newline
  *    collapse to one.
  */
object Extract {

  private val blockTags = Set(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "br", "tr", "table", "title", "blockquote", "section", "article")

  /** Fold one non-ASCII codepoint to its ASCII replacement. */
  def foldChar(c: Char): String = c match {
    case c if c < 128 => c.toString
    case 'é' | 'è' | 'ê' | 'ë' => "e"
    case 'É' | 'È' | 'Ê' | 'Ë' => "E"
    case 'à' | 'á' | 'â' | 'ä' | 'å' => "a"
    case 'À' | 'Á' | 'Â' | 'Ä' | 'Å' => "A"
    case 'î' | 'ï' | 'í' | 'ì' => "i"
    case 'ô' | 'ö' | 'ó' | 'ò' => "o"
    case 'û' | 'ü' | 'ú' | 'ù' => "u"
    case 'ñ' => "n"
    case 'ç' => "c"
    case '’' | '‘' => "'"
    case '“' | '”' => "\""
    case '–' | '—' => "-"
    case '×' => "x"
    case 'µ' => "u"
    case ' ' => " "
    case '…' => "..."
    case _ => " "
  }

  def asciiFold(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c >= 128) sb.append(foldChar(c))
      else if (c == '\t' || (c < ' ' && c != '\n')) sb.append(' ')
      else sb.append(c)
      i += 1
    }
    sb.toString
  }

  private def decodeEntities(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 8) {
          val ent = s.substring(i + 1, semi)
          val rep = ent match {
            case "amp" => "&"
            case "lt" => "<"
            case "gt" => ">"
            case "quot" => "\""
            case "apos" => "'"
            case "nbsp" => " "
            case e if e.startsWith("#") && e.drop(1).forall(_.isDigit) =>
              val cp = e.drop(1).toInt
              if (cp < 128) cp.toChar.toString else foldChar(cp.toChar)
            case _ => null
          }
          if (rep != null) { sb.append(rep); i = semi + 1 }
          else { sb.append(c); i += 1 }
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Extract visible text from html bytes (UTF-8). */
  def htmlToText(html: Array[Byte]): String =
    htmlToText(new String(html, java.nio.charset.StandardCharsets.UTF_8))

  def htmlToText(html: String): String = {
    val sb = new StringBuilder(html.length / 2)
    var i = 0
    val n = html.length
    var skipUntil: String = null // closing tag we are skipping to (script/style)
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = html.indexOf('>', i + 1)
        if (close < 0) { i = n } // malformed trailing tag: drop remainder
        else {
          val inner = html.substring(i + 1, close).trim
          val isEnd = inner.startsWith("/")
          val name = inner.stripPrefix("/").takeWhile(ch => ch.isLetterOrDigit).toLowerCase
          if (skipUntil != null) {
            if (isEnd && name == skipUntil) skipUntil = null
          } else if (!isEnd && (name == "script" || name == "style") && !inner.endsWith("/")) {
            skipUntil = name
          } else if (blockTags.contains(name)) {
            if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n') sb.append('\n')
          }
          i = close + 1
        }
      } else if (skipUntil != null) {
        i += 1
      } else {
        sb.append(c)
        i += 1
      }
    }
    val decoded = asciiFold(decodeEntities(sb.toString))
    // collapse newline runs, trim outer newlines/spaces around lines
    val lines = decoded.split('\n').map(_.trim).filter(_.nonEmpty)
    lines.mkString("\n")
  }
}
