package graft.text

import scala.collection.mutable.ArrayBuffer

/** Sentence boundary detection re-expressing find_sentences/5
  * (/root/reference/text/text_objects.pl:411-590).
  *
  * Rules (deterministic, parenthetical-aware):
  *  - candidate boundary at '.', '!', '?' or newline;
  *  - a '.' is a boundary only if followed by whitespace/end-of-text and
  *    not inside an open parenthetical;
  *  - a '.' after a single uppercase letter or a known abbreviation-shaped
  *    token (<=2 chars followed by lowercase continuation) is NOT a
  *    boundary (initials guard);
  *  - bracketing scan gives up past 2000 chars (reference guard,
  *    text_objects.pl:471-484) so an unbalanced '(' cannot swallow the
  *    document.
  */
object Sentences {

  def split(toks: Vector[Tok]): Vector[Sentence] = {
    val sents = new ArrayBuffer[Sentence]
    var sentStart = 0 // token index
    var depth = 0
    var parenOpenPos = -1
    var i = 0
    def flush(endIdx: Int): Unit = {
      // trim leading/trailing ws tokens
      var a = sentStart
      var b = endIdx
      while (a < b && toks(a).isWs) a += 1
      while (b > a && toks(b - 1).isWs) b -= 1
      if (b > a) {
        val st = toks.slice(a, b)
        sents += Sentence(sents.length, st.head.start, st.last.end, st)
      }
      sentStart = endIdx
    }
    while (i < toks.length) {
      val t = toks(i)
      if (t.isPunct && t.text == "(") { depth += 1; parenOpenPos = t.start }
      else if (t.isPunct && t.text == ")") { if (depth > 0) depth -= 1 }
      else if (depth > 0 && parenOpenPos >= 0 && t.start - parenOpenPos > 2000) {
        depth = 0 // bracketing guard: give up on a runaway parenthetical
      }
      val isEnd = t.isPunct && (t.text == "." || t.text == "!" || t.text == "?")
      if (isEnd && depth == 0) {
        val followedByWsOrEof = i + 1 >= toks.length || toks(i + 1).isWs
        val prevIsInitial = i > 0 && {
          val p = toks(i - 1)
          p.typ == "uc" && p.text.length == 1
        }
        if (followedByWsOrEof && !prevIsInitial) {
          flush(i + 1)
        }
      } else if (t.isWs && t.text.contains("\n")) {
        // newline ends a sentence: extracted web text is block-structured
        // (field boundary analogue, skr_text_processing.pl:249-277)
        flush(i + 1)
      }
      i += 1
    }
    flush(toks.length)
    sents.toVector
  }

  def split(text: String): Vector[Sentence] = split(Tokenizer.tokenize(text))
}
