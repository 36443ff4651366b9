package graft.text

/** Simple token ala the reference's tok/4 term
  * (/root/reference/text/text_object_tokens.pl:115-134).
  *
  * `typ` is one of: lc uc ic mc an nu pn ws xx.
  * Positions are TIPSTER-style 0-based char offsets: `start` is the index
  * of the first char, `end` the index just past the last char.
  */
final case class Tok(typ: String, text: String, lc: String, start: Int, end: Int) {
  def isWs: Boolean = typ == "ws"
  def isPunct: Boolean = typ == "pn"
  def isWord: Boolean = !isWs && !isPunct
}

/** A sentence span over a token stream (reference `sn` higher-order token,
  * text/text_objects.pl:411-590).
  */
final case class Sentence(sentNo: Int, start: Int, end: Int, toks: Vector[Tok])
