package graft.umls

/** Word-level trie — the broadcast Aho-Corasick-style matcher of the
  * north_star: built ONCE on the driver, shipped inside the broadcast
  * table set, walked per position on executors. A probe costs at most the
  * longest dictionary entry, independent of dictionary size, and builds
  * no substrings (the previous formulation constructed O(n^2) candidate
  * strings per phrase to hash-probe).
  *
  * Used for multiword lexicon forms (variant generators, SURVEY §2.5 V1)
  * and NegEx trigger phrases (§2.11 N1) — the same machinery the
  * reference's longest-match lexicon scan needs (SURVEY §2.4 P2).
  */
final class WordTrie private[umls] (
    private val children: Map[String, WordTrie],
    val terminal: Boolean) extends Serializable {

  def step(w: String): Option[WordTrie] = children.get(w)

  /** Word-lengths of all dictionary entries starting at `words(i)`,
    * LONGEST FIRST; entries shorter than `minLen` are skipped.
    */
  def matchesAt(words: IndexedSeq[String], i: Int, minLen: Int = 1): List[Int] = {
    var node = this
    var k = i
    var out = List.empty[Int]
    var continue = true
    while (continue && k < words.length) {
      node.step(words(k)) match {
        case Some(n) =>
          k += 1
          if (n.terminal && k - i >= minLen) out = (k - i) :: out
          node = n
        case None => continue = false
      }
    }
    out
  }
}

object WordTrie {
  val empty: WordTrie = new WordTrie(Map.empty, terminal = false)

  def build(forms: Iterable[Seq[String]]): WordTrie = {
    val nonEmpty = forms.filter(_ != null)
    val terminal = nonEmpty.exists(_.isEmpty)
    val children = nonEmpty.filter(_.nonEmpty).groupBy(_.head)
      .map { case (w, fs) => w -> build(fs.map(_.tail)) }
    new WordTrie(children, terminal)
  }
}
