package graft.link

/** Runtime option surface mirroring the reference CLI controls we honor
  * (lib/nls_system.pl:150-329; SURVEY §2.8 F1/F4/F5, §2.3 A6):
  *
  * @param scoreThreshold  -r: keep candidates with score >= threshold
  * @param restrictSemTypes -J: keep only mentions with one of these types
  * @param excludeSemTypes  -k: drop mentions with any of these types
  * @param noNums           --no_nums: drop candidates whose matched string
  *                         is mostly digits
  * @param udas             --UDA: user-defined acronym -> expansion words,
  *                         merged over document-discovered AAs
  */
final case class LinkOptions(
    scoreThreshold: Int = 0,
    restrictSemTypes: Set[String] = Set.empty,
    excludeSemTypes: Set[String] = Set.empty,
    noNums: Boolean = false,
    udas: Map[String, Vector[String]] = Map.empty)

object LinkOptions {
  val default: LinkOptions = LinkOptions()
}
