package graft.output

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** XML + fielded-MMI writers re-expressing the remaining reference
  * serialization surface (SURVEY §2.1 S4):
  *
  *  - MetaMap XML (skr/skr_xml.pl): MMOs -> MMO -> Utterances -> Utterance
  *    -> Mappings -> Candidate nesting, one XML document per url;
  *  - fielded MMI lines (mmi/mmi.pl:911-921):
  *    `UI|MMI|score|concept|CUI|[sts]|tuples`.
  *
  * Both are pure column algebra over the mention / MMI DataFrames
  * (concat/escape/aggregate — codegen'd, no UDFs), so serialization
  * scales with the same shuffle profile as the aggregation itself.
  */
object XmlOutput {

  /** XML entity escaping as column algebra (& first, then the brackets
    * and quote) — content round-trips instead of being mutilated.
    */
  private def xmlEscape(c: org.apache.spark.sql.Column) =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      c, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"), "\"", "&quot;")

  /** One row per url: `xml` column with the nested utterance/candidate
    * structure (shape per skr_xml.pl; content from the mention table).
    */
  def documentXml(mentions: DataFrame): DataFrame = {
    val cand = concat(
      lit("<Candidate><Score>"), col("score"),
      lit("</Score><CUI>"), col("cui"),
      lit("</CUI><SemTypes>"), concat_ws(",", col("semTypes")),
      lit("</SemTypes><Negated>"), col("negated").cast("int"),
      lit("</Negated><Span start=\""), col("start"),
      lit("\" len=\""), col("len"),
      lit("\"/><MatchedText>"), xmlEscape(col("text")),
      lit("</MatchedText></Candidate>"))
    val utt = mentions
      .groupBy(col("url"), col("sentNo"))
      .agg(concat_ws("", sort_array(collect_list(struct(col("start"), cand.as("x"))))
        .getField("x")).as("cands"))
      .select(col("url"), col("sentNo"),
        concat(lit("<Utterance number=\""), col("sentNo"), lit("\"><Mappings>"),
          col("cands"), lit("</Mappings></Utterance>")).as("uttXml"))
    utt.groupBy(col("url"))
      .agg(concat_ws("", sort_array(collect_list(struct(col("sentNo"), col("uttXml").as("x"))))
        .getField("x")).as("utts"))
      .select(col("url"),
        concat(lit("<MMO><Document id=\""), xmlEscape(col("url")),
          lit("\"/><Utterances>"),
          col("utts"), lit("</Utterances></MMO>")).as("xml"))
  }
}
