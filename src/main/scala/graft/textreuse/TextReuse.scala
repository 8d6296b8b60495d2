package graft.textreuse

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ids.Ids

/** The textreuse normalization chain: raw BLAST hits → integer-encoded
  * hits → unique pieces → piece-edge graph (SURVEY.md §1.4).
  *
  * Behavior matches the reference (citations per function) with two
  * deliberate, documented deviations (SURVEY.md §7.3/§7.4):
  *  - id-assignment ORDER BYs get a unique tie-break suffix so ids are
  *    deterministic across runs/partitionings (the reference's sorts can
  *    tie, making its ids run-dependent);
  *  - the anti-join idiom is `left_anti` (see analytics.Reception).
  */
object TextReuse {

  /** Distinct document names from both sides of every hit → TRS ids.
    * Split grammar (reference: raw_textreuses.py:149-171):
    * manifestation_id = text before the first '.'; structure_name = text
    * after the last '.', NULL when the name has no '.'.
    */
  def textreuseIds(raw: DataFrame): DataFrame = {
    val names = raw.select(col("text1_id").as("text_name"))
      .union(raw.select(col("text2_id").as("text_name")))
      .distinct()
    val split = names.select(
      col("text_name"),
      substring_index(col("text_name"), ".", 1).as("manifestation_id"),
      when(locate(".", col("text_name")) > 0,
        substring_index(col("text_name"), ".", -1)).as("structure_name"))
    Ids.zipWithRowId(
      split.orderBy(col("manifestation_id"), col("structure_name"), col("text_name")),
      "trs_id")
  }

  /** Hits with document names replaced by trs ids (reference:
    * raw_textreuses.py:188-208). Left joins keep hits whose name is
    * somehow unmapped (cannot happen by construction, preserved anyway).
    */
  def textreuses(raw: DataFrame, trsIds: DataFrame): DataFrame = {
    val t1 = trsIds.select(col("text_name").as("text1_id"), col("trs_id").as("trs1_id"))
    val t2 = trsIds.select(col("text_name").as("text2_id"), col("trs_id").as("trs2_id"))
    val mapped = raw
      .join(t1, Seq("text1_id"), "left")
      .join(t2, Seq("text2_id"), "left")
      .select(
        col("trs1_id"),
        col("text1_text_start").as("trs1_start"),
        col("text1_text_end").as("trs1_end"),
        col("trs2_id"),
        col("text2_text_start").as("trs2_start"),
        col("text2_text_end").as("trs2_end"),
        col("align_length"),
        col("positives_percent"))
    Ids.zipWithRowId(
      mapped.orderBy(col("trs1_id"), col("trs2_id"),
        col("trs1_start"), col("trs1_end"), col("trs2_start"), col("trs2_end")),
      "textreuse_id")
  }

  /** Unique (trs_id, start, end) intervals from both sides of every hit
    * (reference: orig_textreuses.py:14-38).
    */
  def origPieces(textreuses: DataFrame): DataFrame = {
    val sides = textreuses.select(
        col("trs1_id").as("trs_id"),
        col("trs1_start").as("trs_start"),
        col("trs1_end").as("trs_end"))
      .union(textreuses.select(
        col("trs2_id").as("trs_id"),
        col("trs2_start").as("trs_start"),
        col("trs2_end").as("trs_end")))
      .distinct()
    Ids.zipWithRowId(
      sides.orderBy(col("trs_id"), col("trs_start"), col("trs_end")),
      "piece_id")
  }

  /** Hits as edges between piece ids, via composite-key lookups
    * (reference: orig_textreuses.py:46-65, J4).
    */
  def origTextreuses(textreuses: DataFrame, origPieces: DataFrame): DataFrame = {
    val p1 = origPieces.select(
      col("trs_id").as("trs1_id"), col("trs_start").as("trs1_start"),
      col("trs_end").as("trs1_end"), col("piece_id").as("piece1_id"))
    val p2 = origPieces.select(
      col("trs_id").as("trs2_id"), col("trs_start").as("trs2_start"),
      col("trs_end").as("trs2_end"), col("piece_id").as("piece2_id"))
    textreuses
      .join(p1, Seq("trs1_id", "trs1_start", "trs1_end"), "left")
      .join(p2, Seq("trs2_id", "trs2_start", "trs2_end"), "left")
      .select("textreuse_id", "piece1_id", "piece2_id", "align_length", "positives_percent")
  }

  /** Per-document text lengths (reference: coverages.py:13-28). */
  def sourceLengths(rawTexts: DataFrame, trsIds: DataFrame): DataFrame =
    rawTexts
      .join(broadcast(trsIds.select(col("text_name"), col("trs_id"))),
        rawTexts("doc_id") === col("text_name"))
      .select(col("trs_id"), length(col("text")).as("text_length"))
}
