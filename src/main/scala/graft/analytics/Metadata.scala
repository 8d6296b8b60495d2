package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Author/actor metadata assets (reference:
  * etl_textreuse/assets/actors_and_authors.py:11-55): dictionary-encoded
  * actors and the per-edition author table.
  *
  * Scale notes: all inputs are metadata-cardinality (editions/actors,
  * orders of magnitude below pieces) — joins here broadcast; the output
  * `edition_authors` is itself the broadcast side of every downstream
  * reception-statistics join.
  */
object Metadata {

  /** The actors of each edition that hold the AUTHOR role (reference:
    * actors_and_authors.py:47-51). The role restriction is part of the
    * LEFT join condition — a mixed equi+constant predicate (J5), NOT a
    * pre-filter, so editions whose only links are non-author roles stay
    * present with a NULL author (downstream statistics treat "no author"
    * distinctly from "different author").
    *
    * @param editionIds (edition_id, edition_id_i)
    * @param actorLinks (estc_id, actor_id, actor_role_author)
    * @param actorIds   (actor_id, actor_id_i)
    * @return (edition_id_i, actor_id_i nullable)
    */
  def editionAuthors(editionIds: DataFrame, actorLinks: DataFrame,
      actorIds: DataFrame): DataFrame =
    editionIds
      .join(broadcast(actorLinks),
        col("estc_id") === col("edition_id") && col("actor_role_author") === 1,
        "left")
      .join(broadcast(actorIds), Seq("actor_id"), "left")
      .select("edition_id_i", "actor_id_i")
}
