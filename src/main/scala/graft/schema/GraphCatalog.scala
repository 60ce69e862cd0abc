package graft.schema

import graft.model.{GraphConstraint, GraphIndex}

/** Registry of declared constraints + indexes — the engine-side stand-in
  * for Neo4j's `SHOW CONSTRAINTS` / `SHOW INDEXES`
  * (neo4j_export.py:83-130, 177-227, 229-267).
  *
  * In the reference these are *discovered* from the live database; in a
  * lakehouse there is no constraint store, so callers declare them (or a
  * mapper like [[graft.model.TableGraphMapper]] derives them from the
  * relational schema). [[IdentifierDetector]] consumes the uniqueness
  * constraints as its rule-1 priority, exactly like
  * `_determine_identifier` (neo4j_export.py:142-146).
  */
final case class GraphCatalog(
    constraints: Seq[GraphConstraint] = Nil,
    indexes: Seq[GraphIndex] = Nil) {

  /** Unique-constraint properties for a label, in declaration order —
    * mirrors `self.unique_constraints[label]` (neo4j_export.py:90-101). */
  def uniqueConstraintProps(label: String): Seq[String] =
    constraints
      .filter(c => c.entityType == "node" &&
        (c.constraintType == "uniqueness" || c.constraintType == "key") &&
        c.labels.headOption.contains(label))
      .flatMap(_.properties)

  def withUnique(label: String, property: String): GraphCatalog =
    copy(constraints = constraints :+ GraphConstraint(
      name = s"${property}_${label}_uniq",
      constraintType = "uniqueness",
      entityType = "node",
      labels = Seq(label),
      properties = Seq(property)))

  def withIndex(label: String, property: String, indexType: String = "default"): GraphCatalog =
    copy(indexes = indexes :+ GraphIndex(
      name = s"${property}_${label}_idx",
      indexType = indexType,
      entityType = "node",
      labels = Seq(label),
      properties = Seq(property)))
}

object GraphCatalog {
  val empty: GraphCatalog = GraphCatalog()
}
