package graft.operators

import graft.model.{PropertyGraph, RelPattern}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative path-pattern matching over a [[PropertyGraph]] — the
  * query-side counterpart of the reference's export surface: its users
  * think in Cypher paths (`(c:Customer)-[:PLACED]->(o:Order)`), so the
  * engine exposes the same shape compiled onto DataFrame joins.
  *
  * `PatternMatch.find(g, "Customer-[PLACED]->Order-[CONTAINS]->Part")`
  * returns one row per matching path with one id column per binding
  * (`customer_id`, `order_id`, `part_id`; repeated labels get positional
  * suffixes). Each hop is an equi-join of the frontier against the
  * pattern's edge table on its source endpoint column — Catalyst plans
  * broadcast joins for dim-sized frontiers/edge tables and AQE handles
  * skew, so an anchored 3-hop pattern is 2 shuffles, not an iterative
  * traversal. Node properties are joined back on demand by the caller
  * (the bindings are the node identifiers).
  *
  * This is intentionally the bulk-analytics fragment of Cypher — fixed-
  * length forward paths — not OLTP traversal: per SURVEY §1, per-seed
  * millisecond traversal is out of scope; set-oriented path matching over
  * the whole graph is what Spark does well.
  */
object PatternMatch {

  final case class Hop(relType: String, dstLabel: String)
  final case class PathPattern(startLabel: String, hops: Seq[Hop]) {
    /** Binding column name per path position: lowercased label + "_id",
      * suffixed with the position index when a label repeats. */
    def bindingNames: Seq[String] = {
      val labels = startLabel +: hops.map(_.dstLabel)
      val counts = labels.groupBy(identity).view.mapValues(_.size).toMap
      val seen = scala.collection.mutable.Map.empty[String, Int]
      labels.map { l =>
        val base = l.toLowerCase + "_id"
        if (counts(l) == 1) base
        else {
          val i = seen.updateWith(l)(c => Some(c.getOrElse(0) + 1)).get
          s"${base}_$i"
        }
      }
    }
  }

  private val HopRe = """-\[(\w+)\]->(\w+)""".r

  /** Parse `"Label-[REL]->Label-[REL]->Label"`. */
  def parse(pattern: String): PathPattern = {
    val trimmed = pattern.trim
    val firstHop = trimmed.indexOf("-[")
    require(firstHop > 0, s"pattern must start with a label: '$pattern'")
    val start = trimmed.substring(0, firstHop)
    val rest = trimmed.substring(firstHop)
    val hops = HopRe.findAllMatchIn(rest).map(m => Hop(m.group(1), m.group(2))).toSeq
    val consumed = HopRe.findAllIn(rest).mkString
    require(hops.nonEmpty && consumed == rest,
      s"cannot parse pattern '$pattern' — expected Label-[REL]->Label-[REL]->...")
    PathPattern(start, hops)
  }

  def find(g: PropertyGraph, pattern: String): DataFrame = find(g, parse(pattern))

  def find(g: PropertyGraph, p: PathPattern): DataFrame =
    find(g, p, Map.empty[String, org.apache.spark.sql.Column])

  /** As [[find]], with per-binding property predicates pushed INTO the
    * traversal: `nodeFilters` maps a binding name (see
    * [[PathPattern.bindingNames]]) to a predicate over that node label's
    * table. The start binding filters the anchor table before any join
    * (predicate reaches the scan); hop bindings become a semi-join of the
    * frontier against the filtered node ids — so a selective filter
    * anywhere in the path prunes every later hop's input instead of
    * filtering the final cross product. The Cypher
    * `(c:Customer {segment:'BUILDING'})` fragment, set-oriented. */
  def find(g: PropertyGraph, pattern: String,
      nodeFilters: Map[String, org.apache.spark.sql.Column]): DataFrame =
    find(g, parse(pattern), nodeFilters)

  def find(g: PropertyGraph, p: PathPattern,
      nodeFilters: Map[String, org.apache.spark.sql.Column]): DataFrame = {
    val bindings = p.bindingNames
    val unknown = nodeFilters.keySet -- bindings.toSet
    require(unknown.isEmpty,
      s"nodeFilters for unknown bindings $unknown; pattern binds ${bindings.mkString(", ")}")
    def labelSchema(label: String) = g.schema.labels.find(_.label == label)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown start label $label; graph has ${g.schema.labels.map(_.label).mkString(", ")}"))

    val startSchema = labelSchema(p.startLabel)
    val startTable = nodeFilters.get(bindings.head)
      .map(g.nodes(p.startLabel).where(_)).getOrElse(g.nodes(p.startLabel))
    var frontier = startTable.select(col(startSchema.identifier).as(bindings.head))
    var curLabel = p.startLabel

    p.hops.zipWithIndex.foreach { case (hop, i) =>
      val relPattern = RelPattern(curLabel, hop.relType, hop.dstLabel)
      val rs = g.schema.rels.find(_.pattern == relPattern)
        .getOrElse(throw new IllegalArgumentException(
          s"no relationship ${relPattern.key}; graph has ${g.schema.rels.map(_.pattern.key).mkString(", ")}"))
      val edge = g.rels(relPattern)
        .select(col(rs.srcColName).as("__hop_src"), col(rs.dstColName).as("__hop_dst"))
      frontier = frontier
        .join(edge, frontier(bindings(i)) === edge("__hop_src"))
        .drop("__hop_src")
        .withColumnRenamed("__hop_dst", bindings(i + 1))
      nodeFilters.get(bindings(i + 1)).foreach { pred =>
        val dstId = labelSchema(hop.dstLabel).identifier
        val ids = g.nodes(hop.dstLabel).where(pred).select(col(dstId).as("__filter_id"))
        frontier = frontier.join(ids,
          frontier(bindings(i + 1)) === ids("__filter_id"), "left_semi")
      }
      curLabel = hop.dstLabel
    }
    frontier
  }
}
