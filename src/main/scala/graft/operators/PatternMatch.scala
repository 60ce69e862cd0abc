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

  /** One pattern hop. `types` = the relationship types this hop may
    * traverse (Cypher's `-[:R1|R2]->` multi-type union — each type must
    * resolve against the schema with this hop's endpoint labels, and the
    * hop's edge set is their UNION ALL, so path multiplicity counts each
    * matching relationship instance); `optional` = Cypher's OPTIONAL
    * MATCH fragment (left-outer: unmatched base rows survive with a NULL
    * binding); `negated` = the `WHERE NOT (..)-[:REL]->(..)` fragment
    * (anti-join FILTER — keeps base rows with no such edge, binds
    * nothing); `undirected` = Cypher's `-[:REL]-` (the hop traverses
    * matching patterns in EITHER direction — schema patterns
    * (cur)-[t]->(dst) forward and (dst)-[t]->(cur) reversed). */
  final case class Hop(types: Seq[String], dstLabel: String,
      optional: Boolean = false, negated: Boolean = false,
      undirected: Boolean = false)
  object Hop {
    def apply(relType: String, dstLabel: String): Hop = Hop(Seq(relType), dstLabel)
  }
  final case class PathPattern(startLabel: String, hops: Seq[Hop]) {
    /** Binding column name per path position: lowercased label + "_id",
      * suffixed with the position index when a label repeats. Negated
      * hops get a name too (so nodeFilters can target them) but bind no
      * output column. */
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

  private val HopRe = """-\[(!?)(\w+(?:\|\w+)*)(\??)\]-(>?)(\w+)""".r

  /** Parse `"Label-[REL]->Label-[R1|R2]->Label-[REL]-Label-[!REL]->Label"`:
    * `REL?` marks an OPTIONAL hop, `!REL` a NEGATED (anti) hop, `R1|R2` a
    * multi-type union, and a trailing `]-` (no `>`) an UNDIRECTED hop. */
  def parse(pattern: String): PathPattern = {
    val trimmed = pattern.trim
    val firstHop = trimmed.indexOf("-[")
    require(firstHop > 0, s"pattern must start with a label: '$pattern'")
    val start = trimmed.substring(0, firstHop)
    val rest = trimmed.substring(firstHop)
    val hops = HopRe.findAllMatchIn(rest).map { m =>
      require(!(m.group(1) == "!" && m.group(3) == "?"),
        s"a hop cannot be both negated and optional: '$pattern'")
      Hop(m.group(2).split('|').toSeq, m.group(5),
        optional = m.group(3) == "?", negated = m.group(1) == "!",
        undirected = m.group(4).isEmpty)
    }.toSeq
    val consumed = HopRe.findAllIn(rest).mkString
    require(hops.nonEmpty && consumed == rest,
      s"cannot parse pattern '$pattern' — expected Label-[REL]->Label-[REL]->...")
    require(hops.dropRight(1).forall(!_.negated),
      s"a negated hop must be the final hop (it binds nothing): '$pattern'")
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

  /** Variable-length forward paths — the Cypher `-[*min..max]->`
    * fragment, set-oriented: frontier expansion over the SCHEMA's
    * relationship patterns (optionally restricted to `relTypes`), one
    * output row per (start id, end label, end id, path length) with the
    * number of distinct paths of that length.
    *
    * The driver iterates only over the schema-sized pattern list; each
    * length-k result is k equi-joins. Frontiers carry path MULTIPLICITY
    * (no dedup) so `n_paths` counts paths — Cypher semantics, where
    * every relationship instance extends a distinct path — and `maxHops`
    * bounds the work on cyclic graphs. Ids surface as strings so
    * heterogeneous end labels union safely.
    *
    * Plan shape, learned at sf1: each per-label frontier is EAGERLY
    * localCheckpoint'ed, then counted, then joined with an EXPLICIT
    * `broadcast(frontier)` hint while it stays under
    * [[GraphAnalytics.MaxBroadcastVertices]] rows. Three effects, all
    * load-bearing at scale: (1) the hop join never shuffles the edge
    * table — an anchored pattern's frontier is anchor-bounded while the
    * edge table grows with the data, and relying on auto-broadcast here
    * is a size-ESTIMATE cliff (a filtered-anchor frontier's estimate
    * crosses autoBroadcastJoinThreshold as base-table stats grow, and
    * the planner silently flips to shuffling BOTH sides — the r9 sf1
    * bench measured 1→204 MB of shuffle on exactly this plan); (2) the
    * checkpoint pins the REAL row count, so the guard decides on truth,
    * not estimates, and an unanchored (vertex-sized) frontier falls back
    * to the shuffle join instead of inheriting a driver OOM; (3) labels
    * with several outgoing patterns reuse the materialized frontier
    * instead of racing to recompute the shared join prefix per branch. */
  def findVarLength(g: PropertyGraph, startLabel: String,
      minHops: Int, maxHops: Int,
      relTypes: Option[Set[String]] = None): DataFrame = {
    require(minHops >= 1 && maxHops >= minHops,
      s"need 1 <= minHops <= maxHops, got $minHops..$maxHops")
    val startSchema = g.schema.labels.find(_.label == startLabel)
      .getOrElse(throw new IllegalArgumentException(s"unknown start label $startLabel"))
    // pin: eager checkpoint + exact count per label frontier; every
    // consumer (each outgoing pattern's hop join, the length-k output
    // branch, the final union-aggregate) reads the materialized rows
    def pin(m: Map[String, DataFrame]): Map[String, (DataFrame, Boolean)] =
      m.map { case (l, df) =>
        val cp = df.localCheckpoint(true)
        l -> (cp, cp.count() <= GraphAnalytics.MaxBroadcastVertices)
      }
    var frontier: Map[String, (DataFrame, Boolean)] = pin(Map(startLabel ->
      g.nodes(startLabel).select(
        col(startSchema.identifier).cast("string").as("src_id"),
        col(startSchema.identifier).cast("string").as("cur_id"))))
    val perLength = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    (1 to maxHops).foreach { k =>
      val next = scala.collection.mutable.Map.empty[String, DataFrame]
      frontier.foreach { case (label, (df, small)) =>
        val hopFrontier = if (small) broadcast(df) else df
        g.schema.rels
          .filter(rs => rs.pattern.srcLabel == label &&
            relTypes.forall(_.contains(rs.pattern.relType)))
          .foreach { rs =>
            val edge = g.rels(rs.pattern).select(
              col(rs.srcColName).cast("string").as("__s"),
              col(rs.dstColName).cast("string").as("__d"))
            val stepped = hopFrontier.join(edge, hopFrontier("cur_id") === edge("__s"))
              .select(col("src_id"), col("__d").as("cur_id"))
            next.updateWith(rs.pattern.dstLabel)(prev =>
              Some(prev.map(_.unionAll(stepped)).getOrElse(stepped)))
          }
      }
      // the final frontier is consumed exactly once (the output union) —
      // pinning it would be a pure extra materialization, so it stays lazy
      frontier =
        if (k < maxHops) pin(next.toMap)
        else next.toMap.map { case (l, df) => l -> (df, false) }
      if (k >= minHops) frontier.foreach { case (label, (df, _)) =>
        perLength += df.select(col("src_id"), lit(label).as("dst_label"),
          col("cur_id").as("dst_id"), lit(k).cast("long").as("hops"))
      }
    }
    if (perLength.isEmpty)
      throw new IllegalArgumentException(
        s"no pattern expands any path of length >= $minHops from $startLabel")
    perLength.reduce(_ unionAll _)
      .groupBy("src_id", "dst_label", "dst_id", "hops")
      .agg(count(lit(1)).as("n_paths"))
  }

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

    // One hop's traversable edge set: per listed type, the forward
    // pattern (cur)-[t]->(dst), plus — for undirected hops — the reverse
    // pattern (dst)-[t]->(cur) with endpoints swapped. Multi-type hops
    // UNION ALL their types' edge tables (Catalyst plans the union's
    // children independently; each side still pushes its scan filters).
    def hopEdges(cur: String, hop: Hop): DataFrame = {
      val parts = hop.types.flatMap { t =>
        val fwd = g.schema.rels.find(_.pattern == RelPattern(cur, t, hop.dstLabel)).map { rs =>
          g.rels(rs.pattern)
            .select(col(rs.srcColName).as("__hop_src"), col(rs.dstColName).as("__hop_dst"))
        }
        val rev = if (hop.undirected)
          g.schema.rels.find(_.pattern == RelPattern(hop.dstLabel, t, cur)).map { rs =>
            g.rels(rs.pattern)
              .select(col(rs.dstColName).as("__hop_src"), col(rs.srcColName).as("__hop_dst"))
          }
        else None
        val found = fwd.toSeq ++ rev.toSeq
        require(found.nonEmpty,
          s"no relationship $cur-[$t]-${if (hop.undirected) "" else ">"}${hop.dstLabel}; " +
            s"graph has ${g.schema.rels.map(_.pattern.key).mkString(", ")}")
        found
      }
      parts.reduce(_ unionAll _)
    }

    p.hops.zipWithIndex.foreach { case (hop, i) =>
      val edgeRaw = hopEdges(curLabel, hop)
      // optional/negated hops take their dst filter INSIDE the hop
      // (Cypher: a predicate inside OPTIONAL MATCH / NOT restricts what
      // counts as a match; the base row always survives)
      def preFiltered: DataFrame = nodeFilters.get(bindings(i + 1)).fold(edgeRaw) { pred =>
        val dstId = labelSchema(hop.dstLabel).identifier
        val ids = g.nodes(hop.dstLabel).where(pred).select(col(dstId).as("__filter_id"))
        edgeRaw.join(ids, edgeRaw("__hop_dst") === ids("__filter_id"), "left_semi")
      }
      if (hop.negated) {
        // anti FILTER: keep frontier rows with NO matching edge; binds
        // nothing and (enforced by parse) ends the pattern
        frontier = frontier.join(preFiltered,
          frontier(bindings(i)) === col("__hop_src"), "left_anti")
      } else if (hop.optional) {
        frontier = frontier
          .join(preFiltered, frontier(bindings(i)) === col("__hop_src"), "left_outer")
          .drop("__hop_src")
          .withColumnRenamed("__hop_dst", bindings(i + 1))
      } else {
        frontier = frontier
          .join(edgeRaw, frontier(bindings(i)) === edgeRaw("__hop_src"))
          .drop("__hop_src")
          .withColumnRenamed("__hop_dst", bindings(i + 1))
        nodeFilters.get(bindings(i + 1)).foreach { pred =>
          val dstId = labelSchema(hop.dstLabel).identifier
          val ids = g.nodes(hop.dstLabel).where(pred).select(col(dstId).as("__filter_id"))
          frontier = frontier.join(ids,
            frontier(bindings(i + 1)) === ids("__filter_id"), "left_semi")
        }
      }
      curLabel = hop.dstLabel
    }
    frontier
  }
}
