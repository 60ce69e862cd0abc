package graft.export

import graft.model.GraphSchema

/** Structural diff between two graph schemas — the schema-evolution
  * report for repeated exports: what changed between yesterday's importer
  * model and today's. Pure metadata (KBs), driver-side by design like the
  * model generation itself; row order is deterministic (kind, then name).
  *
  * Change taxonomy: node labels and relationship patterns are
  * added/removed wholesale; per-label identifiers and per-property types
  * are `changed`; properties are added/removed within surviving labels.
  */
object ModelDiff {

  final case class Entry(kind: String, name: String, change: String, detail: String)

  def diff(before: GraphSchema, after: GraphSchema): Seq[Entry] = {
    val b = before.labels.map(l => l.label -> l).toMap
    val a = after.labels.map(l => l.label -> l).toMap

    val labelEntries =
      (a.keySet -- b.keySet).toSeq.sorted.map(l =>
        Entry("node_label", l, "added", a(l).identifier)) ++
      (b.keySet -- a.keySet).toSeq.sorted.map(l =>
        Entry("node_label", l, "removed", b(l).identifier))

    val survivorEntries = (a.keySet & b.keySet).toSeq.sorted.flatMap { l =>
      val (lb, la) = (b(l), a(l))
      val idChange =
        if (la.identifier != lb.identifier)
          Seq(Entry("identifier", l, "changed", s"${lb.identifier}->${la.identifier}"))
        else Nil
      val bp = lb.properties.map(p => p.name -> p).toMap
      val ap = la.properties.map(p => p.name -> p).toMap
      val props =
        (ap.keySet -- bp.keySet).toSeq.sorted.map(p =>
          Entry("property", s"$l.$p", "added", ap(p).typeToken)) ++
        (bp.keySet -- ap.keySet).toSeq.sorted.map(p =>
          Entry("property", s"$l.$p", "removed", bp(p).typeToken)) ++
        (ap.keySet & bp.keySet).toSeq.sorted
          .filter(p => ap(p).typeToken != bp(p).typeToken)
          .map(p => Entry("property", s"$l.$p", "changed",
            s"${bp(p).typeToken}->${ap(p).typeToken}"))
      idChange ++ props
    }

    val br = before.rels.map(r => r.pattern.key -> r).toMap
    val ar = after.rels.map(r => r.pattern.key -> r).toMap
    val relEntries =
      (ar.keySet -- br.keySet).toSeq.sorted.map(k =>
        Entry("rel_pattern", k, "added",
          s"${ar(k).pattern.srcLabel}->${ar(k).pattern.dstLabel}")) ++
      (br.keySet -- ar.keySet).toSeq.sorted.map(k =>
        Entry("rel_pattern", k, "removed",
          s"${br(k).pattern.srcLabel}->${br(k).pattern.dstLabel}"))

    (labelEntries ++ survivorEntries ++ relEntries).sortBy(e => (e.kind, e.name, e.change))
  }
}
