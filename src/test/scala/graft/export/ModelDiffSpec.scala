package graft.export

import graft.model.{GraphSchema, LabelSchema, PropertyMeta, RelPattern, RelSchema}
import org.scalatest.funsuite.AnyFunSuite

class ModelDiffSpec extends AnyFunSuite {

  private def schema(
      labels: Seq[LabelSchema], rels: Seq[RelSchema] = Nil): GraphSchema =
    GraphSchema(labels, rels)

  test("diff reports adds, removes, identifier and type changes, deterministically ordered") {
    val before = schema(
      labels = Seq(
        LabelSchema("A", "id", Seq(PropertyMeta("id", "integer", false),
          PropertyMeta("x", "integer", true), PropertyMeta("gone", "string", true))),
        LabelSchema("Dropped", "did", Seq(PropertyMeta("did", "integer", false)))),
      rels = Seq(RelSchema(RelPattern("A", "OLD", "Dropped"), "id", "did", Nil)))
    val after = schema(
      labels = Seq(
        LabelSchema("A", "uuid", Seq(PropertyMeta("uuid", "string", false),
          PropertyMeta("x", "float", true), PropertyMeta("fresh", "boolean", true))),
        LabelSchema("New", "nid", Seq(PropertyMeta("nid", "integer", false)))),
      rels = Seq(RelSchema(RelPattern("A", "LINKS", "New"), "uuid", "nid", Nil)))

    val got = ModelDiff.diff(before, after)
    import ModelDiff.Entry
    assert(got == Seq(
      Entry("identifier", "A", "changed", "id->uuid"),
      Entry("node_label", "Dropped", "removed", "did"),
      Entry("node_label", "New", "added", "nid"),
      Entry("property", "A.fresh", "added", "boolean"),
      Entry("property", "A.gone", "removed", "string"),
      Entry("property", "A.id", "removed", "integer"),
      Entry("property", "A.uuid", "added", "string"),
      Entry("property", "A.x", "changed", "integer->float"),
      Entry("rel_pattern", "A_LINKS_New", "added", "A->New"),
      Entry("rel_pattern", "A_OLD_Dropped", "removed", "A->Dropped")))
  }

  test("identical schemas diff to nothing") {
    val s = schema(Seq(LabelSchema("A", "id", Seq(PropertyMeta("id", "integer", false)))),
      Seq(RelSchema(RelPattern("A", "R", "A"), "id", "id", Nil)))
    assert(ModelDiff.diff(s, s).isEmpty)
  }
}
