package graft.operators

import graft.SparkTestBase
import graft.model._

class PatternMatchSpec extends SparkTestBase {
  import spark.implicits._

  /** A->B->C path graph: a1->b1->c1, a1->b2->c1, a2->b1->c1; b3 dangling. */
  private def pathGraph(): PropertyGraph = {
    val aNodes = Seq(1L, 2L).toDF("aid")
    val bNodes = Seq(10L, 20L, 30L).toDF("bid")
    val cNodes = Seq(100L).toDF("cid")
    val ab = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("A_aid", "B_bid")
    val bc = Seq((10L, 100L), (20L, 100L)).toDF("B_bid", "C_cid")
    PropertyGraph(
      nodes = Map("A" -> aNodes, "B" -> bNodes, "C" -> cNodes),
      rels = Map(
        RelPattern("A", "R", "B") -> ab,
        RelPattern("B", "S", "C") -> bc),
      schema = GraphSchema(
        labels = Seq(
          LabelSchema("A", "aid", Seq(PropertyMeta("aid", "integer", nullable = false))),
          LabelSchema("B", "bid", Seq(PropertyMeta("bid", "integer", nullable = false))),
          LabelSchema("C", "cid", Seq(PropertyMeta("cid", "integer", nullable = false)))),
        rels = Seq(
          RelSchema(RelPattern("A", "R", "B"), "aid", "bid", Nil),
          RelSchema(RelPattern("B", "S", "C"), "bid", "cid", Nil))))
  }

  test("parse: labels and hops, rejects malformed patterns") {
    val p = PatternMatch.parse("Customer-[PLACED]->Order-[CONTAINS]->Part")
    assert(p.startLabel == "Customer")
    assert(p.hops == Seq(PatternMatch.Hop("PLACED", "Order"), PatternMatch.Hop("CONTAINS", "Part")))
    assert(p.bindingNames == Seq("customer_id", "order_id", "part_id"))
    intercept[IllegalArgumentException](PatternMatch.parse("-[X]->B"))
    intercept[IllegalArgumentException](PatternMatch.parse("A-[X]>B"))
    intercept[IllegalArgumentException](PatternMatch.parse("A-(X)->B"))
    intercept[IllegalArgumentException](PatternMatch.parse("A"))
  }

  test("parse: undirected and multi-type hops") {
    val und = PatternMatch.parse("A-[R]-B")
    assert(und.hops == Seq(PatternMatch.Hop(Seq("R"), "B", undirected = true)))
    val multi = PatternMatch.parse("A-[R|T]->B-[S]-C")
    assert(multi.hops == Seq(
      PatternMatch.Hop(Seq("R", "T"), "B"),
      PatternMatch.Hop(Seq("S"), "C", undirected = true)))
  }

  test("binding names disambiguate repeated labels positionally") {
    val p = PatternMatch.PathPattern("N",
      Seq(PatternMatch.Hop("KNOWS", "N"), PatternMatch.Hop("KNOWS", "N")))
    assert(p.bindingNames == Seq("n_id_1", "n_id_2", "n_id_3"))
  }

  test("two-hop path enumeration, hand-computed") {
    val got = PatternMatch.find(pathGraph(), "A-[R]->B-[S]->C")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 100L), (1L, 20L, 100L), (2L, 10L, 100L)))
  }

  test("single hop keeps dangling targets out when the edge table lacks them") {
    val got = PatternMatch.find(pathGraph(), "A-[R]->B")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 10L), (1L, 20L), (2L, 10L))) // b3=30 never bound
  }

  test("node filters prune at their binding position") {
    import org.apache.spark.sql.functions.col
    // filter the START: only a2 → one path
    val startFiltered = PatternMatch.find(pathGraph(), "A-[R]->B-[S]->C",
      Map("a_id" -> (col("aid") === 2L)))
      .as[(Long, Long, Long)].collect().toSet
    assert(startFiltered == Set((2L, 10L, 100L)))
    // filter a MIDDLE binding: only b2 → one path
    val midFiltered = PatternMatch.find(pathGraph(), "A-[R]->B-[S]->C",
      Map("b_id" -> (col("bid") === 20L)))
      .as[(Long, Long, Long)].collect().toSet
    assert(midFiltered == Set((1L, 20L, 100L)))
    // unknown binding name fails fast
    intercept[IllegalArgumentException](
      PatternMatch.find(pathGraph(), "A-[R]->B", Map("nope" -> (col("aid") === 1L))))
  }

  test("unknown label or relationship fails fast with the available names") {
    val e1 = intercept[IllegalArgumentException](PatternMatch.find(pathGraph(), "Z-[R]->B"))
    assert(e1.getMessage.contains("unknown start label"))
    val e2 = intercept[IllegalArgumentException](PatternMatch.find(pathGraph(), "A-[NOPE]->B"))
    assert(e2.getMessage.contains("A-[NOPE]->B") && e2.getMessage.contains("A_R_B"))
  }

  test("variable-length paths: multiplicity counted, lengths separated") {
    // a1 reaches c100 via b10 AND b20 → two 2-hop paths, one row n_paths=2
    val got = PatternMatch.findVarLength(pathGraph(), "A", minHops = 1, maxHops = 2)
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("1", "B", "10", 1L, 1L), ("1", "B", "20", 1L, 1L), ("2", "B", "10", 1L, 1L),
      ("1", "C", "100", 2L, 2L), ("2", "C", "100", 2L, 1L)))
    // minHops=2 drops the 1-hop rows; relTypes restriction prunes S
    val only2 = PatternMatch.findVarLength(pathGraph(), "A", 2, 2)
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(only2 == Set(("1", "C", "100", 2L, 2L), ("2", "C", "100", 2L, 1L)))
    val onlyR = PatternMatch.findVarLength(pathGraph(), "A", 1, 2, Some(Set("R")))
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(onlyR == Set(("1", "B", "10", 1L, 1L), ("1", "B", "20", 1L, 1L), ("2", "B", "10", 1L, 1L)))
  }

  test("variable-length paths: small frontier rides an EXPLICIT broadcast hint") {
    // Disable auto-broadcast — simulating the sf1 size-estimate cliff where
    // the planner stops volunteering broadcasts — and require the hop joins
    // to broadcast anyway (the hint is explicit and count-guarded, not
    // estimate-driven), with results unchanged.
    val expected = PatternMatch.findVarLength(pathGraph(), "A", 1, 2)
      .as[(String, String, String, Long, Long)].collect().toSet
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = PatternMatch.findVarLength(pathGraph(), "A", 1, 2)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
        s"expected a broadcast hop join in:\n$plan")
      assert(df.as[(String, String, String, Long, Long)].collect().toSet == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("variable-length paths: cycles bounded by maxHops, path counts grow") {
    // self-loop pattern N-[E]->N over a 2-cycle 1<->2 plus edge 1->3
    val nodes = Seq(1L, 2L, 3L).toDF("nid")
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("N_nid_source", "N_nid_target")
    val g = PropertyGraph(Map("N" -> nodes), Map(RelPattern("N", "E", "N") -> e),
      GraphSchema(
        labels = Seq(LabelSchema("N", "nid", Seq(PropertyMeta("nid", "integer", nullable = false)))),
        rels = Seq(RelSchema(RelPattern("N", "E", "N"), "nid", "nid", Nil))))
    val got = PatternMatch.findVarLength(g, "N", 3, 3)
      .as[(String, String, String, Long, Long)].collect().toSet
    // exactly the walks of length 3: 1→2→1→{2,3}, 2→1→2→1
    assert(got == Set(
      ("1", "N", "2", 3L, 1L), ("1", "N", "3", 3L, 1L), ("2", "N", "1", 3L, 1L)))
  }

  test("optional hop keeps unmatched rows with a NULL binding; filter lives inside the hop") {
    import org.apache.spark.sql.functions._
    // b3 (bid 30) has no A-edge; a-side: optional hop to B with bid >= 20
    val rows = PatternMatch.find(pathGraph(), "A-[R?]->B",
        Map("b_id" -> (col("bid") >= 20L)))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
    // a1 matches b20 (b10 filtered out INSIDE the hop); a2's only edge b10
    // is filtered away -> a2 survives with NULL
    assert(rows == Set((1L, Some(20L)), (2L, None)))
  }

  test("negated hop filters to rows with NO matching edge") {
    import org.apache.spark.sql.functions._
    // A-[!R]->B: neither a1 nor a2 qualifies (both have R edges)...
    val none = PatternMatch.find(pathGraph(), "A-[!R]->B").collect()
    assert(none.isEmpty)
    // ...but with the dst restricted to bid >= 20, a2 (only edge: b10) passes
    val some = PatternMatch.find(pathGraph(), "A-[!R]->B",
        Map("b_id" -> (col("bid") >= 20L)))
      .collect().map(_.getLong(0)).toSet
    assert(some == Set(2L))
    // negated hop binds nothing: only the A binding remains
    assert(PatternMatch.find(pathGraph(), "A-[!R]->B").columns.toSeq == Seq("a_id"))
  }

  test("parse rejects negated-and-optional and non-final negation") {
    intercept[IllegalArgumentException](PatternMatch.parse("A-[!R?]->B"))
    intercept[IllegalArgumentException](PatternMatch.parse("A-[!R]->B-[S]->C"))
  }

  test("undirected hop traverses a forward-only schema pattern in reverse") {
    // B-[R]-A: no B→A pattern exists, so the hop reverses A-[R]->B
    val got = PatternMatch.find(pathGraph(), "B-[R]-A")
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L), (10L, 2L), (20L, 1L)))
  }

  test("undirected self-label hop unions both directions with multiplicity") {
    val nodes = Seq(1L, 2L, 3L).toDF("nid")
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L)).toDF("N_nid_source", "N_nid_target")
    val g = PropertyGraph(Map("N" -> nodes), Map(RelPattern("N", "E", "N") -> e),
      GraphSchema(
        labels = Seq(LabelSchema("N", "nid", Seq(PropertyMeta("nid", "integer", nullable = false)))),
        rels = Seq(RelSchema(RelPattern("N", "E", "N"), "nid", "nid", Nil))))
    val got = PatternMatch.find(g, "N-[E]-N")
      .as[(Long, Long)].collect().toSeq.sorted
    // forward (1,2),(2,1),(1,3) + reversed (2,1),(1,2),(3,1): the 2-cycle
    // edges each appear twice — walk multiplicity, not a distinct set
    assert(got == Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 1L), (3L, 1L)))
  }

  test("multi-type hop unions its types' edge tables; unknown type fails fast") {
    val aNodes = Seq(1L, 2L).toDF("aid")
    val bNodes = Seq(10L, 20L, 30L).toDF("bid")
    val r = Seq((1L, 10L), (1L, 20L)).toDF("A_aid", "B_bid")
    val t = Seq((1L, 10L), (2L, 30L)).toDF("A_aid", "B_bid")
    val g = PropertyGraph(
      nodes = Map("A" -> aNodes, "B" -> bNodes),
      rels = Map(RelPattern("A", "R", "B") -> r, RelPattern("A", "T", "B") -> t),
      schema = GraphSchema(
        labels = Seq(
          LabelSchema("A", "aid", Seq(PropertyMeta("aid", "integer", nullable = false))),
          LabelSchema("B", "bid", Seq(PropertyMeta("bid", "integer", nullable = false)))),
        rels = Seq(
          RelSchema(RelPattern("A", "R", "B"), "aid", "bid", Nil),
          RelSchema(RelPattern("A", "T", "B"), "aid", "bid", Nil))))
    val got = PatternMatch.find(g, "A-[R|T]->B")
      .as[(Long, Long)].collect().toSeq.sorted
    // (1,10) matches through BOTH types → two paths
    assert(got == Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 30L)))
    val e = intercept[IllegalArgumentException](PatternMatch.find(g, "A-[R|NOPE]->B"))
    assert(e.getMessage.contains("NOPE"))
  }
}
