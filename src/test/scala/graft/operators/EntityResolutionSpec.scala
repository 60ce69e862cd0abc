package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class EntityResolutionSpec extends SparkTestBase {
  import spark.implicits._

  private val people = Seq(
    (1L, "jon smith"),
    (2L, "john smith"),   // 1 insert from jon smith
    (3L, "jane smith"),   // 2 edits from john smith — outside maxDist=1
    (4L, "bob jones"),
    (5L, "bob jonez"))    // 1 substitution from bob jones
    .toDF("id", "name")

  // block on first character: {j: 1,2,3}, {b: 4,5}
  private val firstChar = expr("substr(name, 1, 1)")

  test("fuzzyPairs: hand-computed pairs within blocks") {
    val got = EntityResolution.fuzzyPairs(people, "id", "name", firstChar, maxDist = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (4L, 5L, 1L)))
  }

  test("fuzzyPairs: cross-block pairs never compared") {
    // jane→bob would be within maxDist=99 but sits in another block
    val got = EntityResolution.fuzzyPairs(people, "id", "name", firstChar, maxDist = 99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!got.contains((3L, 4L)) && got.contains((1L, 3L)))
  }

  test("fuzzyPairs: duplicate-heavy input equals the naive all-pairs form") {
    // 3 copies each of two names one edit apart + a distinct singleton —
    // the duplicate-collapse path must reproduce every pair the naive
    // block self-join would emit, with names attached to the right ids
    val rows = Seq((1L, "alpha"), (2L, "alpha"), (3L, "alpha"),
      (4L, "alphb"), (5L, "alphb"), (6L, "alphb"), (7L, "omega"))
      .toDF("id", "name")
    val got = EntityResolution.fuzzyPairs(rows, "id", "name", firstChar, maxDist = 1)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
      .as[(Long, Long, String, String, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val base = Seq((1L, "alpha"), (2L, "alpha"), (3L, "alpha"),
      (4L, "alphb"), (5L, "alphb"), (6L, "alphb"), (7L, "omega"))
    val expected = (for {
      (blk, xs) <- base.groupBy(_._2.take(1)).toSeq
      a <- xs; b <- xs if a._1 < b._1
      d = lev(a._2, b._2) if d <= 1
    } yield (a._1, b._1, a._2, b._2, d.toLong)).toSet
    assert(got == expected)
    // within-group pairs surface with distance 0
    assert(got.contains((1L, 2L, "alpha", "alpha", 0L)))
    // cross-group expansion keeps name_a attached to the smaller id
    assert(got.contains((3L, 4L, "alpha", "alphb", 1L)))
  }

  test("fuzzyPairs: bucket guard counts raw rows, not collapsed names") {
    // 12 raw rows but only 2 distinct names: a cap of 10 must still drop
    // the block (the k² risk is raw-row pairs, and so is the contract)
    val hot = (1L to 12L).map(i => (i, if (i % 2 == 0) "even" else "odd!"))
      .toDF("id", "name")
    assert(EntityResolution.fuzzyPairs(hot, "id", "name", lit("same"),
      maxDist = 99, maxBucketSize = 10).count() == 0)
  }

  test("fuzzyPairs: hot blocks dropped by maxBucketSize") {
    val hot = (1L to 20L).map(i => (i, s"dup $i")).toDF("id", "name")
    val capped = EntityResolution.fuzzyPairs(hot, "id", "name", lit("same"),
      maxDist = 99, maxBucketSize = 10)
    assert(capped.count() == 0) // the one block exceeds the cap — no k^2 blowup
    val uncapped = EntityResolution.fuzzyPairs(hot, "id", "name", lit("same"),
      maxDist = 99, maxBucketSize = 1000)
    assert(uncapped.count() == 20L * 19 / 2)
  }

  test("sortedNeighborPairs: window-adjacent matches only, normalized ids") {
    // sort ascending by name inside one block: ann, bob, bobb, carl, zed
    val ents = Seq(
      (10L, "ann"), (2L, "bob"), (7L, "bobb"), (4L, "carl"), (5L, "zed"))
      .toDF("id", "name")
    val got = EntityResolution.sortedNeighborPairs(ents, "id", "name",
      sortExpr = col("name"), blockExpr = lit(1), window = 2, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    // only adjacent-in-sort pairs are compared: bob~bobb is the sole match
    assert(got == Set((2L, 7L, 1L)))
    // window=3 also compares (ann,bobb), (bob,carl), (bobb,zed), (carl,?)... none within dist 1
    val w3 = EntityResolution.sortedNeighborPairs(ents, "id", "name",
      sortExpr = col("name"), blockExpr = lit(1), window = 3, maxDist = 1)
      .as[(Long, Long, Long)].collect().toSet
    assert(w3 == Set((2L, 7L, 1L)))
    // different blocks never compare
    val blocked = EntityResolution.sortedNeighborPairs(ents, "id", "name",
      sortExpr = col("name"), blockExpr = col("id") % 2, window = 5, maxDist = 99)
    assert(!blocked.as[(Long, Long, Long)].collect()
      .exists(p => (p._1 % 2) != (p._2 % 2)))
  }

  test("resolve: clusters merge transitively, singletons self-canonical") {
    val resolved = EntityResolution.resolve(people, "id", "name", firstChar, maxDist = 1)
      .as[(Long, Long, Boolean)].collect()
    val canon = resolved.map(r => r._1 -> r._2).toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
    assert(resolved.filter(_._3).map(_._1).toSet == Set(1L, 3L, 4L))
  }
}
