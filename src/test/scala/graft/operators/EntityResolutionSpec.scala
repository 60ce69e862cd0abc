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

  test("fuzzyPairs: hot blocks dropped by maxBucketSize") {
    val hot = (1L to 20L).map(i => (i, s"dup $i")).toDF("id", "name")
    val capped = EntityResolution.fuzzyPairs(hot, "id", "name", lit("same"),
      maxDist = 99, maxBucketSize = 10)
    assert(capped.count() == 0) // the one block exceeds the cap — no k^2 blowup
    val uncapped = EntityResolution.fuzzyPairs(hot, "id", "name", lit("same"),
      maxDist = 99, maxBucketSize = 1000)
    assert(uncapped.count() == 20L * 19 / 2)
  }

  test("resolve: clusters merge transitively, singletons self-canonical") {
    val resolved = EntityResolution.resolve(people, "id", "name", firstChar, maxDist = 1)
      .as[(Long, Long, Boolean)].collect()
    val canon = resolved.map(r => r._1 -> r._2).toMap
    assert(canon == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 4L))
    assert(resolved.filter(_._3).map(_._1).toSet == Set(1L, 3L, 4L))
  }
}
