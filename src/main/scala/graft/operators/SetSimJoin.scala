package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact set-similarity self-join via prefix filtering (AllPairs /
  * PPJoin family — Bayardo et al. WWW'07, Xiao et al. WWW'08): all
  * document pairs with token-set Jaccard ≥ t, with NO false negatives —
  * the exact counterpart to the probabilistic MinHash-LSH candidate
  * generator.
  *
  * The prefix principle: order every set by one GLOBAL canonical token
  * order (ascending document frequency, ties by token — rarest first);
  * two sets with Jaccard ≥ t must share at least one token among each
  * set's first n − ⌈t·n⌉ + 1 tokens. Joining on prefix tokens only
  * therefore finds every qualifying pair while hot (frequent) tokens
  * stay OUT of the prefixes — the blocking gets cheaper exactly where a
  * naive token join explodes.
  *
  * Scale shape: the frequency table is a vocabulary-sized broadcast;
  * the candidate join carries (prefix_token, doc_id, n) ONLY — token
  * arrays never ride the blocking shuffle (the round-3 ngram lesson);
  * the length filter t·|a| ≤ |b| ∧ t·|b| ≤ |a| prunes inside the join
  * stage; full arrays join back BY ID for the exact intersection, so
  * array bytes move once per surviving candidate, not per bucket pair.
  * Exactness precludes a bucket-size cap — the prefix ordering itself
  * is the skew defense (a token's prefix occurrences shrink as its
  * frequency grows).
  */
object SetSimJoin {

  /** All pairs (id_a < id_b) with |A∩B|/|A∪B| ≥ `threshold` over the
    * distinct whitespace-token sets of `textCol`. Returns
    * (id_a, id_b, n_a, n_b, inter, jaccard); jaccard is one
    * int/int division — engine-exact without rounding. */
  def jaccardJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0 && threshold <= 1, "threshold must be in (0, 1]")
    // toks feeds the frequency census AND the canonical-order rebuild;
    // lists is read three ways (prefix explode + both verify sides) and
    // pre twice (the self-join) — each is pinned so the tokenize /
    // collect-sort pipelines run once, not once per consumer.
    val toks = df.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(trim(lower(col(textCol))), "\\s+"))).as("tok"))
      .where(col("tok") =!= "")
      .localCheckpoint(true)
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("tf"))
    val lists = toks.join(broadcast(freq), "tok")
      .groupBy("doc_id")
      .agg(
        transform(array_sort(collect_list(struct(col("tf"), col("tok")))),
          x => x.getField("tok")).as("toks"),
        count(lit(1)).as("n"))
      .withColumn("p", (col("n") - ceil(lit(threshold) * col("n")) + 1).cast("int"))
      .localCheckpoint(true)
    val pre = lists.select(col("doc_id"), col("n"),
      explode(slice(col("toks"), lit(1), col("p"))).as("tok"))
      .localCheckpoint(true)
    val cand = pre.as("a").join(pre.as("b"), "tok")
      .where(col("a.doc_id") < col("b.doc_id") &&
        lit(threshold) * col("a.n") <= col("b.n") &&
        lit(threshold) * col("b.n") <= col("a.n"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val la = lists.select(col("doc_id").as("id_a"), col("toks").as("toks_a"),
      col("n").as("n_a"))
    val lb = lists.select(col("doc_id").as("id_b"), col("toks").as("toks_b"),
      col("n").as("n_b"))
    cand.join(la, "id_a").join(lb, "id_b")
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter")))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"), col("inter"),
        col("jaccard"))
  }
}
