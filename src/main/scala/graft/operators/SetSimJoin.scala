package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT set-similarity join via PREFIX FILTERING (Bayardo et al.,
  * WWW'07 "Scaling Up All Pairs Similarity Search"; Xiao et al.,
  * WWW'08 PPJoin) — all pairs whose set Jaccard meets a threshold,
  * with NO candidate dropped: the complement of the capped heuristic
  * paths (MinHash-LSH, capped postings), for when the contract is
  * "every pair" rather than "almost every pair".
  *
  * The principle: fix one global total order over tokens (rarest
  * first — document frequency ascending, token as tie-break). A set
  * X only needs to emit postings for its PREFIX — the first
  * `|X| − ⌈t·|X|⌉ + 1` tokens in that order. Soundness: if
  * J(A,B) ≥ t then |A∩B| ≥ t·|A|; were no intersection token in A's
  * prefix, all of A∩B would fit in the `⌈t·|A|⌉ − 1` suffix slots —
  * pigeonhole contradiction. And any shared token ≤ the prefix end
  * of the LATER-prefixed set is inside both prefixes, so the
  * prefix-postings self-join sees every qualifying pair.
  *
  * Rare-first ordering is also the cost model: a token appears in
  * prefixes only for sets where it ranks among the rarest, so hot
  * tokens (huge posting lists) are exactly the ones prefixes
  * exclude — candidate volume concentrates on rare tokens without
  * any correctness-breaking cap.
  *
  * Scale shape: df counts and per-set ranks are one aggregation and
  * one per-set window each; every exchange carries (token, id) or
  * (id, id) pairs, and full sets travel only to verify CANDIDATES
  * (prefix-filtered, not corpus²). Verification is exact integer
  * arithmetic: `|∩|·q ≥ |∪|·p` for threshold p/q — no float on the
  * boundary.
  */
object SetSimJoin {

  /** All pairs with Jaccard(setCol_a, setCol_b) ≥ p/q. `setCol` must
    * be a DISTINCT-element array column. Returns (id_a, id_b, inter,
    * union_sz) with id_a < id_b.
    */
  def prefixFilterJoin(df: DataFrame, idCol: String, setCol: String,
                       p: Int, q: Int): DataFrame = {
    require(p > 0 && q > 0 && p <= q, s"threshold p/q must be in (0,1], got $p/$q")
    val sets = df.select(col(idCol).as("__id"), col(setCol).as("__set"))
      .withColumn("__n", size(col("__set")).cast("long"))
      .filter(col("__n") > 0)
      .localCheckpoint(true) // read 3× below (postings, both verify sides)
    val toks = sets.select(col("__id"), col("__n"),
      explode(col("__set")).as("__tok"))
    val dfreq = toks.groupBy(col("__tok"))
      .agg(count(lit(1)).as("__df"))
    // rank tokens per set in the canonical rare-first order
    val ranked = toks.join(dfreq, Seq("__tok"))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("__id"))
          .orderBy(col("__df").asc, col("__tok").asc)))
    // prefix length |X| - ceil(p*|X|/q) + 1; ceil(a/q) = (a+q-1) div q
    // in exact integer math (floor of the double division is exact:
    // p·|X| is far below 2^52)
    val need = floor((col("__n") * p + lit(q - 1)) / lit(q)).cast("long")
    val prefix = ranked
      .filter(col("__rank") <= col("__n") - need + 1)
      .select(col("__tok"), col("__id"), col("__n"), col("__rank"))
    // candidate pruning, both filters exactness-preserving (PPJoin):
    //  - SIZE: J ≥ p/q forces min(|A|,|B|)·q ≥ max(|A|,|B|)·p
    //    (|∩| ≤ min, |∪| ≥ max) — pairs of very different sizes never
    //    reach the verify join;
    //  - POSITION: under one global order, shared elements smaller
    //    than a shared token s rank below s in BOTH sets, so for s at
    //    ranks (ra, rb): |∩| ≤ min(ra,rb)−1 + 1 + min(na−ra, nb−rb).
    //    A qualifying pair satisfies the bound for SOME shared prefix
    //    token (the bound holds for every shared token and a
    //    qualifying pair shares at least one — prefix lemma), so keep
    //    a pair iff the MAX bound over its shared prefix tokens
    //    reaches the required overlap ⌈p·(na+nb)/(p+q)⌉.
    val joined = prefix.as("a").join(prefix.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id"))
      .filter(least(col("a.__n"), col("b.__n")) * q >=
        greatest(col("a.__n"), col("b.__n")) * p)
      .select(col("a.__id").as("__ida"), col("b.__id").as("__idb"),
        col("a.__n").as("__pna"), col("b.__n").as("__pnb"),
        (least(col("a.__rank"), col("b.__rank")) - 1 + lit(1) +
          least(col("a.__n") - col("a.__rank"),
            col("b.__n") - col("b.__rank"))).as("__ubound"))
    val cands = joined.groupBy(col("__ida"), col("__idb"))
      .agg(max(col("__ubound")).as("__ub"),
        first(col("__pna")).as("__pna"), first(col("__pnb")).as("__pnb"))
      .filter(col("__ub") >= floor(((col("__pna") + col("__pnb")) * p +
        lit(p + q - 1)) / lit(p + q)).cast("long"))
      .select(col("__ida"), col("__idb"))
    // exact verify on candidate pairs only
    cands
      .join(sets.select(col("__id").as("__ida"), col("__set").as("__sa"),
        col("__n").as("__na")), Seq("__ida"))
      .join(sets.select(col("__id").as("__idb"), col("__set").as("__sb"),
        col("__n").as("__nb")), Seq("__idb"))
      .withColumn("inter", size(array_intersect(col("__sa"), col("__sb"))).cast("long"))
      .withColumn("union_sz", col("__na") + col("__nb") - col("inter"))
      .filter(col("inter") * q >= col("union_sz") * p)
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("inter"), col("union_sz"))
  }
}
