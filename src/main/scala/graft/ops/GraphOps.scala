package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a pair graph — the principled
  * form of near-dup cluster resolution (the greedy "drop the greater key
  * of every pair" handles pairs, but a transitive chain a~b, b~c with no
  * a~c pair is one CLUSTER; real pipelines resolve LSH pairs into
  * components and keep one representative per component).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14). Each round is
  * two aggregate-then-join passes; the edge set converges to a star forest
  * — every node pointing at its component's minimum — in O(log² n) rounds
  * regardless of component diameter, unlike plain label propagation whose
  * round count is the graph DIAMETER (a pathological 10^6-link chain of
  * near-dups would take 10^6 rounds to propagate).
  *
  * Scale shape: neighborhood minima come from a `groupBy.min` (map-side
  * partial combine — a mega-degree node costs one partial per partition,
  * never a collected neighbor array) joined back to the edge list on the
  * grouping key; every pass is equi-join/hash-agg shaped. Lineage is
  * truncated every round with an eager localCheckpoint so plan depth stays
  * constant; the driver loop runs bounded O(log² n) iterations with one
  * scalar count per round for the convergence test.
  */
object GraphOps {

  /** Resolve an undirected pair list into connected components.
    *
    * @param pairs edge list; extra columns are ignored
    * @return (node, component) — `component` = the minimum node id in the
    *         node's component, for every node appearing in some pair
    *         (singletons are absent; [[clusterAssignments]] coalesces them
    *         to self)
    */
  /* maxIter: near-dup graphs converge in a handful of rounds (their
   * components are band-join cliques and short chains); the proven worst
   * case is O(log² n) rounds on adversarial path graphs, so the default
   * ceiling is generous for any plausible input and the require() below
   * fails LOUDLY (never silently-partial components) if something
   * pathological exceeds it. */
  def connectedComponents(pairs: DataFrame, keyA: String = "key_a",
                          keyB: String = "key_b", maxIter: Int = 128): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._

    // canonical directed form: (hi → lo), self-loops dropped
    var edges = pairs
      .select(greatest(col(keyA), col(keyB)).as("src"),
              least(col(keyA), col(keyB)).as("dst"))
      .filter($"src" =!= $"dst")
      .distinct()
      .localCheckpoint(true)

    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // LARGE-STAR: for each edge row (u, v) of the SYMMETRIZED graph with
      // v > u, emit (v, m(u)) where m(u) = min(N(u) ∪ {u}).
      val sym = edges.select($"src".as("u"), $"dst".as("v"))
        .unionAll(edges.select($"dst".as("u"), $"src".as("v")))
      val largeMins = sym.groupBy($"u")
        .agg(min($"v").as("mn"))
        .select($"u", least($"mn", $"u").as("m"))
      val large = sym.join(largeMins, "u")
        .filter($"v" > $"u")
        .select($"v".as("src"), $"m".as("dst"))
        .distinct()

      // SMALL-STAR: per node u over its canonical out-edges (all dst < u),
      // m(u) = min(dst); re-point every neighbor except m — and u itself —
      // at m. (u > m always, so the emitted edges stay canonical hi → lo.)
      val smallMins = large.groupBy($"src").agg(min($"dst").as("m"))
      val small = large.join(smallMins, "src")
        .filter($"dst" =!= $"m")
        .select($"dst".as("src"), $"m".as("dst"))
        .unionAll(smallMins.select($"src", $"m".as("dst")))
        .distinct()
        .localCheckpoint(true)

      // converged when the round was a no-op: every canonical edge appears
      // in BOTH the old and new sets (each side is distinct, so any group
      // with count != 2 is a one-sided edge)
      converged = small.unionAll(edges).groupBy($"src", $"dst")
        .agg(count(lit(1)).as("n")).filter($"n" =!= 2).limit(1).count() == 0
      edges = small
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // star forest: every src points at its component min; roots map to self
    edges.select($"src".as("node"), $"dst".as("component"))
      .unionAll(edges.select($"dst".as("node"), $"dst".as("component")))
      .distinct()
  }

  /** Cluster assignment for EVERY row of `df`: docs in no pair become
    * singleton clusters (cluster_id = own key). One left join against the
    * component map — scale-safe given the pair set.
    */
  def clusterAssignments(df: DataFrame, keyCol: String, pairs: DataFrame,
                         keyA: String = "key_a", keyB: String = "key_b"): DataFrame = {
    val comp = connectedComponents(pairs, keyA, keyB)
      .withColumnRenamed("node", keyCol)
    df.select(col(keyCol))
      .join(comp, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("component"), col(keyCol)).as("cluster_id"))
  }

  /** Keep one representative (the component-minimum key) per near-dup
    * cluster — the transitive-closure-correct form of
    * [[DedupOps.dropNearDuplicates]].
    */
  def keepClusterRepresentatives(df: DataFrame, keyCol: String, pairs: DataFrame): DataFrame = {
    val drop = connectedComponents(pairs)
      .filter(col("node") =!= col("component"))
      .select(col("node").as(keyCol))
    df.join(drop, Seq(keyCol), "left_anti")
  }

  /** LEAKAGE-SAFE train/val/test split: hash-split on the near-dup
    * CLUSTER id, not the document id, so every member of a near-dup
    * cluster lands in the same split — a near-copy of a training document
    * can never leak into the eval split (splitting by doc id alone puts
    * ~20% of each cluster's copies in val/test). Deterministic across
    * engines, runs and cluster sizes (portable md5-bucket split on the
    * component-minimum key).
    */
  def leakageSafeSplit(df: DataFrame, keyCol: String, pairs: DataFrame,
                       splits: Seq[(String, Int)], salt: String = "split"): DataFrame = {
    val assigned = clusterAssignments(df, keyCol, pairs)
    TableOps.hashSplit(assigned, "cluster_id", splits, salt)
  }
}
