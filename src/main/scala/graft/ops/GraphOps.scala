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

    // One job per round: a LAZY localCheckpoint is materialized by the
    // (count, order-invariant checksum) aggregate that doubles as the
    // convergence probe — the same action that truncates lineage yields
    // the round's fingerprint, replacing the old eager-checkpoint job PLUS
    // the full union-groupBy shuffle over both edge sets every round.
    // Equal sets ⇒ equal (count, sum-of-hashes), so the probe never
    // misses convergence; a probe HIT is confirmed by one authoritative
    // except() on the final candidate round only (a 2^-64 hash collision
    // would otherwise stop a round early — never silently-partial).
    // Checksum sums in decimal(38,0): ANSI mode throws on long-sum
    // overflow, and decimal is exact up to ~10^19 edges.
    def fingerprint(df: DataFrame): (Long, Option[BigDecimal]) = {
      val r = df.agg(count(lit(1)), sum(xxhash64($"src", $"dst").cast("decimal(38,0)"))).head()
      (r.getLong(0), Option(r.getDecimal(1)).map(BigDecimal(_)))
    }

    // canonical directed form: (hi → lo), self-loops dropped
    var edges = pairs
      .select(greatest(col(keyA), col(keyB)).as("src"),
              least(col(keyA), col(keyB)).as("dst"))
      .filter($"src" =!= $"dst")
      .distinct()
      .localCheckpoint(false)
    var prev = fingerprint(edges)

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
        .localCheckpoint(false)

      val cur = fingerprint(small)
      // probe hit (equal count + checksum) → authoritative set equality:
      // both sides are distinct and equal-sized, so an empty except()
      // proves the round was a no-op
      converged = cur == prev &&
        small.except(edges).limit(1).count() == 0
      edges = small
      prev = cur
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

  /** Leakage-safe split REUSING an already-maintained cluster map — e.g.
    * [[graft.stream.DedupMaintenance.clustersAt]], whose expensive legs
    * (shingling, banded probing, CC) were paid incrementally per
    * maintenance window. The whole-corpus split pass then costs ONE left
    * join + the hash projection instead of re-running LSH + CC over the
    * corpus (the checksum-short-circuit philosophy of the reference's
    * grapher upsert, `etl/grapher_import.py:287-289`, applied to cluster
    * state). Documents absent from the map (never near-dup'd, or added
    * after its version) fall back to singleton clusters — same contract
    * as [[clusterAssignments]].
    *
    * @param clusterMap (key, cluster_id) — first column is matched to
    *                   `keyCol` by POSITION so a map keyed `key` joins a
    *                   corpus keyed `doc_id` without a rename dance
    */
  def leakageSafeSplitFromClusters(df: DataFrame, keyCol: String, clusterMap: DataFrame,
                                   splits: Seq[(String, Int)],
                                   salt: String = "split"): DataFrame = {
    val cm = clusterMap.select(col(clusterMap.columns(0)).as(keyCol), col("cluster_id"))
    val assigned = df.select(col(keyCol))
      .join(cm, Seq(keyCol), "left")
      .select(col(keyCol), coalesce(col("cluster_id"), col(keyCol)).as("cluster_id"))
    TableOps.hashSplit(assigned, "cluster_id", splits, salt)
  }
}
