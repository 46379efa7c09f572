package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list — the
  * clustering step a corpus-scale dedup pipeline runs AFTER pair generation
  * (MinHash/SimHash/Jaccard emit near-dup PAIRS; collapsing them to "keep
  * one representative per duplicate cluster" is a connected-components
  * problem over the pair graph).
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", ACM SoCC 2014 — public).
  * Each round is two hash-aggregations + two shuffles on node id; the round
  * count is O(log^2 n) INDEPENDENT of graph diameter, unlike naive
  * min-label propagation whose round count is the graph diameter (a chain
  * of 10^6 near-identical docs would need 10^6 rounds). Per-node state is
  * one scalar (the current minimum), never a collected neighbor list, so a
  * celebrity node with 10^9 duplicates costs nothing beyond its edge rows.
  */
object Components {

  /** Connected components of the undirected graph given by
    * (`srcCol`, `dstCol`) edge rows. Returns one row per distinct node id
    * appearing in `edges`: (id, component) where component is the MINIMUM
    * node id of the node's component (so `id === component` marks the
    * canonical representative). Self-loops are ignored; isolated nodes
    * (ids absent from `edges`) are the caller's to union in — see
    * `labelNodes`.
    *
    * Every round truncates lineage with an eager `localCheckpoint` — each
    * star pass references its input several times, so WITHOUT truncation
    * the logical plan grows ~12x per round and the driver dies in analysis
    * long before the data does (the same reason GraphFrames checkpoints
    * its CC iterations). When the session has a reliable checkpoint dir
    * set, `reliableEvery > 0` upgrades every that-many-th round to a
    * reliable `Dataset.checkpoint` so a lost executor on a real cluster
    * can't force a replay of the whole round history.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxRounds: Int = 50, reliableEvery: Int = 0): DataFrame = {
    val sc = edges.sparkSession.sparkContext
    var e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("u"),
              greatest(col(srcCol), col(dstCol)).cast("long").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var prev = signature(e)
    var round = 0
    var done = prev._1 == 0L
    while (!done && round < maxRounds) {
      val grown = smallStar(largeStar(e))
      val next =
        if (reliableEvery > 0 && (round + 1) % reliableEvery == 0 &&
            sc.getCheckpointDir.isDefined)
          grown.checkpoint(true)
        else
          grown.localCheckpoint(true)
      val sig = signature(next)
      e.unpersist(false)
      e = next
      done = sig == prev
      prev = sig
      round += 1
    }
    // fixpoint is a forest of stars (root = component min): members point
    // at the root; the roots label themselves
    val members = e.select(col("v").as("id"), col("u").as("component"))
    val roots = e.select(col("u")).distinct()
      .select(col("u").as("id"), col("u").as("component"))
    members.union(roots).distinct()
  }

  /** Component labels for EVERY id in `nodes` (one column `idCol`):
    * nodes untouched by any edge become their own singleton component. */
  def labelNodes(nodes: DataFrame, idCol: String,
                 edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val cc = connectedComponents(edges, srcCol, dstCol)
    nodes.select(col(idCol).cast("long").as("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id").as(idCol),
              coalesce(col("component"), col("id")).as("component"))
  }

  /** Large-star: every node attaches its STRICTLY LARGER neighbors to the
    * minimum of its closed neighborhood. One symmetrize + one min-agg +
    * one re-join on node id; emitted edges stay canonical (small, large). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))
    sym.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("m").as("u"), col("v")) // m <= u < v
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node attaches itself and all its SMALLER neighbors
    * to the smallest of them. Operates on the canonical orientation
    * directly (for edge (u, v), u < v, node v sees smaller neighbor u). */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy("v").agg(min("u").as("m"))
    val nbrs = e.join(mins, "v")
      .where(col("u") =!= col("m"))
      .select(col("m").as("u"), col("u").as("v")) // m < u by minimality
    val self = mins.select(col("m").as("u"), col("v")) // m < v
    nbrs.union(self).distinct()
  }

  /** Cheap fixpoint test: (edge count, order-independent XOR of edge
    * hashes — xor, not sum, so ANSI mode can't overflow; the edge set is
    * distinct so set-XOR is a sound set signature). */
  private def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}
