package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graft.CheckpointBlocks

/** Graph centrality — the iterative-fixpoint tier the clusters family
  * (connected components, `Dedup.dedupClusters`) does not cover:
  * PageRank over a weighted directed graph, the published
  * domain-quality signal for pretraining corpora (Common Crawl ranks
  * domains by centrality; CCNet-lineage pipelines weight or gate
  * documents by their domain's rank — Page et al. 1999 for the
  * algorithm, Brin & Page's d = 0.85 damping kept as the default).
  *
  * Exact-integer posture: ranks live in MICRO-units (node mass 10^6
  * at init) and every iteration is integer arithmetic only —
  * per-edge contribution `r(u)·w(u,v) div W(u)` (weighted out-share,
  * truncating div), dangling mass redistributed evenly `D div N`,
  * damping as `(85 · inflow) div 100`, teleport as the literal
  * `(100−85)·10^6 div 100` — so the fixpoint chain is bit-portable
  * and a DuckDB oracle replays every iteration exactly (the Lloyd-
  * iteration unroll posture). Truncation bleeds ≤ 1 micro-unit per
  * div — documented, deterministic, identical in both engines.
  *
  * Scale shape (what survives 100 TB): per iteration ONE join of the
  * rank frame into the edge frame on `src` (both hash-partitioned on
  * the join key; at a billion-edge graph this is the canonical
  * Pregel-style shuffle) + ONE groupBy-sum on `dst` (map-side
  * combinable) + a broadcast of the 1-row dangling aggregate; the
  * node frame never cross-products anything. Each iteration is
  * [[CheckpointBlocks.cut]] so the final plan is iteration-count-
  * independent (the PlanSpec lineage-cut contract) and no iteration
  * recomputes its predecessor.
  */
object Rank {

  /** PageRank after `iters` exact-integer iterations.
    *
    * @param edges (src long, dst long, w long) weighted directed
    *              edges, self-loops allowed but conventionally
    *              filtered upstream
    * @param nodes (node long) the FULL node domain — kept explicit
    *              (not inferred from edges) so isolated nodes hold
    *              teleport mass like every PageRank implementation
    * @return (node, rank_u) — micro-unit ranks; total mass =
    *         N·10^6 minus deterministic truncation bleed
    */
  def pageRank(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      cut: DataFrame => DataFrame = CheckpointBlocks.cut): DataFrame =
    pageRankChain(edges, nodes, iters, dampNum, dampDen, cut).last

  /** Every iterate r_0..r_iters of the [[pageRank]] chain (r_0 is the
    * uniform init) — the convergence curve's input: consecutive
    * iterates difference into the per-round L1 delta without
    * re-running shared prefixes.
    */
  def pageRankChain(
      edges: DataFrame,
      nodes: DataFrame,
      iters: Int,
      dampNum: Long = 85L,
      dampDen: Long = 100L,
      cut: DataFrame => DataFrame = CheckpointBlocks.cut,
      init: Option[DataFrame] = None): Seq[DataFrame] = {
    require(iters >= 1 && dampNum >= 0 && dampNum <= dampDen,
      s"bad args (iters=$iters, damping=$dampNum/$dampDen)")
    val unit = 1000000L
    // Out-weight per source, joined once onto the edge frame so each
    // iteration's contribution is a single codegen'd expression.
    val outW = edges.groupBy("src").agg(sum("w").as("w_out"))
    val ew = cut(edges.join(outW, Seq("src")))
    val n = nodes.count() // one distributed scalar (the semDedup posture)
    val teleport = ((dampDen - dampNum) * unit) / dampDen
    // WARM restarts (the incremental posture) seed from a standing
    // rank table instead of uniform mass — power iteration converges
    // from any positive start, and a post-fold graph's fixpoint is
    // near the pre-fold one, so a warm chain spends its rounds on
    // the DELTA (graph_pagerank_incr measures exactly that).
    var ranks = cut(init.getOrElse(nodes.select(col("node"), lit(unit).as("rank_u"))))
    val chain = Seq.newBuilder[DataFrame]
    chain += ranks
    for (_ <- 1 to iters) {
      val contrib = ew
        .join(ranks.select(col("node").as("src"), col("rank_u")), Seq("src"))
        .select(col("dst").as("node"),
          expr("(rank_u * w) DIV w_out").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      // Dangling mass: rank held by nodes with no out-edges.
      val dangling = ranks
        .join(outW.select(col("src").as("node")), Seq("node"), "left_anti")
        .agg(coalesce(sum("rank_u"), lit(0L)).as("dang"))
      ranks = cut(
        ranks.select(col("node"))
          .join(contrib, Seq("node"), "left")
          .crossJoin(dangling)
          .select(col("node"),
            (lit(teleport) +
              expr(s"($dampNum * (coalesce(inflow, 0L) + dang DIV $n)) DIV $dampDen"))
              .as("rank_u")))
      chain += ranks
    }
    chain.result()
  }
}
