package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import IterCheckpoint.Pinnable

/** Document-relationship graph over an edge-list DataFrame
  * (SURVEY.md §1.1 Graph, §2.3 J5/J6 — graph.go:35-142). Plain DataFrames
  * suffice for the reference's semantics; nodes are derived, never stored.
  */
object GraphOps {

  /** J5: node set = DISTINCT sources ∪ DISTINCT targets (graph.go:123-142). */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("source_doc_id").as("doc_id"))
      .union(edges.select(col("target_doc_id").as("doc_id")))
      .distinct()

  /** J6: edges touching a document (graph.go:99-120). */
  def edgesFor(edges: DataFrame, docId: String): DataFrame =
    edges.filter(col("source_doc_id") === docId || col("target_doc_id") === docId)

  /** Node-link response shape (graph_handler.go:34-90): nodes + edges with
    * degree per node.
    */
  def nodeLink(edges: DataFrame): (DataFrame, DataFrame) = {
    val degree = nodes(edges).join(
      edges.select(col("source_doc_id").as("doc_id"))
        .union(edges.select(col("target_doc_id").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("degree")),
      Seq("doc_id"), "left")
      .na.fill(0, Seq("degree"))
    (degree, edges)
  }

  /** Contradiction-graph construction (analyst.go:294-377 flow): k-NN
    * similar-document pairs judged by the oracle become typed edges.
    * `pairs` = (query_id, neighbor_id, score); judgment is deterministic
    * via [[LLMOracle]] in tests/offline.
    */
  def contradictionEdges(
      pairs: DataFrame, docs: DataFrame, idCol: String, textCol: String,
      oracle: LLMOracle): DataFrame = {
    val judge = udf((a: String, b: String) =>
      oracle.yesNo("Does document A contradict document B?", a + "\n" + b))
    pairs
      .join(docs.select(col(idCol).as("query_id"), col(textCol).as("text_a")), "query_id")
      .join(docs.select(col(idCol).as("neighbor_id"), col(textCol).as("text_b")), "neighbor_id")
      .filter(judge(col("text_a"), col("text_b")))
      .select(
        col("query_id").cast("string").as("source_doc_id"),
        col("neighbor_id").cast("string").as("target_doc_id"),
        lit("contradicts").as("relationship_type"),
        concat(lit("similarity="), col("score")).as("description"),
        current_timestamp().as("created_at"))
  }

  /** Power-iteration PageRank over a directed edge list — the link-graph
    * quality signal a crawl-scale curation pipeline ranks domains and pages
    * by (the CommonCrawl/Gopher "page quality from graph structure" family;
    * north-star extension, the reference has no graph analytics).
    *
    * `edges` = (src, dst) rows, self-loops and duplicates allowed on input
    * (deduplicated here — parallel edges would double-count contributions).
    * PR_0 = 1/N; PR_{t+1}(v) = (1−d)/N + d·(Σ_{u→v} PR_t(u)/outdeg(u)
    * + danglingMass_t/N), the dangling (no-out-edge) mass redistributed
    * uniformly so the scores stay a probability distribution.
    *
    * Scale shape (billions of nodes): the classic Pregel cost — per
    * iteration ONE shuffle for the contribution `groupBy(dst)` and one
    * equi-join of the rank vector against the (static) out-degree table;
    * ranks are `localCheckpoint`ed per round so the iterative lineage never
    * compounds (the q37 connected-components discipline), and edges +
    * degrees are checkpointed ONCE and reused every round. The dangling
    * mass is a scalar aggregate per round (a cheap count-shaped job), never
    * a driver-side collect of rank rows.
    *
    * Determinism/oracle contract: per-edge contributions sum through exact
    * DECIMAL(28,12) (order-free, the q38 BM25 discipline), every double
    * expression is evaluated in the same operation order as the DuckDB
    * twin, and ranks snap to 9 decimals per round so iteration inputs stay
    * on a clean grid.
    */
  def pageRank(
      edges: DataFrame, iterations: Int = 3, damping: Double = 0.85): DataFrame =
    pageRankImpl(edges, iterations, damping, seeds = None)

  /** PERSONALIZED PageRank: restart mass lands uniformly on `seeds` (a
    * one-column node DataFrame) instead of all nodes — ranks become
    * graph-proximity-to-the-seed-set, the topic/entity-conditioned
    * relevance signal ("pages close to these trusted domains"). Initial
    * mass, the (1−d) restart AND the dangling redistribution all follow
    * the restart vector (the standard PPR formulation, so scores stay a
    * probability distribution). Same iteration cost and determinism
    * contract as [[pageRank]]; seeds not present in the graph contribute
    * restart mass to themselves only (they are added as rank-carrying
    * nodes with no edges).
    */
  def personalizedPageRank(
      edges: DataFrame, seeds: DataFrame, iterations: Int = 3,
      damping: Double = 0.85): DataFrame =
    pageRankImpl(edges, iterations, damping, seeds = Some(seeds))

  /** WEIGHTED PageRank: `edges` carries (src, dst, w); a node's rank flows
    * to its out-neighbors proportionally to edge weight (w / Σ_out w)
    * instead of uniformly — the crawl-graph reality where link
    * multiplicity matters. Parallel (src, dst) rows collapse by SUMMING
    * weights (feed w = 1.0 per raw link and multiplicities emerge);
    * non-positive weights are dropped. Weight and weight-sum aggregation
    * run through DECIMAL(28,12) so integral weights stay exact and
    * order-free; otherwise the iteration cost and determinism contract
    * are [[pageRank]]'s.
    */
  def weightedPageRank(
      edges: DataFrame, iterations: Int = 3, damping: Double = 0.85): DataFrame =
    pageRankImpl(edges, iterations, damping, seeds = None, weighted = true)

  /** Per-node triangle counts over the undirected view of a directed edge
    * list — the local graph-density signal (clustering/community structure;
    * spam-farm detection in crawl curation ranks by triangle participation;
    * north-star extension, the reference has no graph analytics).
    *
    * Self-loops and parallel/reversed duplicates are collapsed first (the
    * canonical undirected edge is (min(src,dst), max(src,dst))); output is
    * (node, triangles) for every node on ≥1 triangle.
    *
    * Scale shape: the classic degree-ordered node-iterator. Every edge is
    * oriented from its lower-(degree, id) endpoint to the higher one, so a
    * triangle is found EXACTLY once — as a wedge at its min-rank vertex
    * closed by the canonical undirected edge — and the per-node oriented
    * out-degree is O(√m), bounding the wedge build at O(m^1.5) total work
    * spread across ordinary equi-join shuffles. No driver-side state: two
    * self-joins and one aggregation, all on (long, long) pairs.
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = canonicalUndirected(edges)
    triangleCountsFromUnd(und, undirectedDegrees(und))
  }

  /** Canonical undirected edge set: (min, max) pairs, self-loops dropped,
    * parallel/reversed duplicates collapsed. Checkpointed — every consumer
    * scans it more than once.
    */
  private[graft] def canonicalUndirected(edges: DataFrame): DataFrame =
    edges.select(
        least(col("src").cast("long"), col("dst").cast("long")).as("u"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .iterCheckpoint()

  private def undirectedDegrees(und: DataFrame): DataFrame =
    und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))

  private def triangleCountsFromUnd(und: DataFrame, deg: DataFrame): DataFrame = {
    val lowerFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
      .select(
        when(lowerFirst, col("u")).otherwise(col("v")).as("a"),
        when(lowerFirst, col("v")).otherwise(col("u")).as("b"))
      .iterCheckpoint() // self-joined below — don't recompute the degree join twice
    // wedge (a, n1, n2): two out-neighbors of the apex, canonicalized by id
    // so the closing probe hits the canonical undirected edge form
    val wedges = oriented.select(col("a"), col("b").as("n1"))
      .join(oriented.select(col("a"), col("b").as("n2")), "a")
      .filter(col("n1") < col("n2"))
    val tri = wedges.join(und,
        wedges("n1") === und("u") && wedges("n2") === und("v"))
      .select(col("a"), col("n1").as("b"), col("n2").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient per node: cc(v) = 2·T(v) / (d(v)·(d(v)−1))
    * over the undirected view — closed-wedge fraction, the per-node
    * community-density companion to [[triangleCounts]] (0 for degree < 2,
    * the standard convention). Output: (node, degree, triangles, clustering)
    * for EVERY node of the graph, triangle-free nodes included.
    *
    * Same cost shape as triangleCounts plus one left join of the (node,
    * degree) table against the triangle counts. Double arithmetic is a
    * single fixed-shape expression over exact integers (2·T first, one
    * divide), so both engines walk identical IEEE doubles.
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val und = canonicalUndirected(edges)
    val deg = undirectedDegrees(und).iterCheckpoint() // feeds both the
    val tri = triangleCountsFromUnd(und, deg)          // orientation and the cc join
    val degD = col("degree").cast("double")
    deg.select(col("node"), col("deg").as("degree"))
      .join(tri, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          lit(2.0) * col("triangles").cast("double") / (degD * (degD - lit(1.0))))
          .otherwise(lit(0.0)))
  }

  /** HITS hubs-and-authorities over a directed edge list (Kleinberg's
    * mutual-reinforcement pair): auth(v) = Σ_{u→v} hub(u) then hub(u) =
    * Σ_{u→v} auth(v), each half-step L1-normalized so scores stay a
    * probability distribution. The link-graph complement to [[pageRank]]:
    * authorities are heavily-cited pages, hubs are good citation lists —
    * in crawl curation, seed-list quality vs destination quality.
    *
    * Scale shape: per iteration two contribution shuffles (groupBy(dst),
    * then groupBy(src)) against the static edge list, plus two scalar L1
    * totals (cheap aggregate jobs, never a collect of score rows); scores
    * `localCheckpoint`ed per half-step so lineage never compounds. Edges
    * are checkpointed once.
    *
    * Determinism/oracle contract (the q4b recipe): hub₀ = auth₀ = 1
    * exactly; contributions and L1 totals sum through exact DECIMAL(28,12)
    * (order-free), every double expression shares the DuckDB twin's
    * operation order, and each half-step's normalized scores snap to a
    * 9-decimal grid.
    */
  def hits(edges: DataFrame, iterations: Int = 2): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .iterCheckpoint()
    require(nodes.count() > 0, "hits needs a non-empty graph")

    // one normalized half-step: sum the opposite score over the edges into
    // `outCol`-keyed groups, L1-normalize, snap to the 9-decimal grid
    def halfStep(scores: DataFrame, inCol: String,
        joinKey: String, outKey: String, outCol: String): DataFrame = {
      val raw = e
        .join(scores.select(col("node"), col(inCol).as("__s")),
          e(joinKey) === col("node"))
        .select(col(outKey),
          col("__s").cast("decimal(28,12)").as("__c"))
        .groupBy(outKey).agg(sum(col("__c")).as("__sum"))
        .iterCheckpoint()
      val total = raw.agg(sum(col("__sum")).as("t")).head().getDecimal(0) match {
        case null => 0.0
        case d    => d.doubleValue()
      }
      require(total > 0, "hits: a half-step summed to zero (degenerate graph)")
      nodes.join(raw, nodes("node") === raw(outKey), "left")
        .select(col("node"),
          round(coalesce(col("__sum").cast("double"), lit(0.0)) / lit(total), 9)
            .as(outCol))
        .iterCheckpoint()
    }

    var hub = nodes.withColumn("hub", lit(1.0))
    var auth = nodes.withColumn("auth", lit(1.0))
    for (_ <- 1 to iterations) {
      auth = halfStep(hub, "hub", "src", "dst", "auth")
      hub = halfStep(auth, "auth", "dst", "src", "hub")
    }
    hub.join(auth, "node").select(col("node"), col("hub"), col("auth"))
  }

  /** Synchronous label-propagation community detection over the undirected
    * view: label₀(v) = v; each round every node adopts the most frequent
    * label among its neighbors, ties broken by smallest label (fully
    * deterministic — no random order, so a fixed iteration count is
    * reproducible and oracle-able; classic LPA oscillation on bipartite
    * structures is bounded by the iteration cap, which callers choose).
    * Communities are the label groups after `iterations` rounds — the
    * coarse mirror-site/content-farm grouping signal next to
    * [[Dedup.connectedComponents]]'s exact reachability clusters.
    *
    * Scale shape: per round TWO map-side-combinable aggregation shuffles and
    * nothing else — `groupBy(node, label)` counts the votes (partial-
    * aggregated map-side), then `groupBy(node).agg(min(struct(-n, label)))`
    * picks the winner: struct comparison is lexicographic, so the minimum of
    * (-count, label) IS the (count desc, label asc) winner, computed with
    * bounded per-task state. The earlier window formulation
    * (`max(n).over(Window.partitionBy(node))`) had to materialize ALL of one
    * node's vote rows in a single window partition — and in early rounds a
    * web-graph hub has distinct-labels ≈ degree (label₀ = node id), so a
    * 10⁷-degree supernode became one straggler partition; `max(...).over`
    * is not rank-like, so WindowGroupLimit pushdown never applied. The
    * struct-min aggregate pre-combines a supernode's votes inside every map
    * task instead. Labels localCheckpointed per round; the adjacency list is
    * built and checkpointed once. Exact integers end to end.
    */
  def labelPropagation(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val und = canonicalUndirected(edges)
    val adj = und.select(col("u").as("node"), col("v").as("nbr"))
      .union(und.select(col("v").as("node"), col("u").as("nbr")))
      .iterCheckpoint()
    var labels = adj.select(col("node")).distinct()
      .withColumn("label", col("node"))
      .iterCheckpoint()
    for (_ <- 1 to iterations) {
      labels = lpaRound(adj, labels).iterCheckpoint()
    }
    labels
  }

  /** One synchronous LPA round (un-checkpointed) — exposed so the plan-shape
    * spec can assert the winner selection stays a map-side-combinable
    * aggregate (no Window node) without re-deriving the pipeline.
    */
  private[graft] def lpaRound(adj: DataFrame, labels: DataFrame): DataFrame =
    adj
      .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
      .groupBy("node", "label").agg(count(lit(1)).as("n"))
      .groupBy("node")
      .agg(min(struct((-col("n")).as("neg_n"), col("label"))).as("win"))
      .select(col("node"), col("win.label").as("label"))

  /** Directed BFS hop distance from a seed set, capped at `maxHops` — the
    * crawl-depth signal (how many link hops from the trusted seed list a
    * page sits; Common-Crawl-style frontier policies cap exactly this).
    * Output: (node, dist) for every node reachable within the cap, seeds
    * at distance 0. Unreached nodes are absent (callers treat missing as
    * infinity).
    *
    * Scale shape: per hop ONE equi-join of the current distance table
    * against the static edge list plus a min-aggregation — the Pregel
    * frontier pattern with the same per-round localCheckpoint lineage
    * discipline as [[pageRank]]. The distance table is keyed by node and
    * never collected; maxHops bounds the serial factor. Exact integers.
    */
  def seedDistances(
      edges: DataFrame, seeds: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .iterCheckpoint()
    for (_ <- 1 to maxHops) {
      val next = e.join(dist, e("src") === dist("node"))
        .select(e("dst").as("node"), (col("dist") + 1).as("dist"))
      dist = dist.union(next)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .iterCheckpoint()
    }
    dist
  }

  /** Weighted single-source(-set) shortest paths — [[seedDistances]]'s
    * weighted upgrade: `maxHops` Bellman–Ford relaxation rounds, so the
    * result is exactly "minimum total weight over walks of ≤ maxHops
    * edges from any seed" (the hop bound is the semantics, not an
    * approximation — and what makes the operator replayable and safe
    * under arbitrary weights: no negative-cycle divergence).
    *
    * Shape per round: one shuffle join + one map-side-combinable min
    * aggregation; per-round localCheckpoint cuts the lineage (the q4b
    * iterative discipline); integer weights keep every distance exact.
    */
  def weightedSeedDistances(
      edges: DataFrame, seeds: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges
      .select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"), col("w").cast("long").as("w"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    var dist = seeds.select(col("node").cast("long").as("node"))
      .distinct()
      .withColumn("dist", lit(0L))
      .iterCheckpoint()
    for (_ <- 1 to maxHops) {
      val relaxed = e.join(dist, e("src") === dist("node"))
        .select(e("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.union(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .iterCheckpoint()
    }
    dist
  }

  /** Deterministic "random" walks — one walker per node, `steps` hops,
    * each hop choosing the out-neighbor with the maximal md5 draw over
    * (walker, step, neighbor) — the q4d/q4e hash-draw idiom lifted to
    * graph traversal. The walk corpus a node2vec-style embedding trainer
    * consumes, but REPRODUCIBLE: same graph in, same walks out, on any
    * cluster, any partitioning, any retry (a seeded RNG walk is
    * partition-order-dependent; a hash draw is not). Walkers stop at
    * dangling nodes (columns stay NULL after).
    *
    * Scale shape: per hop one equi-join of positions against the static
    * edge list and one per-walker top-1 (row_number over the draw —
    * Spark plants WindowGroupLimit, so the per-walker state is the
    * candidate heap, bounded by out-degree); positions localCheckpointed
    * per hop. Output: (walker, s1..sN).
    */
  def deterministicWalks(edges: DataFrame, steps: Int = 3): DataFrame = {
    require(steps >= 1 && steps <= 8, s"steps must be in [1,8], got $steps")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("walker").orderBy(col("draw").desc, col("nxt").asc)
    var walks = e.select(col("src").as("walker"))
      .union(e.select(col("dst").as("walker")))
      .distinct()
      .withColumn("cur", col("walker"))
      .iterCheckpoint()
    for (i <- 1 to steps) {
      val next = e.join(walks.select(col("walker"), col("cur")), e("src") === col("cur"))
        .select(col("walker"), e("dst").as("nxt"))
        .withColumn("draw", conv(substring(md5(concat_ws("|",
          col("walker"), lit(i), col("nxt"))), 1, 15), 16, 10).cast("long"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("walker"), col("nxt").as(s"s$i"))
      walks = walks.join(next, Seq("walker"), "left")
        .drop("cur").withColumn("cur", col(s"s$i"))
        .iterCheckpoint()
    }
    walks.drop("cur")
  }

  private def pageRankImpl(
      edges: DataFrame, iterations: Int, damping: Double,
      seeds: Option[DataFrame], weighted: Boolean = false): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e = if (weighted)
      edges
        .select(col("src").cast("long").as("src"),
          col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
        .filter(col("src") =!= col("dst") && col("w") > 0)
        .groupBy("src", "dst")
        .agg(sum(col("w").cast("decimal(28,12)")).cast("double").as("w"))
        .iterCheckpoint()
    else edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    val seedNodes = seeds.map(_.select(col("node").cast("long").as("node"))
      .distinct().iterCheckpoint())
    val graphNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
    val nodes = seedNodes.fold(graphNodes)(graphNodes.union(_))
      .distinct()
      .iterCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val outdeg = if (weighted)
      e.groupBy("src")
        .agg(sum(col("w").cast("decimal(28,12)")).cast("double").as("outdeg"))
        .iterCheckpoint()
    else e.groupBy("src").agg(count(lit(1)).as("outdeg")).iterCheckpoint()

    // restart vector: uniform over all nodes, or uniform over the seeds
    val nodesR = seedNodes match {
      case None => nodes.withColumn("rv", lit(1.0 / n))
      case Some(s) =>
        val sCount = s.count()
        require(sCount > 0, "personalized PageRank needs a non-empty seed set")
        nodes.join(s.withColumn("__seed", lit(1)), Seq("node"), "left")
          .select(col("node"),
            when(col("__seed").isNotNull, lit(1.0 / sCount))
              .otherwise(lit(0.0)).as("rv"))
          .iterCheckpoint()
    }

    var pr = nodesR.withColumn("pr", col("rv"))
    for (_ <- 1 to iterations) {
      val ranked = pr.join(outdeg, pr("node") === outdeg("src"), "left")
        .select(col("node"), col("pr"), col("outdeg"))
      val danglingMass = ranked.filter(col("outdeg").isNull)
        .agg(sum(col("pr").cast("decimal(28,12)")).as("m"))
        .head().getDecimal(0) match {
          case null => 0.0
          case d    => d.doubleValue()
        }
      val contribVal =
        if (weighted) col("pr") * (col("w") / col("outdeg"))
        else col("pr") / col("outdeg")
      val contrib = e
        .join(ranked.filter(col("outdeg").isNotNull),
          e("src") === col("node"))
        .select(col("dst"), contribVal.cast("decimal(28,12)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("csum"))
      // uniform keeps the exact q4b expression tree; personalized swaps the
      // constant restart for (1−d)·rv and sends dangling mass through rv too
      val csumD = coalesce(col("csum").cast("double"), lit(0.0))
      val newPr = seedNodes match {
        case None =>
          lit((1.0 - damping) / n) + lit(damping) *
            (csumD + lit(danglingMass / n))
        case Some(_) =>
          lit(1.0 - damping) * col("rv") + lit(damping) *
            (csumD + lit(danglingMass) * col("rv"))
      }
      pr = nodesR.join(contrib, nodesR("node") === contrib("dst"), "left")
        .select(col("node"), col("rv"), round(newPr, 9).as("pr"))
        .iterCheckpoint()
    }
    pr.select(col("node"), col("pr"))
  }

  /** k-core decomposition by iterative peeling over the undirected view:
    * repeatedly drop nodes with degree < k (degree recomputed within the
    * surviving subgraph) until a round removes nothing or `maxRounds` is
    * hit. Output: (node, degree) for the surviving core, degree measured
    * inside it — the link-graph "dense center" signal (spam farms and
    * boilerplate interlinks concentrate in high cores; low-core pages are
    * the periphery a crawl frontier trims first).
    *
    * Peeling is confluent: the fixed point is unique regardless of removal
    * order (Matula–Beck), so a fixed unrolled round count is oracle-able —
    * after convergence extra rounds are identities, which is what lets the
    * DuckDB twin unroll a constant number of rounds while the operator
    * early-stops.
    *
    * Scale shape: per round one map-side-combinable degree aggregation
    * over the live edge list plus two semi-joins to drop edges touching
    * peeled nodes; the convergence check is a scalar count comparison
    * (never a node collect). Live edges localCheckpointed per round (the
    * [[pageRank]] lineage discipline); `maxRounds` bounds the serial
    * factor. Exact integers end to end.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 10): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var live = canonicalUndirected(edges)
    var degrees = kCoreDegrees(live)
    var nLive = degrees.count()
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val keep = degrees.filter(col("degree") >= k).select(col("node"))
      val nKeep = keep.count()
      if (nKeep == nLive) converged = true
      else {
        live = live
          .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
          .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
          .iterCheckpoint()
        degrees = kCoreDegrees(live)
        nLive = degrees.count()
      }
      round += 1
    }
    degrees.filter(col("degree") >= k)
  }

  /** Undirected degree table (node, degree) of a (u, v) edge list. */
  private def kCoreDegrees(und: DataFrame): DataFrame =
    und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))

  /** Degree assortativity coefficient (Newman 2002, public literature):
    * the Pearson correlation of endpoint degrees over the undirected edge
    * set, each edge counted in BOTH orientations (the standard undirected
    * convention — and what makes the two marginals identical, so
    * r = cov/var of one marginal). Positive = hubs link to hubs (social
    * graphs), negative = hubs link to leaves (the web / infrastructure) —
    * the one-number structural fingerprint a crawl-graph audit starts
    * with.
    *
    * Output: one row — `m2` (directed half-edge count = 2·edges),
    * `mean_degree` (over edge endpoints, i.e. degree-weighted),
    * `assortativity` (6-rounded; null for degree-regular graphs, where
    * the variance is 0).
    *
    * Scale shape: degree join onto the canonical edge list (two equality
    * joins, the triangleCounts pattern) then ONE map-side-combinable
    * global aggregate over exact integer decimal sums — degrees are
    * integers, so every power sum is exact and order-free. No windows,
    * no collect.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val und = canonicalUndirected(edges)
    val deg = undirectedDegrees(und)
    val joined = und
      .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
    val pairs = joined.select(col("du").as("x"), col("dv").as("y"))
      .union(joined.select(col("dv").as("x"), col("du").as("y")))
    val agg = pairs.agg(
      count(lit(1)).as("m2"),
      sum(col("x").cast("decimal(38,0)")).as("__sx"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("__sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("__sxx"))
    val n = col("m2").cast("double")
    val mx = col("__sx").cast("double") / n
    val cov = col("__sxy").cast("double") / n - mx * mx
    val varx = col("__sxx").cast("double") / n - mx * mx
    agg.select(col("m2"), round(mx, 6).as("mean_degree"),
      when(varx > 0, round(cov / varx, 6)).as("assortativity"))
  }

  /** Newman–Girvan modularity of a community assignment over the
    * undirected view: Q = Σ_c [ e_c/m − (d_c/2m)² ] where e_c = edges
    * internal to community c, d_c = summed degree of its nodes, m = total
    * undirected edges — THE objective community detection optimizes, and
    * the quality gate on [[labelPropagation]]'s output (Q near 0 says the
    * "communities" are no better than random wiring).
    *
    * Input `labels`: (node, label). Output, one row per community:
    * `community`, `n_nodes`, `degree_sum`, `internal_edges`, `q_term`
    * (9-snapped per-community contribution) and the repeated global
    * `modularity` (6-rounded) — the q6s contingency-table shape.
    *
    * Scale shape: two label equality joins onto the canonical edge list
    * (community of each endpoint), map-side-combinable per-community
    * aggregates, and ONE window over the AGGREGATED community table
    * (domain-bounded — communities, not nodes; the q6d contract). m joins
    * back as a broadcast 1-row aggregate.
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = canonicalUndirected(edges)
    val deg = undirectedDegrees(und)
    val lab = labels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label")).iterCheckpoint()

    val mTotal = und.agg(count(lit(1)).as("__m"))
    val internal = und
      .join(lab.select(col("node").as("u"), col("label").as("__lu")), "u")
      .join(lab.select(col("node").as("v"), col("label").as("__lv")), "v")
      .filter(col("__lu") === col("__lv"))
      .groupBy(col("__lu").as("community"))
      .agg(count(lit(1)).as("internal_edges"))
    val perComm = deg.join(lab, "node")
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))

    val all = org.apache.spark.sql.expressions.Window.partitionBy(lit(1))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val m = col("__m").cast("double")
    val half = col("degree_sum").cast("double") / (lit(2.0) * m)
    val qTerm = round(
      col("internal_edges").cast("double") / m - half * half, 9)
    perComm
      .join(internal, Seq("community"), "left")
      .na.fill(0L, Seq("internal_edges"))
      .crossJoin(broadcast(mTotal))
      .withColumn("q_term", qTerm)
      .withColumn("modularity",
        round(sum(col("q_term").cast("decimal(28,9)")).over(all)
          .cast("double"), 6))
      .select(col("community"), col("n_nodes"), col("degree_sum"),
        col("internal_edges"), col("q_term"), col("modularity"))
  }

  /** Spectral bisection sketch: a deflated power iteration toward the
    * Fiedler direction of the random-walk matrix P = D⁻¹A. Start from a
    * deterministic ±1 vector (node parity), repeat: x ← P·x (neighbor
    * mean — one join + DECIMAL-summed groupBy per round), subtract the
    * degree-weighted mean (projects out the trivial all-ones
    * eigendirection — a scalar aggregate), rescale by max|x| (scalar),
    * snap to the 9-grid, localCheckpoint. The sign of the result is the
    * 2-way cut. Same per-round shape and cost as [[pageRank]], so the
    * unrolled-CTE oracle walks identical doubles.
    *
    * Returns (node, x, side) — side ∈ {0, 1}, sign(x) with zero → 0.
    */
  def spectralSplit(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val und = canonicalUndirected(edges)
    val adj = und.select(col("u").as("a"), col("v").as("b"))
      .union(und.select(col("v").as("a"), col("u").as("b")))
      .iterCheckpoint()
    val deg = adj.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("deg"))
      .iterCheckpoint()
    var x = deg.withColumn("x",
      when(pmod(col("node"), lit(2L)) === 0, lit(1.0)).otherwise(lit(-1.0)))
    for (_ <- 1 to iterations) {
      val nbr = adj.join(x.select(col("node"), col("x")),
          adj("b") === col("node"))
        .groupBy(adj("a").as("node"))
        .agg(sum(col("x").cast("decimal(28,12)")).as("sx"))
      val stepped = deg.join(nbr, Seq("node"), "left")
        .withColumn("px",
          coalesce(col("sx").cast("double"), lit(0.0)) /
            col("deg").cast("double"))
      val mean = stepped.agg(
        (sum((col("px") * col("deg").cast("double")).cast("decimal(28,12)"))
          .cast("double") /
          sum(col("deg")).cast("double")).as("mu"))
      val centered = stepped.crossJoin(broadcast(mean))
        .withColumn("cx", col("px") - col("mu"))
      val scale = centered.agg(max(abs(round(col("cx"), 9))).as("mx"))
      x = centered.crossJoin(broadcast(scale))
        .withColumn("x",
          when(col("mx") > 0, round(round(col("cx"), 9) / col("mx"), 9))
            .otherwise(lit(0.0)))
        .select(col("node"), col("deg"), col("x"))
        .iterCheckpoint()
    }
    x.select(col("node"), col("x"),
      when(col("x") > 0, lit(1)).otherwise(lit(0)).as("side"))
  }

  /** Katz centrality by the truncated power series x ← 1 + α·Aᵀx (every
    * walk into a node, geometrically damped by length). Same iteration
    * discipline as [[pageRank]]: one in-edge contribution shuffle per
    * round, per-round DECIMAL(28,12) contribution sums snapped to the
    * 9-decimal grid, per-round localCheckpoint to pin lineage — so the
    * unrolled-CTE oracle walks identical doubles. α must stay below
    * 1/λ_max for the series to converge; the truncated form is defined
    * for any α, the caller owns the spectral bound.
    */
  def katz(edges: DataFrame, alpha: Double, iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .iterCheckpoint()
    var x = nodes.withColumn("katz", lit(1.0))
    for (_ <- 1 to iterations) {
      val contrib = e.join(x.select(col("node"), col("katz")),
          e("src") === col("node"))
        .groupBy(e("dst").as("node"))
        .agg(sum(col("katz").cast("decimal(28,12)")).cast("double").as("csum"))
      x = nodes.join(contrib, Seq("node"), "left")
        .withColumn("katz",
          round(lit(1.0) + lit(alpha) *
            coalesce(col("csum"), lit(0.0)), 9))
        .drop("csum")
        .iterCheckpoint()
    }
    x
  }

  /** Harmonic centrality of a bounded seed set: H(s) = Σ_{v≠s reachable
    * within maxHops} 1/d(s,v) — the closeness variant that is defined on
    * disconnected graphs (unreachable nodes contribute 0 instead of
    * poisoning the mean; Boldi–Vigna's axiomatic pick). All-pairs
    * closeness is not a 100 TB operation; centrality OF a bounded seed
    * set (top-k hubs, the trusted crawl list) is — so seeds are an
    * explicit input and the state is (source, node) distance pairs,
    * bounded by |seeds| × reach.
    *
    * Shape: [[seedDistances]] with a source tag — per hop ONE equi-join
    * of the tagged frontier against the static edge list plus a
    * map-side-combinable min, per-hop localCheckpoint. The 1/d terms sum
    * through DECIMAL(28,12) on the 12-grid so the recursive-CTE oracle
    * replays the exact doubles.
    *
    * Output: (node, reached, total_dist, harmonic) — one row per seed
    * that reaches at least one other node (a sink seed is absent =
    * centrality 0, the [[seedDistances]] absent-is-infinity convention);
    * `total_dist` is the exact integer distance sum (closeness'
    * denominator over the reached set), `harmonic` rounded to 6.
    */
  def harmonicCentrality(
      edges: DataFrame, seeds: DataFrame, maxHops: Int = 4): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    var dist = seeds.select(col("node").cast("long").as("source"))
      .distinct()
      .select(col("source"), col("source").as("node"), lit(0L).as("dist"))
      .iterCheckpoint()
    for (_ <- 1 to maxHops) {
      val next = e.join(dist, e("src") === dist("node"))
        .select(col("source"), e("dst").as("node"),
          (col("dist") + 1).as("dist"))
      dist = dist.select(col("source"), col("node"), col("dist")).union(next)
        .groupBy("source", "node").agg(min(col("dist")).as("dist"))
        .iterCheckpoint()
    }
    dist.filter(col("dist") > 0)
      .groupBy(col("source").as("node"))
      .agg(
        count(lit(1)).as("reached"),
        sum(col("dist")).as("total_dist"),
        sum(round(lit(1.0) / col("dist").cast("double"), 12)
          .cast("decimal(28,12)")).as("hsum"))
      .select(col("node"), col("reached"), col("total_dist"),
        round(col("hsum").cast("double"), 6).as("harmonic"))
  }

  /** Bounded-radius Brandes betweenness from a source set: for each
    * source s, a BFS shortest-path DAG truncated at `maxDepth`, path
    * counts σ accumulated level by level, then the backward dependency
    * sweep δ(v) = Σ_{w ∈ succ(v)} (σ_v/σ_w)·(1+δ_w) — exactly Brandes'
    * accumulation, with the DAG-successor relation being "edge into the
    * next BFS level" (tight edges). Betweenness(v) = Σ_s δ_s(v) over
    * interior nodes (sources excluded per Brandes; frontier nodes at
    * `maxDepth` carry δ=0 under truncation and are excluded from the
    * output as not-fully-accumulated).
    *
    * Exact Brandes needs full BFS per source — all-pairs is off the
    * table at 100 TB. Source-sampled, radius-bounded betweenness is the
    * published scalable estimator family (k-path / bounded-distance
    * betweenness); sources and radius are explicit inputs.
    *
    * Shape: forward, per level ONE frontier⋈edges shuffle + σ-sum + one
    * anti-join against the visited set; backward, per level ONE
    * successor⋈edges shuffle + a map-side-combinable DECIMAL(28,12) sum
    * of 12-grid δ terms snapped to the 9-grid (the q4b discipline, so an
    * unrolled-CTE oracle walks identical doubles). Every table is keyed
    * (source, node) — bounded by |sources| × reach; per-level
    * localCheckpoint pins lineage. σ stays exact in BIGINT (≤ degreeᵈ).
    */
  def betweennessFromSources(
      edges: DataFrame, sources: DataFrame, maxDepth: Int = 3): DataFrame = {
    require(maxDepth >= 2, s"maxDepth must be >= 2, got $maxDepth")
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .iterCheckpoint()
    val l0 = sources.select(col("node").cast("long").as("source"))
      .distinct()
      .select(col("source"), col("source").as("node"), lit(1L).as("sigma"))
      .iterCheckpoint()
    val levels = new scala.collection.mutable.ArrayBuffer[DataFrame]
    levels += l0
    var visited = l0.select(col("source"), col("node")).iterCheckpoint()
    for (_ <- 1 to maxDepth) {
      val frontier = levels.last
      val nxt = e.join(frontier, e("src") === frontier("node"))
        .select(col("source"), e("dst").as("node"), col("sigma"))
        .groupBy("source", "node").agg(sum(col("sigma")).as("sigma"))
        .join(visited, Seq("source", "node"), "left_anti")
        .iterCheckpoint()
      levels += nxt
      visited = visited.union(nxt.select(col("source"), col("node")))
        .iterCheckpoint()
    }
    // Backward: δ at the truncation frontier is 0; each shallower level
    // pulls (σv/σw)(1+δw) from its tight successors.
    var cur = levels(maxDepth).withColumn("delta", lit(0.0))
    var acc: DataFrame = null
    for (l <- maxDepth - 1 to 1 by -1) {
      cur = accumulateDelta(e, levels(l), cur)
      acc = if (acc == null) cur else acc.union(cur)
    }
    acc
      .groupBy(col("node"))
      .agg(sum(col("delta").cast("decimal(28,9)")).as("b"))
      .select(col("node"), round(col("b").cast("double"), 6).as("betweenness"))
  }

  /** Per-edge triangle support within an undirected (u < v) edge set:
    * triangles (a<b<c) from the two-hop join, each crediting its three
    * edges. One wedge-join shuffle + one map-side-combinable count.
    */
  private def edgeSupport(und: DataFrame): DataFrame = {
    val tri = und.select(col("u").as("a"), col("v").as("b"))
      .join(und.select(col("u").as("b"), col("v").as("c")), Seq("b"))
      .join(und.select(col("u").as("a"), col("v").as("c")), Seq("a", "c"))
    tri.select(col("a").as("u"), col("b").as("v"))
      .union(tri.select(col("b").as("u"), col("c").as("v")))
      .union(tri.select(col("a").as("u"), col("c").as("v")))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
  }

  /** k-truss by bounded support peeling — the EDGE-cohesion sibling of
    * [[kCore]]: keep edges lying in ≥ k−2 triangles, recompute support
    * inside the survivors, repeat. `maxRounds` bounds the serial factor
    * exactly like kCore's (the bounded peel IS the semantics — callers
    * wanting the fixpoint raise it and assert convergence, as
    * KTrussSpec does). Output: surviving (u, v) edges with their
    * support RECOMPUTED within the final survivor set (0 when a
    * not-yet-peeled edge lost all its triangles in the last round).
    *
    * Scale shape per round: one wedge-join shuffle (Σ deg² bound over
    * the current survivor set, shrinking monotonically) + one count +
    * one filter join; per-round localCheckpoint pins lineage.
    */
  def kTruss(edges: DataFrame, k: Int, maxRounds: Int = 3): DataFrame = {
    require(k >= 3, s"k must be >= 3, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    var und = canonicalUndirected(edges)
    for (_ <- 1 to maxRounds) {
      und = und.join(edgeSupport(und), Seq("u", "v"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= k - 2)
        .select(col("u"), col("v"))
        .iterCheckpoint()
    }
    und.join(edgeSupport(und), Seq("u", "v"), "left")
      .select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
  }

  /** One backward Brandes level: δ(v) for nodes of `level` from the δ/σ
    * of the next level `succ` (same source). Tight edges only — an edge
    * v→w with level(w) = level(v)+1 is by BFS construction a
    * shortest-path DAG edge.
    */
  private def accumulateDelta(
      e: DataFrame, level: DataFrame, succ: DataFrame): DataFrame = {
    val s = succ.select(col("source").as("s_source"), col("node").as("w"),
      col("sigma").as("sw"), col("delta").as("dw"))
    val contrib = e.join(s, e("dst") === s("w"))
      .select(col("s_source").as("source"), e("src").as("node"),
        col("sw"), col("dw"))
    level.join(contrib, Seq("source", "node"), "left")
      .groupBy(col("source"), col("node"), col("sigma"))
      .agg(sum(when(col("sw").isNotNull,
        round(col("sigma").cast("double") / col("sw").cast("double") *
          (lit(1.0) + col("dw")), 12)).cast("decimal(28,12)")).as("ds"))
      .select(col("source"), col("node"), col("sigma"),
        round(coalesce(col("ds").cast("double"), lit(0.0)), 9).as("delta"))
      .iterCheckpoint()
  }

  /** Sketch-based neighborhood function (the HyperANF idea, Boldi et al.
    * 2011): estimate |B(v,h)| — how many nodes each vertex reaches within
    * h hops — for ALL vertices simultaneously by giving every node an HLL
    * sketch of its ball and max-merging each node's sketch with its
    * out-neighbors' sketches per hop. Exact all-pairs reachability is
    * O(n·m) per hop and n² state; the sketch pass is one edge join over
    * ≤ n × m register rows per hop with O(n · 1024) state — THE way to
    * get distance distributions / effective diameter on a 10⁹-node crawl
    * graph. Registers, per-node estimates and the dyadic Z arithmetic are
    * the [[HllSketch]] machinery, so every number replays in DuckDB.
    *
    * Returns one row per hop h = 0..maxHops: (h, n_nodes, total_reach,
    * mean_reach) where total/mean are the DECIMAL-summed per-node
    * estimates (order-free — the oracle contract). Effective diameter at
    * q: the smallest h with total_reach(h) ≥ q · total_reach(maxHops).
    */
  def neighborhoodFunction(edges: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0 && maxHops <= 8, s"maxHops out of range: $maxHops")
    val e = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().iterCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val br = udf((k: Long) => HllSketch.bucketRho(k))
    var regs = nodes
      .select(col("node"), br(col("node")).as("__br"))
      .select(col("node"), col("__br._1").as("bucket"), col("__br._2").as("rho"))
      .iterCheckpoint()
    def hopAgg(h: Int, r: DataFrame): DataFrame =
      HllSketch.groupedEstimate(
        r.select(col("node").as("g"), col("bucket"), col("rho")))
        .agg(count(lit(1)).as("n_nodes"),
          sum(col("est_distinct").cast("decimal(18,6)")).as("__tot"))
        .select(lit(h).as("h"), col("n_nodes"),
          col("__tot").cast("double").as("total_reach"),
          round(col("__tot").cast("double") / col("n_nodes").cast("double"), 6)
            .as("mean_reach"))
    var frames = Vector(hopAgg(0, regs))
    var h = 1
    while (h <= maxHops) {
      val recv = e.join(regs, col("dst") === col("node"))
        .select(col("src").as("node"), col("bucket"), col("rho"))
      regs = regs.union(recv)
        .groupBy("node", "bucket").agg(max("rho").as("rho"))
        .iterCheckpoint()
      frames = frames :+ hopAgg(h, regs)
      h += 1
    }
    frames.reduce(_ unionByName _)
  }
}
