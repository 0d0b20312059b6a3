package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components — duplicate-PAIR output (d01/d04/
  * d06/d05 all emit pairs) is only half of dedup; a curation pipeline
  * needs duplicate CLUSTERS: union the pairs into components, pick one
  * canonical doc per component, drop the rest.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", public literature) —
  * converges in O(log²·n) rounds INDEPENDENT of graph diameter, unlike
  * naive min-label propagation whose round count is the diameter (a
  * pathological duplicate chain at 100 TB would need millions of
  * rounds). Each half-round is one aggregation + one equi-join on the
  * node key — no collect_list neighbor materialization (a hub node's
  * neighbor list would not fit an executor row; the min-aggregate
  * formulation below never builds it), no driver-side graph state.
  *
  * Determinism: every step is min() arithmetic over the node ids —
  * partitioning- and retry-independent. Convergence is detected from
  * two scalar aggregates per round (count + order-independent hash
  * sum), not by collecting the edge set.
  *
  * Lineage: each round localCheckpoints the edge set — iterative plans
  * otherwise stack O(rounds) joins into one Catalyst tree (analysis
  * blows up long before the data does). On a real cluster, swap
  * localCheckpoint for reliable `checkpoint` to a DFS dir (one line,
  * noted here because local[*] has no DFS).
  */
object Graph {

  /** Connected components over an undirected edge list.
    *
    * @param edges  two-column DataFrame; each row one undirected edge
    *               between long-typed node ids (self-loops and duplicate
    *               edges are tolerated and ignored)
    * @return (node, component) — one row per node appearing in `edges`,
    *         component = the MINIMUM node id reachable from `node`
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val srcCol = edges.columns(0)
    val dstCol = edges.columns(1)
    // canonical undirected form (lo, hi), self-loops dropped
    val base = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("lo"),
        greatest(col("a"), col("b")).as("hi"))
      .distinct()

    // large-star: per node u over its SYMMETRIC neighborhood, attach
    // every strictly-larger neighbor to m = min(N(u) ∪ {u})
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.select(col("lo").as("u"), col("hi").as("v"))
        .union(e.select(col("hi").as("u"), col("lo").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      sym.join(m, "u").filter(col("v") > col("u"))
        .select(least(col("v"), col("m")).as("lo"),
          greatest(col("v"), col("m")).as("hi"))
        .filter(col("lo") =!= col("hi"))
        .distinct()
    }

    // small-star: per node u over its strictly-SMALLER neighbors
    // (canonical (hi=u, lo=v) orientation), link them all — and u —
    // to the minimum
    def smallStar(e: DataFrame): DataFrame = {
      val m = e.groupBy(col("hi").as("u")).agg(min(col("lo")).as("m"))
      val linkSmall = e.select(col("hi").as("u"), col("lo").as("v"))
        .join(m, "u")
        .filter(col("v") =!= col("m"))
        .select(col("m").as("lo"), col("v").as("hi"))
      val linkSelf = m.select(col("m").as("lo"), col("u").as("hi"))
      linkSmall.union(linkSelf).distinct()
    }

    // Checkpoint hygiene: each round's localCheckpoint persists an
    // edge-set copy in the block manager, and nothing below ever reads
    // a SUPERSEDED round again — without explicit unpersist the blocks
    // pile up for O(log n) rounds and squeeze every query that runs
    // after this one in the same JVM (measured: q02/q03 inflated 4×
    // in the bench suite). Track the RDD ids each checkpoint creates
    // and drop the previous round's as soon as the next lands; only
    // the LIVE checkpoint (which the returned frame depends on) stays.
    val sc = edges.sparkSession.sparkContext
    var liveIds: Set[Int] = Set.empty
    // the convergence probe RIDES the checkpoint materialization
    // (Dataset.observe → CollectMetrics): the order-independent
    // edge-set signature (count + bit_xor hash — xor can't overflow
    // under ANSI and the distinct set can't cancel; a 64-bit collision
    // across rounds is not a correctness risk worth a full
    // set-compare) is aggregated WHILE the checkpoint's rows
    // materialize, so each round is ONE pass over the edge set instead
    // of checkpoint + a second signature job re-reading the blocks
    // (guide §1.2: remove passes). Same aggregates, same values, same
    // convergence decisions — the output frame is untouched (the
    // checkpoint returns a bare LogicalRDD; CollectMetrics never
    // survives into the caller's plan).
    def checkpointSwapping(df: DataFrame): (DataFrame, (Long, Long)) = {
      // named observe + SYNCHRONOUS readback from the executed plan's
      // own accumulators (queryExecution.observedMetrics) — never the
      // Observation listener API, whose get() waits on the async
      // listener bus (measured: per-wait latency swamps small rounds)
      val observed = df.observe("cc_sig",
        coalesce(bit_xor(xxhash64(col("lo"), col("hi"))), lit(0L)).as("h"),
        count(lit(1)).as("n"))
      val before = sc.getPersistentRDDs.keySet
      // EAGER on purpose: the previous round's blocks are unpersisted
      // right below, and this round's lineage (truncated by the
      // checkpoint) can only be recomputed from those blocks — the
      // new round must be materialized BEFORE its ancestor drops
      val out = observed.localCheckpoint()
      val created = (sc.getPersistentRDDs.keySet -- before).toSet
      liveIds.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      liveIds = created
      val m = observed.queryExecution.observedMetrics("cc_sig")
      (out, (m.getAs[Long]("h"), m.getAs[Long]("n")))
    }

    var (cur, sig) = checkpointSwapping(base)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val (next, nextSig) = checkpointSwapping(smallStar(largeStar(cur)))
      converged = nextSig == sig
      sig = nextSig
      cur = next
      it += 1
    }

    // at the small-star fixpoint every edge is (component-min, member);
    // nodes: members get their lo, minima get themselves
    val members = cur.select(col("hi").as("node"), col("lo").as("component"))
    val roots = cur.select(col("lo").as("node"), col("lo").as("component"))
    members.union(roots).groupBy("node")
      .agg(min(col("component")).as("component"))
  }

  /** Cluster view: every node labeled, singleton-inclusive.
    *
    * @param nodes single-column DataFrame of ALL node ids (docs without
    *              any duplicate pair become their own singleton cluster)
    * @return (node, component, cluster_size)
    */
  def dupClusters(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val idCol = nodes.columns(0)
    val all = nodes.select(col(idCol).cast("long").as("node")).distinct()
    val cc = connectedComponents(edges)
    val labeled = all.join(cc, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component"))
    val sizes = labeled.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    labeled.join(sizes, "component")
      .select(col("node"), col("component"), col("cluster_size"))
  }

  /** Fixed-point integer PageRank over a directed edge list — graph
    * centrality as a corpus quality signal (the CommonCrawl-era
    * pipelines rank hosts by link centrality before sampling; same
    * shape here over any entity graph the lake can derive).
    *
    * All arithmetic is EXACT 64-bit integer: ranks live in millionths
    * (`scale`), the damping factor is 1/2, and each step is
    *   pr'(v) = scale/2 + (Σ_{u→v} pr(u) div outdeg(u)) div 2
    * — floor division and bigint sums that every engine reproduces
    * bit-identically, so a fixed-iteration run is deterministic across
    * partitionings, retries, and the DuckDB oracle (no float power
    * iteration to drift). Mass lost to flooring is the documented
    * trade for exactness; relative ordering — the signal consumers
    * read — is preserved.
    *
    * Scale design: the per-iteration work is one equi-join of the
    * (edge ⋈ outdeg) frame against the node-sized rank frame, then a
    * map-side-combined sum by dst. The edge frame is IMMUTABLE across
    * rounds, so it is repartitioned + sorted on src ONCE and cached —
    * the InMemoryRelation keeps its outputPartitioning/ordering
    * (unlike a localCheckpoint, which reports UnknownPartitioning and
    * would re-shuffle the edges every round), so each round's join
    * moves only the rank frame (GraphX's own Pregel practice). Nothing
    * is ever collected to the driver and no neighbor lists materialize
    * (hub-proof, the [[connectedComponents]] discipline); the rank
    * frame's per-round localCheckpoint keeps the Catalyst tree flat
    * (swap for reliable checkpoint on a real cluster).
    *
    * @param edges two-column (src, dst) long-typed directed edges —
    *              or three-column (src, dst, w) for a WEIGHTED graph,
    *              where each step distributes pr(u) proportionally to
    *              integer edge weights, floor((pr·w) div Σw_out) —
    *              every node must appear as a src at least once for
    *              its out-weight to exist (an undirected graph encoded
    *              as both directions satisfies this by construction)
    * @param iters fixed iteration count (no convergence probe: a fixed
    *              budget is the reproducible form)
    * @return (node, pr) — pr in `scale` units
    */
  def pageRankInt(edges: DataFrame, iters: Int = 3,
                  scale: Long = 1000000L,
                  checkpointEvery: Int = 8): DataFrame = {
    val wCol = if (edges.columns.length >= 3)
      col(edges.columns(2)).cast("long") else lit(1L)
    val e = edges.select(
      col(edges.columns(0)).cast("long").as("src"),
      col(edges.columns(1)).cast("long").as("dst"),
      wCol.as("w"))
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val ed = e.join(deg, "src")
      .repartition(col("src")).sortWithinPartitions(col("src"))
      .persist()
    // The node universe is pinned once (every node owns out-edges per
    // the @param contract). Each round LEFT-joins the contribution
    // sums back against it: a zero-in-degree node of a general
    // directed graph keeps its scale/2 floor and keeps pushing mass to
    // its out-neighbors, instead of silently vanishing from a
    // groupBy(dst)-rebuilt rank frame after round 1. Partitioned on
    // node ONCE and cached (the edge-frame discipline above — an
    // InMemoryRelation keeps its outputPartitioning where a
    // localCheckpoint reports Unknown and would re-shuffle the node
    // frame every round): the per-round left join then aligns with the
    // contribution agg's hash(node) output for free, so each round
    // moves only the freshly-aggregated contrib frame.
    val nodes = ed.select(col("src").as("node")).distinct()
      .repartition(col("node"))
      .persist()
    nodes.count()
    var pr = nodes.withColumn("pr", lit(scale))
    for (it <- 1 to iters) {
      val contrib = ed.join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("(pr * w) div wsum").as("contrib"))
        .groupBy(col("dst"))
        .agg(expr("sum(contrib)").as("csum"))
        .select(col("dst").as("node"), col("csum"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(scale / 2) + expr("coalesce(csum, 0L) div 2")).as("pr"))
      // lineage control without a materialization job per round: only
      // every checkpointEvery-th round (and the LAST — the caches drop
      // below, so the returned frame must not recompute through them)
      // checkpoints eagerly; in between, rounds nest as plain joins and
      // the whole block executes as ONE job at the checkpoint (guide
      // §1.2: remove passes — the per-round eager checkpoint was one
      // extra materialization of the node-sized frame per round)
      if (it == iters || it % checkpointEvery == 0)
        pr = pr.localCheckpoint(true)
    }
    // the final round's ranks are eagerly materialized, so the edge and
    // node caches can drop before the result is consumed
    ed.unpersist(false)
    nodes.unpersist(false)
    pr
  }

  /** Distributed triangle counting with DEGREE-ORDERED orientation
    * (Schank's forward algorithm; Suri & Vassilvitskii 2011's
    * node-iterator++ in MapReduce form): every edge is oriented from
    * its lower-(degree, id) endpoint to the higher, so every node's
    * OUT-degree is O(√m) on any graph — the wedge self-join (the
    * quadratic step) is Σ out-degree², which orientation caps at
    * O(m^1.5) total. Without it the join explodes on the highest-
    * degree hub (deg² wedges from one node); this is THE skew fix for
    * triangle counting at 100 TB, where a popular entity would
    * otherwise hold a partition hostage.
    *
    * Each triangle is counted exactly once: its apex is the minimum
    * node under the (degree, id) total order, the wedge pair is
    * ordered by the same total order, and the closing edge carries the
    * same orientation — plain-id ordering would double- or zero-count
    * triangles whose id order disagrees with the degree order.
    *
    * @param edges undirected (u, v) pairs, u != v in any order;
    *              duplicates tolerated (canonicalized + distinct here)
    * @return one row: (n_edges, n_triangles) */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e0 = edges.select(
      least(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("u"),
      greatest(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val deg = e0.select(col("u").as("n"))
      .unionAll(e0.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    val ed = e0
      .join(deg.select(col("n").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), "v")
      .select(when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t"), col("dv").as("dt")))
        .otherwise(
          struct(col("v").as("s"), col("u").as("t"), col("du").as("dt")))
        .as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"), col("e.dt").as("dt"))
    val wedges = ed.as("a").join(ed.as("b"),
        col("a.s") === col("b.s") &&
          (col("a.dt") < col("b.dt") ||
            (col("a.dt") === col("b.dt") && col("a.t") < col("b.t"))))
      .select(col("a.t").as("x"), col("b.t").as("y"))
    val closed = wedges
      .join(ed.select(col("s").as("x"), col("t").as("y")), Seq("x", "y"))
    e0.agg(count(lit(1)).as("n_edges"))
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }

  /** PERSONALIZED integer PageRank: [[pageRankInt]]'s exact recurrence
    * with the teleport mass restricted to a seed set — "centrality as
    * seen from HERE" (topic-sensitive PageRank, Haveliwala 2002; the
    * corpus-curation use is ranking entities by proximity to a trusted
    * seed list). Same bit-deterministic arithmetic, with the uniform
    * scale/2 floor replaced by a per-node floor:
    *   pr₀(v)  = seed(v) ? scale : 0
    *   pr'(v) = (seed(v) ? scale/2 : 0)
    *          + (Σ_{u→v} (pr(u)·w) div wsum(u)) div 2
    * Non-seed nodes hold rank ONLY through paths from seeds, so the
    * result is a proximity field, not global centrality.
    *
    * Scale shape is identical to [[pageRankInt]] (one node-sized join
    * per round against the cached edge frame); the seed flag rides the
    * pinned node-universe frame, so zero-in-degree seeds keep emitting
    * and zero-in-degree non-seeds hold rank 0.
    *
    * @param seeds one-column frame of seed node ids; ids outside the
    *              edge frame's src universe are ignored (they own no
    *              out-edges, see the [[pageRankInt]] @param contract)
    */
  def pageRankIntPersonalized(edges: DataFrame, seeds: DataFrame,
                              iters: Int = 3,
                              scale: Long = 1000000L,
                              checkpointEvery: Int = 8): DataFrame = {
    val wCol = if (edges.columns.length >= 3)
      col(edges.columns(2)).cast("long") else lit(1L)
    val e = edges.select(
      col(edges.columns(0)).cast("long").as("src"),
      col(edges.columns(1)).cast("long").as("dst"),
      wCol.as("w"))
    val deg = e.groupBy(col("src")).agg(sum(col("w")).as("wsum"))
    val ed = e.join(deg, "src")
      .repartition(col("src")).sortWithinPartitions(col("src"))
      .persist()
    val seedSet = seeds
      .select(col(seeds.columns(0)).cast("long").as("node")).distinct()
      .withColumn("__seed", lit(true))
    // node-partitioned cache, same rationale as [[pageRankInt]]'s node
    // universe: the per-round left join reuses this partitioning
    val nodes = ed.select(col("src").as("node")).distinct()
      .join(seedSet, Seq("node"), "left")
      .select(col("node"),
        when(col("__seed"), lit(scale / 2)).otherwise(lit(0L))
          .as("floor0"))
      .repartition(col("node"))
      .persist()
    nodes.count()
    var pr = nodes.select(col("node"), (col("floor0") * 2).as("pr"))
    for (it <- 1 to iters) {
      val contrib = ed.join(pr.withColumnRenamed("node", "src"), "src")
        .select(col("dst"), expr("(pr * w) div wsum").as("contrib"))
        .groupBy(col("dst"))
        .agg(expr("sum(contrib)").as("csum"))
        .select(col("dst").as("node"), col("csum"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("floor0") + expr("coalesce(csum, 0L) div 2")).as("pr"))
      // the pageRankInt checkpoint cadence (see its loop comment)
      if (it == iters || it % checkpointEvery == 0)
        pr = pr.localCheckpoint(true)
    }
    ed.unpersist(false)
    nodes.unpersist(false)
    pr
  }

  /** k-core PEELING: iteratively delete every node of degree < k (and
    * its edges) until the survivors all have degree >= k inside the
    * survivor set — the standard graph-density filter (spam/bot
    * subgraph detection, community cores, curation by structural
    * support). Fixed `rounds` budget for the same reason as
    * [[pageRankInt]]'s fixed iterations — a reproducible, engine-
    * replayable form; the emitted `converged` flag states whether the
    * budget REACHED the fixpoint (true ⇒ the output IS the exact
    * k-core), so an unconverged run is visible, never silent.
    * Production form: same loop under a while-changed driver check.
    *
    * Scale shape: each round is one degree aggregation (map-side
    * combined counts) plus two semi-joins of the shrinking edge frame
    * against the broadcast-or-shuffled survivor list — no neighbor
    * lists, no driver graph state; every round's frame is eagerly
    * localCheckpointed (at cluster scale: reliable checkpoint) so
    * lineage stays O(1). Rounds needed = the peeling depth, typically
    * tiny on power-law graphs.
    *
    * @param edges undirected (u, v) pairs in any order; duplicates and
    *              self-loops tolerated (canonicalized + dropped here)
    * @return (node, deg, converged) for nodes of the surviving core —
    *         deg counted inside the core; converged identical on every
    *         row */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k >= 1, rounds >= 1")
    val e0 = edges.select(
      least(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("u"),
      greatest(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("c"))
    var alive = e0.localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val keep = degrees(alive).filter(col("c") >= k).select(col("n"))
      alive = alive
        .join(keep.withColumnRenamed("n", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("n", "v"), Seq("v"), "left_semi")
        .localCheckpoint(true)
    }
    val fin = degrees(alive)
    fin.crossJoin(broadcast(
        fin.agg(coalesce(min(col("c")), lit(Long.MaxValue))
          .as("mindeg"))))
      .select(col("n").as("node"), col("c").as("deg"),
        (col("mindeg") >= k).as("converged"))
  }

  /** Synchronous LABEL PROPAGATION community detection (Raghavan et
    * al. 2007, made deterministic): labels init to node ids; each
    * round every node adopts its neighbors' MOST FREQUENT label, ties
    * broken by the smallest label — the (count desc, label asc) total
    * order replaces the original's random tie-break, so the result is
    * a pure function of the graph (partitioning-, retry- and
    * run-independent). Fixed `rounds` budget (the [[pageRankInt]] /
    * [[kCore]] reproducibility discipline); the emitted `converged`
    * flag states whether the LAST round changed zero labels, so a
    * budget that stopped short is visible, never silent. Synchronous
    * updates can 2-cycle on bipartite structures — the flag reports
    * exactly that, which is the honest contract for a replayable form.
    *
    * Scale shape: each round is one equi-join of the (static, cached)
    * symmetric adjacency frame against the label frame on the neighbor
    * key, then two map-side-combinable aggregations — per-(node,label)
    * counts, then a per-node min(struct(-count, label)) argmax that
    * never materializes a neighbor list (hub-proof: a 10⁸-degree node
    * contributes counters, not rows). Label frames localCheckpoint per
    * round (reliable checkpoint on a cluster) so lineage stays O(1).
    *
    * @param edges  undirected (u, v) pairs in any order; duplicates and
    *               self-loops tolerated (canonicalized + dropped here)
    * @param rounds fixed synchronous update count, >= 1
    * @return (node, lab, converged) — lab = the community label after
    *         `rounds` updates; converged identical on every row */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val e0 = edges.select(
      least(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("u"),
      greatest(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // the adjacency frame is the STATIC side of every round's join —
    // pre-partition it on the join key once and persist (the
    // pageRankInt edge-frame discipline: persist keeps the
    // partitioning metadata, so each round's join reuses this exchange
    // and the label frame is the only per-round mover)
    val nbrs = e0.select(col("u").as("node"), col("v").as("nb"))
      .unionAll(e0.select(col("v").as("node"), col("u").as("nb")))
      .repartition(col("nb")).persist()
    def step(lbl: DataFrame): DataFrame =
      nbrs.join(lbl.withColumnRenamed("node", "nb"), "nb")
        .groupBy(col("node"), col("lab"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("node"))
        .agg(min(struct((-col("c")).as("negc"), col("lab").as("lab")))
          .as("best"))
        .select(col("node"), col("best.lab").as("lab"))
        .localCheckpoint(true)
    var prev = nbrs.select(col("node")).distinct()
      .withColumn("lab", col("node")).localCheckpoint(true)
    var cur = prev
    for (_ <- 1 to rounds) { prev = cur; cur = step(cur) }
    // every round's labels are eagerly materialized, so the adjacency
    // cache can drop before the result is consumed
    nbrs.unpersist(false)
    val changed = cur.join(prev.withColumnRenamed("lab", "plab"), "node")
      .filter(col("lab") =!= col("plab"))
      .agg(count(lit(1)).as("n_changed"))
    cur.crossJoin(broadcast(changed))
      .select(col("node"), col("lab"),
        (col("n_changed") === 0L).as("converged"))
  }

  /** INCREMENTAL connected components: fold a DELTA edge batch into an
    * existing `(node, component)` labeling without re-reading the base
    * graph — the per-ingest form of [[connectedComponents]], the same
    * cost-∝-delta discipline as `Curate.incremental`/q86/q88.
    *
    *  1. Delta endpoints map into label space (left join against the
    *     labeling; endpoints the labeling has never seen label
    *     themselves).
    *  2. The distinct cross-component pairs form a MERGE graph sized by
    *     touched components — not by the graph — and the alternating-
    *     star CC runs on that.
    *  3. Relabel: one pass over the label frame with the (old → new)
    *     map joined broadcast-scale; untouched components pass through.
    *
    * The merged label is the min node id of the merged component
    * (old labels are component minima; new nodes carry their own id),
    * so the result is INDISTINGUISHABLE from a full rebuild over
    * base ∪ delta — which is exactly what the g09 oracle asserts.
    *
    * @param labels     (node, component) from a prior run — component =
    *                   min member id (the [[connectedComponents]] form)
    * @param deltaEdges new undirected (u, v) pairs; duplicates,
    *                   self-loops, already-internal edges all tolerated
    * @return the full updated (node, component), new nodes included
    */
  def incrementalComponents(labels: DataFrame,
                            deltaEdges: DataFrame): DataFrame = {
    val e = deltaEdges.select(
      col(deltaEdges.columns(0)).cast("long").as("u"),
      col(deltaEdges.columns(1)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val lab = labels.select(col(labels.columns(0)).cast("long").as("node"),
      col(labels.columns(1)).cast("long").as("component"))
    val inLabelSpace = e
      .join(lab.select(col("node").as("u"), col("component").as("cu")),
        Seq("u"), "left")
      .join(lab.select(col("node").as("v"), col("component").as("cv")),
        Seq("v"), "left")
      .select(coalesce(col("cu"), col("u")).as("cu"),
        coalesce(col("cv"), col("v")).as("cv"))
      .filter(col("cu") =!= col("cv"))
    val newNodes = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node"))).distinct()
      .join(lab.select("node"), Seq("node"), "left_anti")
      .select(col("node"), col("node").as("component"))
    // (old component/new-node id → merged min) — touched components only
    val merged = connectedComponents(inLabelSpace)
      .select(col("node").as("component"), col("component").as("newc"))
    lab.unionAll(newNodes)
      .join(broadcast(merged), Seq("component"), "left")
      .select(col("node"),
        coalesce(col("newc"), col("component")).as("component"))
  }

  /** Multi-source BFS: exact hop distance from the nearest seed, up to
    * `rounds` hops (nodes further than `rounds` are absent — the
    * honest bounded-budget contract, like [[kCore]]'s `converged`).
    *
    * Each round joins the STATIC pre-partitioned adjacency frame
    * against the FRONTIER only (nodes first reached last round) — the
    * classic BFS invariant that frontier-only propagation reaches the
    * same fixpoint as re-propagating every settled node: a node
    * settled at hop k already pushed k+1 to its neighbors in round
    * k+1. So each round's join input shrinks with the frontier while
    * the settled set only accretes (min-merge, localCheckpoint per
    * round for O(1) lineage). Hub-proof: distances are scalars, never
    * neighbor lists. `settled` (same on every row) reports whether the
    * last frontier was empty — i.e. whether the distances are FINAL,
    * not merely budget-truncated.
    *
    * @param edges  undirected (u, v) pairs; duplicates + self-loops
    *               tolerated (canonicalized + dropped here)
    * @param seeds  one column of seed node ids (dist 0); rows outside
    *               the graph's node set are reported at dist 0 too —
    *               callers pass graph nodes
    * @param rounds max hops, >= 1
    * @return (node, dist, settled) for every node within `rounds` hops
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
                   rounds: Int): DataFrame = {
    require(rounds >= 1, "rounds >= 1")
    val e0 = edges.select(
      least(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("u"),
      greatest(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val nbrs = e0.select(col("u").as("node"), col("v").as("nb"))
      .unionAll(e0.select(col("v").as("node"), col("u").as("nb")))
      .repartition(col("nb")).persist()
    var dist = seeds.select(col(seeds.columns(0)).cast("long").as("node"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint(true)
    var frontier = dist
    for (r <- 1 to rounds if !frontier.isEmpty) {
      // nb-side = frontier: reuses the adjacency frame's partitioning
      val cand = nbrs
        .join(frontier.select(col("node").as("nb")), "nb")
        .select(col("node")).distinct()
      frontier = cand.join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(r.toLong)).localCheckpoint(true)
      dist = dist.unionAll(frontier).localCheckpoint(true)
    }
    nbrs.unpersist(false)
    val open = frontier.agg(count(lit(1)).as("n_open"))
    dist.crossJoin(broadcast(open))
      .select(col("node"), col("dist"), (col("n_open") === 0L).as("settled"))
  }

  /** Common-neighbor LINK PREDICTION (Liben-Nowell & Kleinberg 2003,
    * "The Link Prediction Problem for Social Networks", public
    * literature): score each NON-adjacent pair by how many neighbors
    * it shares — the missing-edge / entity-resolution-candidate signal
    * a dedup graph uses to surface pairs the pairwise matcher never
    * compared. Emits the global top-k pairs under the
    * (n_common desc, u, v) total order with both degrees, so Jaccard /
    * Adamic-Adar style normalizations are integer-derivable
    * downstream.
    *
    * Shape: one wedge self-join of the symmetric adjacency on the
    * middle node (the Σ deg(m)² exchange — g07's cost), one count
    * aggregation, one anti-join against the edge set (only candidate
    * pairs, never the wedge stream, reach it), two node-sized degree
    * joins on the k-bounded result side, and TakeOrderedAndProject for
    * the global top-k (never a global sort).
    *
    * The wedge join is the term to bound at a hub-heavy 100 TB graph:
    * a middle node of degree d emits d² wedge rows ON ONE KEY, so one
    * celebrity node is a quadratic single-task blowup — the classic
    * skew scale-killer. `maxWedgeDeg` caps it: middles with
    * deg > maxWedgeDeg are dropped BEFORE the self-join, bounding the
    * exchange at Σ min(deg, cap)² ≤ cap·m. The cost is DOCUMENTED
    * RECALL LOSS in the capped regime: common neighbors that are hubs
    * stop contributing to n_common, so pairs whose shared neighbors
    * are ALL hubs disappear and counts for the rest are lower bounds —
    * the same trade the heavy-hitter mitigation in the triangle
    * literature makes (and [[triangleCount]]'s degree-ordered
    * orientation achieves losslessly for the closed-triangle case;
    * open wedges have no orientation trick because the endpoints are
    * NOT adjacent). Pick the cap above the graph's max degree for the
    * exact answer (the registered g10 contract: cap 64 vs fixture max
    * degree 15/18 at sf0.01/sf0.1), or at the skew knee (q83's
    * profile) when hubs must be bounded.
    *
    * @param edges (u, v) long node ids, normalized u < v per row
    * @param maxWedgeDeg drop middle nodes with degree above this
    *        before the wedge join (default unbounded = exact)
    * @return top-k (u, v, n_common, deg_u, deg_v)
    */
  def linkPrediction(edges: DataFrame, topK: Int,
                     maxWedgeDeg: Int = Int.MaxValue): DataFrame = {
    val e0 = edges.select(
      least(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("u"),
      greatest(col(edges.columns(0)), col(edges.columns(1)))
        .cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val adj = e0.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e0.select(col("v").as("a"), col("u").as("b")))
    val deg = adj.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    // the cap filter: deg is node-sized and re-used for the output
    // columns below, so the bound costs one broadcast-or-shuffle join
    // on the middle key the wedge join shuffles on anyway
    val mids =
      if (maxWedgeDeg == Int.MaxValue) adj
      else adj.join(deg.filter(col("deg") <= maxWedgeDeg).select("a"),
        Seq("a"), "left_semi")
    val wedges = mids.as("x").join(mids.as("y"),
        col("x.a") === col("y.a") && col("x.b") < col("y.b"))
      .select(col("x.b").as("u"), col("y.b").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("n_common"))
    wedges.join(e0, Seq("u", "v"), "left_anti")
      .join(deg.select(col("a").as("u"), col("deg").as("deg_u")), Seq("u"))
      .join(deg.select(col("a").as("v"), col("deg").as("deg_v")), Seq("v"))
      .orderBy(col("n_common").desc, col("u").asc, col("v").asc)
      .limit(topK)
      .select(col("u"), col("v"), col("n_common"),
        col("deg_u"), col("deg_v"))
  }
}
