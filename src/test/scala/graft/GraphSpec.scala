package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Connected components (large-star/small-star): known shapes, noise
  * tolerance, singleton handling, and agreement with a local union-find
  * on a seeded random graph. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.connectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("chain, triangle, and cross-component isolation") {
    // chain 1-2-3-4 (diameter stress), triangle 10-11-12, pair 20-21
    val labels = cc(Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L)))
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("self-loops and duplicate/reversed edges are tolerated") {
    val labels = cc(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L)))
    // node 5 only had a self-loop: no real edge, so it is absent here
    // (dupClusters is the singleton-inclusive view)
    assert(labels == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("agrees with local union-find on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = Seq.fill(150)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // local union-find ground truth
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> {
        // component label = min node id in the component, among nodes
        // that appear in an edge
        val root = find(v.toInt)
        edges.flatMap(e => Seq(e._1, e._2)).distinct
          .filter(u => find(u.toInt) == root).min
      }).toMap
    assert(cc(edges) == want)
  }

  test("long chain converges in far fewer rounds than its diameter") {
    // a 4096-node path is the star algorithm's worst case and naive
    // min-label propagation's death: the naive form needs 4096 rounds,
    // the default maxIter is 50, so a fully-correct labeling here
    // PROVES the O(log² n) round bound actually holds
    val n = 4096
    val edges = (0L until (n - 1)).map(i => (i, i + 1))
    val labels = cc(edges)
    assert(labels.size == n)
    assert(labels.values.forall(_ == 0L))
  }

  test("pageRankInt matches the hand-computed star recurrence") {
    // undirected star 1–2, 1–3 encoded both directions; 3 iterations of
    // pr'(v) = 500000 + (Σ pr(u) div deg(u)) div 2 by hand:
    // iter1: (1.5e6, 750k, 750k); iter2: (1.25e6, 875k, 875k);
    // iter3: (1.375e6, 812.5k, 812.5k)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1375000L, 2L -> 812500L, 3L -> 812500L))
  }

  test("pageRankInt distributes mass by integer edge weights") {
    // star 1-2 (w=3), 1-3 (w=1), both directions; wsum: 1->4, 2->3, 3->1
    // iter1: (1.5e6, 875k, 625k); iter2: (1.25e6, 1062.5k, 687.5k);
    // iter3: (1.375e6, 968.75k, 656.25k) by hand
    val edges = Seq((1L, 2L, 3L), (2L, 1L, 3L), (1L, 3L, 1L), (3L, 1L, 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1375000L, 2L -> 968750L, 3L -> 656250L))
  }

  test("pageRankInt keeps zero-in-degree nodes of a directed graph") {
    // directed 1→2, 2→3, 3→2: node 1 has no in-edge, so a naive
    // groupBy(dst)-rebuilt rank frame drops it after round 1 and its
    // mass stops flowing to node 2. Hand-computed with the full node
    // universe: iter1 (500k, 1.5e6, 1e6); iter2 (500k, 1.25e6,
    // 1.25e6); iter3 (500k, 1.375e6, 1.125e6).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = Graph.pageRankInt(edges, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 500000L, 2L -> 1375000L, 3L -> 1125000L))
  }

  test("pageRankInt agrees with a first-principles reference on a " +
      "random DIRECTED graph") {
    // independent derivation (ADVICE r7): every src node persists with
    // the scale/2 floor even with zero in-degree, and keeps emitting
    val rnd = new scala.util.Random(11)
    val n = 50
    val edges = Seq.fill(90)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val nodes = edges.map(_._1).distinct
    var pr = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = edges
        .filter { case (u, _) => pr.contains(u) }
        .groupBy(_._2).map { case (v, es) =>
          v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
        }
      pr = nodes.map(v => v -> (500000L + in.getOrElse(v, 0L) / 2)).toMap
    }
    val got = Graph.pageRankInt(edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == pr)
  }

  test("pageRankInt agrees with a sequential reference on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val und = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val edges = und ++ und.map(_.swap)
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var pr = edges.map(_._1).distinct.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = pr.keys.map(v => v -> (500000L + in.getOrElse(v, 0L) / 2)).toMap
    }
    val got = Graph.pageRankInt(edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == pr)
  }

  test("pageRankIntPersonalized matches the hand-computed seeded star") {
    // undirected star 1–2, 1–3, seeds={2}: pr0 (0, 1e6, 0);
    // iter1 (500k, 500k, 0); iter2 (250k, 625k, 125k);
    // iter3 (375k, 562.5k, 62.5k) by hand — non-seeds hold rank only
    // through paths from the seed
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val got = Graph.pageRankIntPersonalized(edges, Seq(2L).toDF("node"),
      iters = 3).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 375000L, 2L -> 562500L, 3L -> 62500L))
  }

  test("pageRankIntPersonalized agrees with a first-principles reference " +
      "on a random directed graph") {
    val rnd = new scala.util.Random(23)
    val n = 40
    val edges = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }.distinct
    val nodes = edges.map(_._1).distinct
    val seeds = nodes.filter(_ % 5 == 0)
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    def floor0(v: Long) = if (seeds.contains(v)) 500000L else 0L
    var pr = nodes.map(v => v -> floor0(v) * 2).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).map { case (v, es) =>
        v -> es.map { case (u, _) => pr(u) / deg(u) }.sum
      }
      pr = nodes.map(v => v -> (floor0(v) + in.getOrElse(v, 0L) / 2)).toMap
    }
    val got = Graph.pageRankIntPersonalized(edges.toDF("src", "dst"),
      seeds.toDF("node"), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == pr)
  }

  test("triangleCount: K4, hub star, and a random graph vs sequential") {
    import graft.operators.Graph.triangleCount
    // K4 = 4 triangles; duplicate/reversed edges are canonicalized
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 3L), (1L, 2L)).toDF("u", "v")
    assert(triangleCount(k4).as[(Long, Long)].head() == ((6L, 4L)))
    // a pure hub star has zero triangles — the orientation's worst
    // unoriented case (deg² wedges at the hub) yields no closures
    val star = (1L to 20L).map(i => (0L, i)).toDF("u", "v")
    assert(triangleCount(star).as[(Long, Long)].head() == ((20L, 0L)))
    // random graph vs a sequential triple scan
    val rnd = new scala.util.Random(31)
    val n = 30
    val es = Seq.fill(120)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val eset = es.toSet
    var want = 0L
    for (a <- 0 until n; b <- a + 1 until n; c <- b + 1 until n)
      if (eset((a.toLong, b.toLong)) && eset((a.toLong, c.toLong)) &&
          eset((b.toLong, c.toLong))) want += 1
    val got = triangleCount(es.toDF("u", "v")).as[(Long, Long)].head()
    assert(got == ((es.size.toLong, want)))
  }

  test("kCore: K4+tail peels the tail; unconverged budget is flagged; " +
      "random graph vs a while-loop reference") {
    import graft.operators.Graph.kCore
    // K4 on 1..4 plus a tail 4-5-6-7: at k=2 the tail peels end-first
    // over 3 rounds, K4 survives with in-core degree 3
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("u", "v")
    val core = kCore(g, k = 2, rounds = 5)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(core.toSeq == Seq((1L, 3L, true), (2L, 3L, true),
      (3L, 3L, true), (4L, 3L, true)))
    // one round is not enough: node 6 still has degree 1 afterwards,
    // and the flag must SAY so while the rows stay deterministic
    val short = kCore(g, k = 2, rounds = 1)
      .as[(Long, Long, Boolean)].collect()
    assert(short.exists(r => r._1 == 6L && r._2 == 1L))
    assert(short.forall(!_._3), "unconverged budget flagged")
    // random graph: full fixpoint vs a sequential while-loop peel
    val rnd = new scala.util.Random(47)
    val n = 40
    val es = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    var eset = es.toSet
    var done = false
    while (!done) {
      val deg = eset.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (x, g2) => x -> g2.size.toLong }
      val bad = deg.collect { case (x, c) if c < 3 => x }.toSet
      if (bad.isEmpty) done = true
      else eset = eset.filter { case (a, b) =>
        !bad.contains(a) && !bad.contains(b) }
    }
    val refDeg = eset.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (x, g2) => x -> g2.size.toLong }
    val got = kCore(es.toDF("u", "v"), k = 3, rounds = 20)
      .as[(Long, Long, Boolean)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == refDeg)
    assert(got.forall(_._3))
  }

  test("labelPropagation: two cliques + bridge, bipartite 2-cycle flag, " +
      "random graph vs a sequential reference") {
    import graft.operators.Graph.labelPropagation
    // two triangles {1,2,3} and {4,5,6} joined by one bridge 3-4.
    // Hand-computed synchronous rounds (count desc, label asc):
    //   r1: (2,1,1,3,4,4)  r2: (1,1,1,4,3,3)  r3: (1,1,1,3,3,3)
    //   r4: (1,1,1,3,3,3)  — fixpoint: clique A keeps min label 1,
    // clique B settles on 3 (the label node 4 imported across the
    // bridge in r1 and re-exported), and r4 == r3 ⇒ converged
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("u", "v")
    val got = labelPropagation(g, rounds = 4)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    assert(got.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
    assert(got.forall(_._3), "fixpoint reached within budget")
    // bipartite edge 1-2: synchronous updates swap labels forever —
    // the budget must report unconverged, never a silent wrong answer
    val bip = Seq((1L, 2L)).toDF("u", "v")
    val flagged = labelPropagation(bip, rounds = 3)
      .as[(Long, Long, Boolean)].collect()
    assert(flagged.forall(!_._3), "2-cycle flagged as unconverged")
    // random graph: engine vs a from-first-principles sequential replay
    // of the same deterministic recurrence
    val rnd = new scala.util.Random(59)
    val n = 30
    val es = Seq.fill(80)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val nodes = adj.keySet.toSeq.sorted
    var lab = nodes.map(v => v -> v).toMap
    val rounds = 4
    var prevLab = lab
    for (_ <- 1 to rounds) {
      prevLab = lab
      lab = nodes.map { v =>
        val hist = adj(v).map(prevLab).groupBy(identity)
          .map { case (l, g2) => l -> g2.size }
        v -> hist.toSeq.map { case (l, c) => (-c, l) }.min._2
      }.toMap
    }
    val conv = nodes.forall(v => lab(v) == prevLab(v))
    val gotR = labelPropagation(es.toDF("u", "v"), rounds)
      .as[(Long, Long, Boolean)].collect()
    assert(gotR.map(r => r._1 -> r._2).toMap == lab)
    assert(gotR.forall(_._3 == conv))
  }

  test("bfsDistances: chain distances, budget truncation flag, " +
      "multi-source min, random graph vs sequential BFS") {
    import graft.operators.Graph.bfsDistances
    // chain 0-1-2-3-4-5, seed {0}: dist = index; budget 3 cuts at 3
    val chain = (0L to 4L).map(i => (i, i + 1)).toDF("u", "v")
    val cut = bfsDistances(chain, Seq(0L).toDF("n"), rounds = 3)
      .as[(Long, Long, Boolean)].collect()
    assert(cut.map(r => r._1 -> r._2).toMap ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(cut.forall(!_._3), "advancing frontier at budget => not settled")
    val full = bfsDistances(chain, Seq(0L).toDF("n"), rounds = 6)
      .as[(Long, Long, Boolean)].collect()
    assert(full.map(r => r._1 -> r._2).toMap ==
      (0L to 5L).map(i => i -> i).toMap)
    assert(full.forall(_._3), "exhausted reachable set => settled")
    // multi-source: seeds at both chain ends meet in the middle
    val two = bfsDistances(chain, Seq(0L, 5L).toDF("n"), rounds = 6)
      .as[(Long, Long, Boolean)].collect()
    assert(two.map(r => r._1 -> r._2).toMap ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    // random graph vs a from-first-principles sequential BFS
    val rnd = new scala.util.Random(61)
    val n = 40
    val es = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val adj = (es ++ es.map(_.swap)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val seeds = adj.keySet.filter(_ % 5 == 0)
    val rounds = 4
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (r <- 1 to rounds if frontier.nonEmpty) {
      val nf = frontier.flatMap(adj).diff(dist.keySet)
      nf.foreach(v => dist += v -> r.toLong)
      frontier = nf
    }
    val got = bfsDistances(es.toDF("u", "v"), seeds.toSeq.toDF("n"), rounds)
      .as[(Long, Long, Boolean)].collect()
    assert(got.map(r => r._1 -> r._2).toMap == dist)
    assert(got.forall(_._3 == frontier.isEmpty))
  }

  test("linkPrediction scores non-adjacent pairs by shared neighbors") {
    // square 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the only
    // predictions, each sharing BOTH its endpoints' neighbors; plus a
    // pendant 5 on node 1 → (2,5) and (4,5) share exactly {1}, and
    // (3,5) shares nothing (no wedge) so it must NOT appear
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L))
      .toDF("u", "v")
    val got = Graph.linkPrediction(edges, topK = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 3L, 2L, 3L, 2L), // via 2 and 4; deg(1)=3, deg(3)=2
      (2L, 4L, 2L, 2L, 2L), // via 1 and 3
      (2L, 5L, 1L, 2L, 1L), // via 1
      (4L, 5L, 1L, 2L, 1L)  // via 1
    ), got.toString)
    // existing edges never surface, reversed/duplicate input tolerated
    val noisy = edges.unionAll(Seq((2L, 1L), (1L, 2L)).toDF("u", "v"))
    val got2 = Graph.linkPrediction(noisy, topK = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got2 == got, got2.toString)
    // topK truncates under the (n_common desc, u, v) total order
    val top2 = Graph.linkPrediction(edges, topK = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(top2 == got.filter(_._3 == 2L), top2.toString)
  }

  test("linkPrediction maxWedgeDeg bounds the hub's wedge blowup") {
    // hub 100 joined to leaves 1..20 (deg 20), plus a sparse path
    // 1-2, 2-3: the hub as a MIDDLE would emit C(20,2)=190 wedge
    // rows on one key — the quadratic single-key blowup the cap
    // exists to stop
    val star = (1L to 20L).map(l => (100L, l))
    val edges = (star ++ Seq((1L, 2L), (2L, 3L))).toDF("u", "v")

    // uncapped = exact: every non-adjacent leaf pair shares the hub
    // (C(20,2) = 190 minus the 2 adjacent pairs); (1,3) additionally
    // shares middle 2 → n_common 2. Every pair INVOLVING the hub is an
    // existing edge, so the hub never surfaces as an endpoint.
    val exact = Graph.linkPrediction(edges, topK = 500)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(exact.size == 20 * 19 / 2 - 2, exact.size.toString)
    assert(exact.contains((1L, 3L, 2L, 2L, 2L))) // via hub AND node 2
    assert(exact.forall(r => r._1 != 100L && r._2 != 100L))

    // cap below the hub's degree: the hub is dropped AS A MIDDLE —
    // its C(20,2) = 190 wedge rows on one key never materialize. Only
    // the sparse middles contribute wedges now, and their hub-touching
    // wedges land on existing edges — the documented recall loss
    // (every hub-mediated pair gone, (1,3) drops from 2 shared to 1).
    val capped = Graph.linkPrediction(edges, topK = 500,
        maxWedgeDeg = 19).as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(capped == Set((1L, 3L, 1L, 2L, 2L)), capped.toString)

    // cap at/above the max degree is lossless — the registered g10
    // regime (cap 64 vs fixture max degree 18)
    val lossless = Graph.linkPrediction(edges, topK = 500,
        maxWedgeDeg = 20).as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(lossless == exact)
  }

  test("dupClusters labels every node, singletons included, with sizes") {
    val nodes = (1L to 8L).toDF("doc_id")
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
    val got = Graph.dupClusters(nodes, edges)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L),
      (4L, 4L, 1L), (5L, 5L, 2L), (6L, 5L, 2L),
      (7L, 7L, 1L), (8L, 8L, 1L)))
  }
}
