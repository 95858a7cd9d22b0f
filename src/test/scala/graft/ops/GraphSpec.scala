package graft.ops

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 8) =
    Graph.pageRank(edges.toDF("src", "dst"), iters = iters)
      .rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Double])
      .toMap

  test("two-node cycle is the fixed point: both ranks stay 1/2, mass conserved") {
    val pr = ranks(Seq((1L, 2L), (2L, 1L)))
    pr(1L) shouldBe 0.5 +- 1e-12
    pr(2L) shouldBe 0.5 +- 1e-12
  }

  test("dangling node: mass redistributes, one hand-computed iteration") {
    // a→b, b dangling; after 1 iter: dm = 0.5,
    // pr(a) = 0.15/2 + 0.85·(0 + 0.25)   = 0.2875
    // pr(b) = 0.15/2 + 0.85·(0.5 + 0.25) = 0.7125
    val pr = ranks(Seq((1L, 2L)), iters = 1)
    pr(1L) shouldBe 0.2875 +- 1e-9
    pr(2L) shouldBe 0.7125 +- 1e-9
    (pr(1L) + pr(2L)) shouldBe 1.0 +- 1e-9 // no mass leak
  }

  test("star centrality ordering; duplicate edges collapse") {
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (9L, 1L))
    val pr = ranks(star)
    // 1 receives the hub's ENTIRE out-mass each round, the hub only
    // collects the (small-rank) spokes — so 1 > hub > leaf spokes
    pr(1L) should be > pr(9L)
    pr(9L) should be > pr(2L)
    pr(2L) shouldBe pr(3L) +- 1e-12
    ranks(star ++ star) shouldBe pr // multigraph input, same result
    pr.values.sum shouldBe 1.0 +- 1e-9
  }

  private def triCounts(edges: Seq[(Long, Long)]) =
    Graph.triangles(edges.toDF("src", "dst"))
      .rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long])
      .toMap

  test("triangles: K4 has 4 triangles, every node in 3; direction and duplicates collapse") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a != b) yield (a, b)
    val t = triCounts(k4) // every ordered pair both ways = heavy multigraph
    t shouldBe Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("triangles: a path has none; a square has none; square + one chord has two") {
    triCounts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) shouldBe empty
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    triCounts(square) shouldBe empty
    val chorded = square :+ (1L, 3L)
    // triangles {1,2,3} and {1,3,4}: nodes 1,3 in both, 2,4 in one
    triCounts(chorded) shouldBe Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L)
  }

  test("kHopMinHops: chain distances, bounded depth, unreachable and isolated-seed cases") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val seeds = Seq(1L, 99L).toDF("doc_id") // 99 is not in the graph at all
    val hops = Graph.kHopMinHops(chain, seeds, k = 3)
      .rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Int]).toMap
    // node 5 is 4 hops out — beyond k=3, absent; isolated seed still hop 0
    hops shouldBe Map(1L -> 0, 99L -> 0, 2L -> 1, 3L -> 2, 4L -> 3)
  }

  test("kHopMinHops: min over multiple seeds and converging paths") {
    // diamond 1→2→4, 1→3→4 plus a long way 1→5→6→4: min(4) = 2
    val g = Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L),
      (1L, 5L), (5L, 6L), (6L, 4L)).toDF("src", "dst")
    val hops = Graph.kHopMinHops(g, Seq(1L).toDF("id"), k = 3)
      .rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Int]).toMap
    hops(4L) shouldBe 2
    hops(6L) shouldBe 2
    hops(1L) shouldBe 0
  }

  test("edge lifecycle: save/load round-trip, append lands in the recorded layout, meta guards") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_edges").toString
    val base = Seq((1L, 2L), (2L, 3L), (1L, 2L)) // duplicate collapses at save
    Graph.saveEdges(base.toDF("src", "dst"), "src", "dst", tmp, buckets = 4)
    Graph.edgeBuckets(spark, tmp) shouldBe 4
    val loaded = Graph.loadEdges(spark, tmp)
      .rows.map(r => (r.head, r(1))).toSet
    loaded shouldBe Set((1L, 2L), (2L, 3L))
    // append a disjoint delta: base files stand, combined set is the union
    Graph.appendEdges(Seq((3L, 4L)).toDF("src", "dst"), "src", "dst", tmp)
    Graph.loadEdges(spark, tmp).rows.map(r => (r.head, r(1))).toSet shouldBe
      Set((1L, 2L), (2L, 3L), (3L, 4L))
    // algorithms consume the persisted frame directly
    Graph.degrees(Graph.loadEdges(spark, tmp))
      .rows.map(r => (r.head, r(1), r(2))).toSet shouldBe
      Set((1L, 1L, 0L), (2L, 1L, 1L), (3L, 1L, 1L), (4L, 0L, 1L))
    // a directory that is not an edge frame fails loudly, no silent default
    an[Exception] should be thrownBy
      Graph.edgeBuckets(spark, tmp + "/nonexistent")
  }

  private def ppr(edges: Seq[(Long, Long)], seeds: Seq[Long], iters: Int) =
    Graph.personalizedPageRank(edges.toDF("src", "dst"),
        seeds.toDF("id"), iters = iters)
      .rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Double])
      .toMap

  test("personalizedPageRank: one hand-computed iteration, restart mass returns to the seed") {
    // cycle 1⇄2, seed {1}: r0 = (1, 0); after one round
    // pr(1) = 0.15·1 + 0.85·(inflow 0) = 0.15, pr(2) = 0.85·1 = 0.85
    val p = ppr(Seq((1L, 2L), (2L, 1L)), Seq(1L), iters = 1)
    p(1L) shouldBe 0.15 +- 1e-12
    p(2L) shouldBe 0.85 +- 1e-12
  }

  test("personalizedPageRank: dangling mass re-seeds (not table-wide); conservation") {
    // 1→2 with 2 dangling, seed {1}: iter1 → (0.15, 0.85);
    // iter2: dm = 0.85 lands back ON THE SEED:
    // pr(1) = 0.15 + 0.85·(0 + 0.85) = 0.8725, pr(2) = 0.85·0.15 = 0.1275
    val p = ppr(Seq((1L, 2L)), Seq(1L), iters = 2)
    p(1L) shouldBe 0.8725 +- 1e-9
    p(2L) shouldBe 0.1275 +- 1e-9
    p.values.sum shouldBe 1.0 +- 1e-9
    // seed bias: on the bidirectional path 1⇄2⇄3 the seed-adjacent
    // node outranks the 2-hop one (hand-traced through 8 rounds)
    val chain = ppr(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)),
      Seq(1L), iters = 8)
    chain(2L) should be > chain(3L)
    chain.values.sum shouldBe 1.0 +- 1e-9
  }

  test("personalizedPageRank: off-graph seed still carries rank; empty seeds reject") {
    val p = ppr(Seq((1L, 2L)), Seq(1L, 99L), iters = 1)
    p.keySet shouldBe Set(1L, 2L, 99L)
    p.values.sum shouldBe 1.0 +- 1e-9
    an[IllegalArgumentException] should be thrownBy
      Graph.personalizedPageRank(Seq((1L, 2L)).toDF("src", "dst"),
        spark.emptyDataset[Long].toDF("id")).count()
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int = 5) =
    Graph.labelPropagation(edges.toDF("src", "dst"), iters = iters)
      .rows.map(r => r.head.asInstanceOf[Long] -> r(1).asInstanceOf[Long])
      .toMap

  test("labelPropagation: two disjoint bidirectional triangles settle on their min labels") {
    def tri(a: Long, b: Long, c: Long) =
      Seq((a, b), (b, a), (b, c), (c, b), (a, c), (c, a))
    lpa(tri(1L, 2L, 3L) ++ tri(4L, 5L, 6L)) shouldBe
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 4L)
  }

  test("labelPropagation: keep-own without in-neighbors; smallest label wins ties") {
    // 1→2: node 1 has no in-neighbors and keeps its own label
    lpa(Seq((1L, 2L)), iters = 1) shouldBe Map(1L -> 1L, 2L -> 1L)
    // 2→1, 3→1: node 1 sees the tied label set {2, 3} — smallest wins
    lpa(Seq((2L, 1L), (3L, 1L)), iters = 1) shouldBe
      Map(1L -> 2L, 2L -> 2L, 3L -> 3L)
  }

  test("adamicAdar: unlinked pair scores 1/ln(deg) per common neighbor; edges excluded") {
    // path 1—2—3: the only unlinked pair is (1,3), via center 2 with
    // degree 2 → score 1/ln 2; the linked pairs never appear
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val out = Graph.adamicAdar(e).rows.map(r => (r.head, r(1), r(2), r(3)))
    out.size shouldBe 1
    val (u, v, s, rank) = out.head
    (u, v, rank) shouldBe ((1L, 3L, 1L))
    s.asInstanceOf[Double] shouldBe (1.0 / math.log(2.0)) +- 1e-9
  }

  test("adamicAdar: degree cap silences hub wedges; observer reports the hub") {
    // star: center 9 joined to 1..4 (deg 4). Cap 3 → no wedge centers
    // survive → no candidates; the dropped hub surfaces with its degree
    val e = (1L to 4L).flatMap(l => Seq((9L, l), (l, 9L))).toDF("src", "dst")
    Graph.adamicAdar(e, maxDegree = 3L).count() shouldBe 0L
    Graph.adamicAdarDroppedHubs(e, maxDegree = 3L)
      .rows.map(r => (r.head, r(1))) shouldBe Seq((9L, 4L))
    // cap clear of the hub: leaves pair through the center, C(4,2) rows
    Graph.adamicAdar(e, maxDegree = 4L).count() shouldBe 6L
  }

  test("assortativity: a 3-path is perfectly disassortative; regular graphs are undefined") {
    // path 1—2—3: every edge joins a degree-1 leaf to the degree-2
    // middle → r = −1 exactly (hand-checked co-moments)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = Graph.assortativity(path).rows.head
    (r.head, r(1)) shouldBe ((2L, -1.0f))
    // 4-cycle: all degrees equal → zero variance → NULL, not NaN
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val c = Graph.assortativity(cyc).rows.head
    c.head shouldBe 4L
    assert(c(1) == null)
  }

  test("kCore: pendant peels away, cascade empties below the core's k") {
    // triangle 1-2-3 with pendant 4—1: the 2-core is the triangle
    // (round 1 drops 4, degrees re-settle at 2); a k=3 demand
    // cascades to empty — the triangle's degrees are only 2
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val core2 = Graph.kCore(e, k = 2)
      .orderBy("id").rows.map(r => (r.head, r(1)))
    core2 shouldBe Seq((1L, 2L), (2L, 2L), (3L, 2L))
    Graph.kCore(e, k = 3).count() shouldBe 0L
  }

  test("kCore: cascading peel crosses rounds — a chain dies one link per round") {
    // path 1—2—3—4—5: every k=2 peel removes only the current endpoints,
    // so the chain needs multiple rounds to vanish; truncating at
    // rounds = 1 leaves (2,3),(3,4) still peelable — the convergence
    // observer must refuse to ship that superset
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    Graph.kCore(path, k = 2, rounds = 8).count() shouldBe 0L
    intercept[IllegalStateException] {
      Graph.kCore(path, k = 2, rounds = 1).count()
    }.getMessage should include("superset")
  }

  test("kCore: a graph needing a 9th peel round fails loudly at the default 8") {
    // path of 18 edges: each k=2 round peels only the two end links, so
    // emptying needs ⌈18/2⌉ = 9 rounds — at the default 8 one edge
    // still peels and the observer throws; at 9 it converges to empty
    val long = (1L to 18L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalStateException] {
      Graph.kCore(long, k = 2).count()
    }.getMessage should include("8 rounds")
    Graph.kCore(long, k = 2, rounds = 9).count() shouldBe 0L
  }

  test("hits: directed bipartite graph splits authority and hub exactly") {
    // 1→3, 2→3: node 3 is pure authority (a=1, h=0), nodes 1 and 2 are
    // pure hubs (h=0.5 each, a=0) — the fixture a src/dst transposition
    // or a swapped a/h update cannot pass
    val e = Seq((1L, 3L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.hits(e, iters = 8)
      .orderBy("id").rows.map(r => (r.head, r(1), r(2)))
    out shouldBe Seq((1L, 0.0, 0.5), (2L, 0.0, 0.5), (3L, 1.0, 0.0))
  }

  test("neighborJaccard: common-over-union with full degrees; edges excluded") {
    // path 1—2—3 plus 3—4: pair (1,3) via center 2: common 1,
    // deg(1)=1, deg(3)=2 → 1/(1+2−1)=0.5; (2,4) via 3: 1/(2+1−1)=0.5;
    // (1,4) shares nothing → absent. Ties rank by (u, v).
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val out = Graph.neighborJaccard(e)
      .rows.map(r => (r.head, r(1), r(2), r(3), r(4)))
    out shouldBe Seq(
      (1L, 3L, 1L, 0.5f, 1L),
      (2L, 4L, 1L, 0.5f, 2L))
  }

  test("neighborJaccard: capped hub drops its wedges; union degrees stay full") {
    // star 9—{1,2,3} (deg 9 = 3) + 1—5, 2—5. Cap 2 silences center 9,
    // so (5,9) is seen only via centers 1 and 2 → common 2, and the
    // denominator still uses 9's FULL degree 3: 2/(2+3−2) = 2/3;
    // (1,2) via center 5 → 1/(2+2−1) = 1/3. Uncapped, center 9's
    // wedges reappear: (1,2) common 2 → jaccard 1.0 tops the list.
    val e = Seq((9L, 1L), (9L, 2L), (9L, 3L), (1L, 5L), (2L, 5L))
      .toDF("src", "dst")
    val capped = Graph.neighborJaccard(e, maxDegree = 2L)
      .rows.map(r => (r.head, r(1), r(2), r(3), r(4)))
    capped shouldBe Seq(
      (5L, 9L, 2L, (2.0 / 3.0).toFloat, 1L),
      (1L, 2L, 1L, (1.0 / 3.0).toFloat, 2L))
    val full = Graph.neighborJaccard(e)
      .rows.map(r => (r.head, r(1), r(3)))
    full.head shouldBe ((1L, 2L, 1.0f))
  }

  test("hits: one L1-normalized round by hand on a directed hub/authority split") {
    // 1→3, 1→4, 2→3: after round 1, a = (0, 0, 2/3, 1/3) and, scored
    // against the FRESH a, h = (1, 2/3, 0, 0)/ (5/3) = (0.6, 0.4, 0, 0)
    val e = Seq((1L, 3L), (1L, 4L), (2L, 3L)).toDF("src", "dst")
    val out = Graph.hits(e, iters = 1)
      .rows.map(r => r.head.asInstanceOf[Long] ->
        (r(1).asInstanceOf[Double], r(2).asInstanceOf[Double])).toMap
    out(3L)._1 shouldBe (2.0 / 3.0) +- 1e-9
    out(4L)._1 shouldBe (1.0 / 3.0) +- 1e-9
    out(1L)._2 shouldBe 0.6 +- 1e-9
    out(2L)._2 shouldBe 0.4 +- 1e-9
    out(1L)._1 shouldBe 0.0
    out(3L)._2 shouldBe 0.0
  }

  test("labelPropagation: string node ids are rejected loudly (tie-break needs numeric)") {
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val ex = the[IllegalArgumentException] thrownBy
      Graph.labelPropagation(e)
    ex.getMessage should include("numeric node ids")
  }
}
