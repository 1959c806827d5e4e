package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(String, String)],
                    iters: Int = 30): Map[String, Double] =
    Graph.pagerank(edges.toDF("src", "dst"), iters = iters)
      .as[(String, Double)].collect().toMap

  test("pagerank on a symmetric pair is uniform") {
    val r = ranks(Seq("a" -> "b", "b" -> "a"))
    assert(r.keySet == Set("a", "b"))
    assert(math.abs(r("a") - r("b")) < 1e-9)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("star center outranks leaves and mass is conserved on a bidirected graph") {
    val leaves = (1 to 5).map(i => s"l$i")
    val star = leaves.flatMap(l => Seq("hub" -> l, l -> "hub"))
    val r = ranks(star)
    assert(leaves.forall(l => r("hub") > r(l)))
    // bidirected => no dangling mass lost; ranks still sum to 1
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
    // leaves are symmetric
    val lv = leaves.map(r)
    assert(lv.max - lv.min < 1e-9)
  }

  test("chain converges to the known 3-node values") {
    // a<->b<->c (bidirected path): stationary ranks are
    // (1-d)/N + d*(...): classic result center > ends, ends equal
    val r = ranks(Seq("a" -> "b", "b" -> "a", "b" -> "c", "c" -> "b"), iters = 60)
    assert(r("b") > r("a") && math.abs(r("a") - r("c")) < 1e-9)
    // closed form for d=0.85, N=3: end = (1-d)/3 + d*center/2,
    // center = (1-d)/3 + d*(end_a + end_c); solve: center = (1+d)/(3(1+d)) ...
    // verify via one more hand iteration instead: applying the update to the
    // returned fixpoint must not move it
    // tolerance tracks the power-iteration residual: 0.85^60 ≈ 6e-5
    val base = 0.15 / 3
    val nextA = base + 0.85 * r("b") / 2
    val nextB = base + 0.85 * (r("a") + r("c"))
    assert(math.abs(nextA - r("a")) < 1e-4)
    assert(math.abs(nextB - r("b")) < 1e-4)
  }

  test("parallel edges weight contributions") {
    // a sends to b twice and c once: b gets 2/3 of a's damped mass
    val r = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c",
      "b" -> "a", "c" -> "a"))
    assert(r("b") > r("c"))
  }

  test("iters must be positive") {
    intercept[IllegalArgumentException] {
      Graph.pagerank(Seq("a" -> "b").toDF("src", "dst"), iters = 0)
    }
  }

  test("epsilon early-exit stops at a converged checkpoint with the fixed-iters ranks") {
    // symmetric pair converges in ONE round (uniform is the fixpoint), so
    // the first epsilon check (checkpoint at round 2) must stop the loop —
    // iters=1000 with per-round O(E) work would take seconds if it didn't
    val edges = Seq("a" -> "b", "b" -> "a").toDF("src", "dst")
    val t0 = System.nanoTime()
    val r = Graph.pagerank(edges, iters = 1000, checkpointInterval = 2,
        epsilon = Some(1e-12))
      .as[(String, Double)].collect().toMap
    val secs = (System.nanoTime() - t0) / 1e9
    val fixed = Graph.pagerank(edges, iters = 10).as[(String, Double)]
      .collect().toMap
    assert(r.keySet == fixed.keySet)
    r.foreach { case (k, v) => assert(math.abs(v - fixed(k)) < 1e-9) }
    // 1000 fixed rounds of job launches cannot finish in early-exit time;
    // generous bound still catches a no-exit regression (measured: ~2 s for
    // 4 rounds vs minutes for 1000)
    assert(secs < 60.0, s"early exit did not trigger: took $secs s")
  }

  test("triangleCounts: K4 plus a pendant, robust to duplicate/reversed/self edges") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles; each node in 3) + pendant 5-1 (none)
    val k4 = for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong)
    val noisy = k4 ++ k4.map(_.swap) ++ Seq((1L, 1L), (5L, 1L), (1L, 5L))
    val out = Graph.triangleCounts(noisy.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("bfsLevels: chain distances, early exit past component edge, maxHops cap") {
    import spark.implicits._
    // chain 1-2-3-4-5 plus isolated pair 8-9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    val src = Seq(1L).toDF("node")
    val full = Graph.bfsLevels(edges, src, maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    val capped = Graph.bfsLevels(edges, src, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // multi-source: closer source wins the level
    val multi = Graph.bfsLevels(edges, Seq(1L, 4L).toDF("node"), maxHops = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(multi == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 0L, 5L -> 1L))
  }

  test("triangleCounts: triangle with a tail counts only the cycle nodes") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val out = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation separates two bridged triangles") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the bridge 3-4; sync LPA
    // with the min-label tiebreak settles to communities 1 and 3 (the
    // hand-traced fixpoint, reached at round 4)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation is synchronous (pair swaps on odd rounds) and ignores self-loops/duplicates") {
    import spark.implicits._
    val pair = Seq((10L, 20L), (20L, 10L), (10L, 10L), (10L, 20L))
      .toDF("src", "dst")
    // a lone edge oscillates under the synchronous update: odd round
    // count = swapped labels — pins the update rule AND dedup of the
    // reversed/self-loop inputs (a double-counted edge would not swap)
    val odd = Graph.labelPropagation(pair, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(odd == Map(10L -> 20L, 20L -> 10L))
    val even = Graph.labelPropagation(pair, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(even == Map(10L -> 10L, 20L -> 20L))
  }

  test("labelPropagation matches a driver reference on random graphs (both adaptive postures)") {
    import spark.implicits._
    // driver-side synchronous LPA with the same min-label tiebreak; the
    // random graphs traverse BOTH adaptive paths (full rounds while the
    // frontier is wide, delta rounds once |changed| < V/5), so equality
    // here pins that the two postures compute the same rounds
    def ref(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val und = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, (e._2, e._1))).distinct
      val ins = und.groupBy(_._2).map { case (n, es) => n -> es.map(_._1) }
      var lab = ins.keys.map(n => n -> n).toMap
      for (_ <- 1 to iters)
        lab = ins.map { case (n, nb) =>
          n -> -nb.groupBy(lab).toSeq.map { case (l, xs) => (xs.size, -l) }.max._2
        }
      lab
    }
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val n = 24
      val edges = Seq.fill(30)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val want = ref(edges, 4)
      val got = Graph.labelPropagation(edges.toDF("src", "dst"), iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"trial $trial: got $got want $want")
    }
  }

  test("kCore peels the pendant chain in cascading rounds; fixpoint is budget-stable") {
    import spark.implicits._
    // triangle 1-2-3 with a pendant chain 3-4-5: at k=2, node 5 falls
    // round 1, which drops node 4 below k in round 2 — the cascade
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (1L, 1L), (2L, 1L)) // self-loop + reversed duplicate: ignored
      .toDF("src", "dst")
    def run(rounds: Int) = Graph.kCore(g, k = 2L, rounds = rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one round: only node 5 is gone; 4 still holds its now-deg-1 edge
    assert(run(1) == Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    // two rounds reach the true 2-core; a larger budget must not differ
    val core = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(run(2) == core)
    assert(run(10) == core, "rounds past the fixpoint are no-ops")
    // k above the max degree peels everything
    assert(Graph.kCore(g, k = 4L, rounds = 5).isEmpty)
    assertThrows[IllegalArgumentException](Graph.kCore(g, 0L, 3))
  }

  test("coreness: iterated h-index converges to core numbers on the triangle+chain") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    def run(r: Int) = Graph.coreness(g, rounds = r)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // triangle is the 2-core, the chain pendants are coreness 1
    val expected = Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L)
    assert(run(4) == expected)
    assert(run(10) == expected, "rounds past the fixpoint are no-ops")
    // the sequence is monotone non-increasing from degrees toward coreness
    val r1 = run(1)
    assert(expected.forall { case (n, c) => r1(n) >= c })
    assertThrows[IllegalArgumentException](Graph.coreness(g, rounds = 0))
  }

  test("adamicAdar: common-neighbor scoring, adjacency excluded") {
    import spark.implicits._
    // square 2-1-3, 2-4-3: (2,3) and (1,4) each share two degree-2
    // neighbors → aa = 2/ln2 = 2.885390… → 2.88539
    val sq = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L))
      .toDF("src", "dst")
    val got = Graph.adamicAdar(sq, maxDeg = 30, minCommon = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == Map((2L, 3L) -> ((2L, 2.88539)),
      (1L, 4L) -> ((2L, 2.88539))))
    // closing (2,3) removes it from the candidates; (1,4) now scores
    // through two degree-3 centers: 2/ln3 = 1.820478… → 1.82048
    val closed = sq.unionAll(Seq((2L, 3L)).toDF("src", "dst"))
    val got2 = Graph.adamicAdar(closed, maxDeg = 30, minCommon = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(got2 == Map((1L, 4L) -> 1.82048), s"got $got2")
  }

  test("hits: bipartite hubs/authorities hand-checked over 3 rounds") {
    import spark.implicits._
    // u1→{p1,p2}, u2→{p1}: after 3 L1-normalized rounds
    // hubs (0.617647, 0.382353), authorities (0.619048, 0.380952)
    val e = Seq((10L, 1L), (10L, 2L), (20L, 1L)).toDF("src", "dst")
    val got = Graph.hits(e, iters = 3)
      .as[(Long, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (10L, "hub") -> 0.61765, (20L, "hub") -> 0.38235,
      (1L, "authority") -> 0.61905, (2L, "authority") -> 0.38095),
      s"got $got")
    assertThrows[IllegalArgumentException](Graph.hits(e, iters = 0))
  }

  test("assortativity: star is -1, regular graph has no variance (null)") {
    import spark.implicits._
    // K1,3: every edge joins the deg-3 hub to a deg-1 leaf — perfectly
    // disassortative, r = −1
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val s = Graph.assortativity(star)
      .as[(Long, Option[Double])].collect().head
    assert(s == ((3L, Some(-1.0))))
    // K3: all degrees equal → zero variance → undefined (null), not NaN
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    val t = Graph.assortativity(tri)
      .as[(Long, Option[Double])].collect().head
    assert(t == ((3L, None)))
  }

  test("modularity: two bridged triangles hand-checked") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 4L)).toDF("node", "community")
    // m=7; each triangle: e_intra 3, d_tot 7 →
    // q = 3/7 − (7/14)² = 0.178571… → 0.17857; Q = 2·q ≈ 0.357
    val got = Graph.modularity(tri, labels)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((3L, 3L, 7L, 0.17857)))
    assert(got(4L) == ((3L, 3L, 7L, 0.17857)))
  }

  test("personalizedPagerank: mass conserved, decays with distance from the seed") {
    import spark.implicits._
    // bidirected chain 1-2-3-4, seed {1}
    val chain = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L),
      (4L, 3L)).toDF("src", "dst")
    val pr = Graph.personalizedPagerank(chain, Seq(Tuple1(1L)).toDF("node"),
        iters = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr.values.sum - 1.0) < 1e-9) // no dangling leak
    // the degree-1 seed funnels its whole mass to node 2, so 2 out-ranks
    // the seed itself (stationary r2 ≈ 1.185·r1); beyond the seed's
    // neighborhood rank decays monotonically with distance
    assert(pr(2L) > pr(1L) && pr(2L) > pr(3L) && pr(3L) > pr(4L))
    assert(pr(1L) > pr(3L))
    // uniform seeds over ALL nodes on a regular graph = plain uniform rank
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 2L),
      (1L, 3L)).toDF("src", "dst")
    val uni = Graph.personalizedPagerank(ring,
        Seq(1L, 2L, 3L).toDF("node"), iters = 10)
      .collect().map(_.getDouble(1))
    assert(uni.forall(r => math.abs(r - 1.0 / 3) < 1e-12))
    // a seed id absent from the graph is an error, not silent zero mass
    intercept[IllegalArgumentException](Graph.personalizedPagerank(
      ring, Seq(99L).toDF("node"), iters = 2))
  }
}
