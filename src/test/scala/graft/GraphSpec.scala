package graft

import graft.operators.{KCore, MassFlow, Triangles}
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def edgesDf(pairs: (Long, Long)*) =
    pairs.toDF("src", "dst")

  test("mass is conserved exactly every round, dead ends included") {
    // 1 -> 2 -> 3, 3 is a dead end; 4 -> 2 as a second inbound
    val e = edgesDf((1L, 2L), (2L, 3L), (4L, 2L))
    for (k <- 1 to 5) {
      val m = MassFlow.propagate(e, iters = k)
      assert(m.agg(sum($"mass")).as[Long].head() == 4L * 1000000L,
        s"mass leaked at iteration $k")
    }
  }

  test("hand-computed star: center splits evenly, remainder stays put") {
    // center 10 -> leaves 1,2,3 (leaves are dead ends)
    val e = edgesDf((10L, 1L), (10L, 2L), (10L, 3L))
    val m1 = MassFlow.propagate(e, iters = 1).as[(Long, Long)].collect().toMap
    assert(m1(10L) == 1000000L % 3)       // keeps the remainder (1)
    assert(m1(1L) == 1000000L + 1000000L / 3) // own mass + share
    assert(m1(2L) == m1(1L) && m1(3L) == m1(1L))
    // a second round changes nothing: every remaining holder is a dead
    // end except the center, whose 1-unit remainder splits as 0
    val m2 = MassFlow.propagate(e, iters = 2).as[(Long, Long)].collect().toMap
    assert(m2 == m1)
  }

  test("parallel edges carry mass per-edge, not per-neighbor") {
    // two parallel edges a->b and one a->c: b receives 2 shares
    val e = edgesDf((1L, 2L), (1L, 2L), (1L, 3L))
    val m = MassFlow.propagate(e, iters = 1).as[(Long, Long)].collect().toMap
    val share = 1000000L / 3
    assert(m(2L) == 1000000L + 2 * share)
    assert(m(3L) == 1000000L + share)
    assert(m(1L) == 1000000L % 3)
  }

  test("result is independent of input partitioning") {
    val pairs = (1L to 400L).map(i => (i % 37, (i * 7) % 41))
      .filter { case (a, b) => a != b }
    val once = MassFlow.propagate(edgesDf(pairs: _*).repartition(1), iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val many = MassFlow.propagate(edgesDf(pairs: _*).repartition(13), iters = 3)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(once == many)
  }

  test("property: distributed mass flow equals a local reference on random multigraphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // arbitrary shapes: self-loops, parallel edges, dead ends, isolated-
    // by-direction nodes — the local fold is the ground truth the
    // distributed joins must reproduce exactly
    val genGraph = for {
      nNodes <- Gen.choose(2, 12)
      nEdges <- Gen.choose(1, 30)
      edges <- Gen.listOfN(nEdges, for {
        s <- Gen.choose(0, nNodes - 1)
        d <- Gen.choose(0, nNodes - 1)
      } yield (s.toLong, d.toLong))
      iters <- Gen.choose(1, 3)
    } yield (edges, iters)
    val prop = Prop.forAll(genGraph) { case (edges, iters) =>
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val out = edges.groupBy(_._1)
      var mass = nodes.map(_ -> 1000000L).toMap
      for (_ <- 1 to iters) {
        val next = scala.collection.mutable.Map(nodes.map(n => n -> 0L): _*)
        for (n <- nodes) {
          val m = mass(n)
          out.get(n) match {
            case None => next(n) += m
            case Some(es) =>
              next(n) += m % es.size
              es.foreach { case (_, dst) => next(dst) += m / es.size }
          }
        }
        mass = next.toMap
      }
      val got = MassFlow.propagate(edgesDf(edges: _*), iters)
        .as[(Long, Long)].collect().toMap
      got == mass
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("propagate rejects a non-positive iteration count") {
    intercept[IllegalArgumentException] {
      MassFlow.propagate(edgesDf((1L, 2L)), iters = 0)
    }
  }

  test("reliable-checkpoint mode: identical results, checkpoint data actually written") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L), (5L, 4L), (2L, 5L))
    val local = MassFlow.propagate(edgesDf(edges: _*), iters = 4)
      .as[(Long, Long)].collect().toMap
    val reliable = MassFlow.propagate(edgesDf(edges: _*), iters = 4,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(reliable == local)

    // star-contraction CC under the same switch: identical labels
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L), (32L, 30L))
      .toDF("a", "b")
    val lLocal = graft.textops.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val lReliable = graft.textops.Dedup.connectedComponents(pairs,
        checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(lReliable == lLocal)

    // the mode is real: per-round state was persisted under dir (the
    // property that survives executor loss on a cluster)
    def anyFile(f: java.io.File): Boolean =
      f.isFile || Option(f.listFiles).getOrElse(Array.empty[java.io.File]).exists(anyFile)
    assert(anyFile(new java.io.File(dir)), s"no checkpoint data written under $dir")
  }

  test("reliable-checkpoint loop completes IDENTICALLY through injected task failures") {
    // the r9 mode was spec-proven identical on the happy path only; this
    // drives the RETRY path. Every first ATTEMPT of partition 0 in any
    // stage evaluating the flaky column throws; the session master is
    // local[4, 2] (maxFailures=2), so Spark reschedules the task, the
    // second attempt (attemptNumber=1) passes, and the multi-round loop —
    // checkpointing reliably each round — must finish with results
    // identical to the failure-free run. On a real cluster this is the
    // executor-crash-mid-loop contract the reliable mode exists for.
    // a STATIC field, not a closure-captured flag and not an accumulator:
    // UDF closures are serialized even in local mode (mutating a captured
    // object updates a copy), and user-accumulator updates from FAILED
    // tasks are dropped (countFailedValues=false) — but local mode runs
    // executor code in the driver JVM, so a companion-object field is
    // genuinely shared
    FaultInjection.fired.set(0)
    val flakyOnce = udf { (x: Long) =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 0) {
        FaultInjection.fired.incrementAndGet()
        throw new RuntimeException("injected first-attempt failure")
      }
      x
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-fault").toString
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L), (5L, 4L), (2L, 5L))
    val expected = MassFlow.propagate(edgesDf(edges: _*), iters = 3)
      .as[(Long, Long)].collect().toMap
    val flakyEdges = edgesDf(edges: _*)
      .repartition(4) // >1 partition so partition 0 exists alongside healthy ones
      .withColumn("src", flakyOnce($"src"))
    val got = MassFlow.propagate(flakyEdges, iters = 3, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(FaultInjection.fired.get() > 0,
      "fault injection never fired — the test proved nothing")
    assert(got == expected, "loop result drifted across a task retry")
  }

  // ---- Triangles ----

  private def triDf(pairs: (Long, Long)*) = pairs.toDF("u", "v")

  private def bruteTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = adj.keys.toSeq.sorted
    val counts = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- und
      c <- nodes if c > b && adj(a).contains(c) && adj(b).contains(c)
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    counts.toMap
  }

  test("triangles: hand case — K4 gives every node 3 triangles") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val got = Triangles.perNodeCounts(triDf(k4: _*))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: duplicates, reversals, and self-loops do not change counts") {
    val messy = triDf((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (1L, 2L))
    val clean = triDf((1L, 2L), (2L, 3L), (1L, 3L))
    val g1 = Triangles.perNodeCounts(messy).as[(Long, Long)].collect().toMap
    val g2 = Triangles.perNodeCounts(clean).as[(Long, Long)].collect().toMap
    assert(g1 == g2 && g1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---- KCore ----

  private def bruteKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    var alive = (und.map(_._1) ++ und.map(_._2)).toSet
    var changed = true
    while (changed && alive.nonEmpty) {
      val deg = und.filter { case (a, b) => alive(a) && alive(b) }
        .flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      val next = alive.filter(n => deg.getOrElse(n, 0L) >= k)
      changed = next != alive
      alive = next
    }
    und.filter { case (a, b) => alive(a) && alive(b) }
      .flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
  }

  test("k-core: K5 survives k=4, dangling chain peels away transitively") {
    // K5 plus a chain 5-6-7 hanging off node 1: the chain has degree <4
    // and must peel in cascade, leaving exactly the clique
    val k5 = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val e = triDf(k5 ++ Seq((1L, 5L), (5L, 6L), (6L, 7L)): _*)
      .withColumnRenamed("u", "u").withColumnRenamed("v", "v")
    val got = KCore.kCore(e, k = 4).as[(Long, Long)].collect().toMap
    assert(got == (0L to 4L).map(_ -> 4L).toMap, got.toString)
    // above the clique degree the core is empty
    assert(KCore.kCore(e, k = 5).count() == 0)
    // the delta-peeling variant is output-identical on both cases
    val gotD = KCore.kCoreDelta(e, k = 4).as[(Long, Long)].collect().toMap
    assert(gotD == got, gotD.toString)
    assert(KCore.kCoreDelta(e, k = 5).count() == 0)
    // the reliable-checkpoint fault-model path is output-identical for
    // both variants (the cross-process retry proof lives in ClusterChecks)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-kcore").toString
    val gotCk = KCore.kCore(e, k = 4, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    val gotDCk = KCore.kCoreDelta(e, k = 4, checkpointDir = Some(dir))
      .as[(Long, Long)].collect().toMap
    assert(gotCk == got && gotDCk == got, (gotCk, gotDCk).toString)
  }

  test("property: distributed k-core equals local peeling on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      nNodes <- Gen.choose(3, 14)
      nEdges <- Gen.choose(1, 45)
      edges <- Gen.listOfN(nEdges, for {
        s <- Gen.choose(0, nNodes - 1)
        d <- Gen.choose(0, nNodes - 1)
      } yield (s.toLong, d.toLong))
      k <- Gen.choose(1, 5)
    } yield (edges, k)
    val prop = Prop.forAll(genCase) { case (edges, k) =>
      val truth = bruteKCore(edges, k)
      val got = KCore.kCore(triDf(edges: _*), k).as[(Long, Long)].collect().toMap
      val gotD = KCore.kCoreDelta(triDf(edges: _*), k).as[(Long, Long)].collect().toMap
      got == truth && gotD == truth
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: degree-ordered triangle counts equal brute force on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      nNodes <- Gen.choose(3, 14)
      nEdges <- Gen.choose(1, 40)
      edges <- Gen.listOfN(nEdges, for {
        s <- Gen.choose(0, nNodes - 1)
        d <- Gen.choose(0, nNodes - 1)
      } yield (s.toLong, d.toLong))
    } yield edges
    val prop = Prop.forAll(genGraph) { edges =>
      val truth = bruteTriangles(edges)
      val wedge = Triangles.perNodeCounts(triDf(edges: _*))
        .as[(Long, Long)].collect().toMap
      // compact-forward must produce the IDENTICAL per-node counts —
      // it is the catalog entry's execution strategy
      val adjacency = Triangles.perNodeCountsAdjacency(triDf(edges: _*))
        .as[(Long, Long)].collect().toMap
      wedge == truth && adjacency == truth
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("BFS: hand-computed path graph, unreached nodes absent, depth cap respected") {
    // 1 -> 2 -> 3 -> 4 -> 5, plus disconnected 9 -> 10
    val e = edgesDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 10L))
    val got = graft.operators.Bfs.hops(e, Seq(1L).toDF("node"), maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L)) // 5 beyond cap, 9/10 unreached
  }

  test("property: frontier BFS equals local min-hop reference on random multigraphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      n <- Gen.choose(2, 25)
      m <- Gen.choose(1, 80)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n.toLong - 1), Gen.choose(0L, n.toLong - 1)))
      srcs <- Gen.nonEmptyListOf(Gen.choose(0L, n.toLong - 1))
      depth <- Gen.choose(0, 5)
    } yield (es, srcs.distinct, depth)
    val prop = Prop.forAll(genGraph) { case (es, srcs, depth) =>
      // local reference: textbook queue BFS over an adjacency map
      val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      var dist = srcs.map(_ -> 0L).toMap
      var frontier = srcs.toSet
      for (d <- 1 to depth) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Set.empty)) -- dist.keySet
        dist ++= next.map(_ -> d.toLong)
        frontier = next
      }
      val got = graft.operators.Bfs.hops(edgesDf(es: _*), srcs.toDF("node"), depth)
        .as[(Long, Long)].collect().toMap
      got == dist
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("BFS/SSSP lineage is truncated: plan size does not grow with depth") {
    // the property that keeps round N as cheap as round 1 on a cluster —
    // without per-round truncation the logical plan (and its recompute
    // cost under a lost partition) grows linearly with depth
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case p => p }.size
    val e = edgesDf((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L))
    val ew = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L)).toDF("src", "dst", "w")
    val bfsShallow = planNodes(graft.operators.Bfs.hops(e, Seq(1L).toDF("node"), 1))
    val bfsDeep = planNodes(graft.operators.Bfs.hops(e, Seq(1L).toDF("node"), 6))
    assert(bfsDeep <= bfsShallow,
      s"BFS plan grew with depth: $bfsShallow nodes at 1 hop, $bfsDeep at 6")
    val ssspShallow = planNodes(graft.operators.Sssp.hopBounded(ew, Seq(1L).toDF("node"), 1))
    val ssspDeep = planNodes(graft.operators.Sssp.hopBounded(ew, Seq(1L).toDF("node"), 6))
    assert(ssspDeep <= ssspShallow,
      s"SSSP plan grew with depth: $ssspShallow nodes at 1 round, $ssspDeep at 6")
  }

  test("SSSP: hand case — longer path with smaller weight wins within the hop bound") {
    // 1 -(10)-> 3 direct, but 1 -(1)-> 2 -(1)-> 3 is cheaper; at 1 round
    // only the direct edge is visible
    val e = Seq((1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L)).toDF("src", "dst", "w")
    val r1 = graft.operators.Sssp.hopBounded(e, Seq(1L).toDF("node"), 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    val r2 = graft.operators.Sssp.hopBounded(e, Seq(1L).toDF("node"), 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("property: delta Bellman-Ford equals local k-round relaxation on random weighted graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genGraph = for {
      n <- Gen.choose(2, 20)
      m <- Gen.choose(1, 60)
      es <- Gen.listOfN(m, for {
        s <- Gen.choose(0L, n.toLong - 1); d <- Gen.choose(0L, n.toLong - 1)
        w <- Gen.choose(0L, 50L)
      } yield (s, d, w))
      srcs <- Gen.nonEmptyListOf(Gen.choose(0L, n.toLong - 1))
      depth <- Gen.choose(0, 4)
    } yield (es, srcs.distinct, depth)
    val prop = Prop.forAll(genGraph) { case (es, srcs, depth) =>
      // local reference: naive k-round Bellman-Ford over the full map
      var dist = srcs.map(_ -> 0L).toMap
      for (_ <- 1 to depth) {
        val relaxed = es.flatMap { case (s, d, w) => dist.get(s).map(ds => d -> (ds + w)) }
        dist = (dist.toSeq ++ relaxed).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
      }
      val got = graft.operators.Sssp
        .hopBounded(es.toDF("src", "dst", "w"), srcs.toDF("node"), depth)
        .as[(Long, Long)].collect().toMap
      got == dist
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}

/** JVM-shared fault counter for the retry-path smoke (see the test's
  * comment on why neither a closure flag nor an accumulator works).
  */
object FaultInjection {
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)
}
