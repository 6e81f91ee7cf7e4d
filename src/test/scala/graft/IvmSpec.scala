package graft

import graft.operators.Ivm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental join / join-agg maintenance: any chunking of the deltas
  * converges to the one-shot result, and retractions cancel exactly.
  */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def relA(rows: (Long, Long)*): DataFrame = // (k, a_cents)
    Ivm.weighted(rows.toDF("k", "a_cents"))
  private def relB(rows: (Long, String)*): DataFrame = // (k, grp)
    Ivm.weighted(rows.toDF("k", "grp"))

  private def bag(df: DataFrame): Map[(Long, Long, String), Long] =
    df.groupBy($"k", $"a_cents", $"grp").agg(sum(col(Ivm.W)).as("w"))
      .filter($"w" =!= 0)
      .as[(Long, Long, String, Long)].collect()
      .map { case (k, a, g, w) => (k, a, g) -> w }.toMap

  test("join delta + old view equals the full recompute (bag semantics, with duplicates)") {
    val a0 = relA((1L, 10L), (1L, 10L), (2L, 20L)) // duplicate row: multiplicity 2
    val b0 = relB((1L, "x"), (3L, "y"))
    val da = relA((3L, 30L), (1L, 11L))
    val db = relB((2L, "z"), (1L, "x2"), (3L, "y2"))
    val oldView = Ivm.weighted(a0.drop(Ivm.W).join(b0.drop(Ivm.W), Seq("k")))
    val incremental = oldView.unionByName(Ivm.joinDelta(a0, da, b0, db, Seq("k")))
    val full = Ivm.weighted(
      a0.drop(Ivm.W).unionByName(da.drop(Ivm.W))
        .join(b0.drop(Ivm.W).unionByName(db.drop(Ivm.W)), Seq("k")))
    assert(bag(incremental) == bag(full))
  }

  test("property: chunked join-agg maintenance equals one-shot on random multisets") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genCase = for {
      na <- Gen.choose(0, 25); nb <- Gen.choose(0, 25)
      a <- Gen.listOfN(na, for { k <- Gen.choose(0L, 6L); v <- Gen.choose(-50L, 50L) } yield (k, v))
      b <- Gen.listOfN(nb, for { k <- Gen.choose(0L, 6L); g <- Gen.oneOf("g1", "g2", "g3") } yield (k, g))
      cutA <- Gen.choose(0, na); cutB <- Gen.choose(0, nb)
    } yield (a, b, cutA, cutB)
    val prop = Prop.forAll(genCase) { case (a, b, cutA, cutB) =>
      val (a0s, das) = a.splitAt(cutA)
      val (b0s, dbs) = b.splitAt(cutB)
      val (a0, da) = (relA(a0s: _*), relA(das: _*))
      val (b0, db) = (relB(b0s: _*), relB(dbs: _*))
      val state0 = Ivm.aggState(
        a0.drop(Ivm.W).join(b0.drop(Ivm.W), Seq("k")).transform(Ivm.weighted),
        Seq("grp"), "a_cents")
      val maintained = Ivm.maintainJoinAgg(state0, a0, da, b0, db,
        Seq("k"), Seq("grp"), "a_cents")
      val oneShot = Ivm.aggState(
        a0.drop(Ivm.W).unionByName(da.drop(Ivm.W))
          .join(b0.drop(Ivm.W).unionByName(db.drop(Ivm.W)), Seq("k"))
          .transform(Ivm.weighted),
        Seq("grp"), "a_cents")
      val m = maintained.as[(String, Long, Long)].collect().toSet
      val o = oneShot.as[(String, Long, Long)].collect().toSet
      m == o
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("a delta followed by its exact negation restores the state") {
    val a0 = relA((1L, 10L), (2L, 20L))
    val b0 = relB((1L, "x"), (2L, "y"))
    val state0 = Ivm.aggState(
      a0.drop(Ivm.W).join(b0.drop(Ivm.W), Seq("k")).transform(Ivm.weighted),
      Seq("grp"), "a_cents")
    val da = relA((1L, 99L), (3L, 30L))
    val db = relB((3L, "y"))
    val state1 = Ivm.maintainJoinAgg(state0, a0, da, b0, db,
      Seq("k"), Seq("grp"), "a_cents").localCheckpoint()
    // negate: same rows with weight -1; old sides now include the applied delta
    val daNeg = da.withColumn(Ivm.W, -col(Ivm.W))
    val dbNeg = db.withColumn(Ivm.W, -col(Ivm.W))
    val aNow = a0.unionByName(da)
    val bNow = b0.unionByName(db)
    val state2 = Ivm.maintainJoinAgg(state1, aNow, daNeg, bNow, dbNeg,
      Seq("k"), Seq("grp"), "a_cents")
    val s0 = state0.as[(String, Long, Long)].collect().toSet
    val s2 = state2.as[(String, Long, Long)].collect().toSet
    assert(s2 == s0, s"retraction did not cancel: $s2 vs $s0")
    // and the intermediate state genuinely differed
    assert(state1.as[(String, Long, Long)].collect().toSet != s0)
  }
}
