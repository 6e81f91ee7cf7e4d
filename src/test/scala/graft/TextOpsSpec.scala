package graft

import graft.textops.{Dedup, TextAnalysis}
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("jaccard pairs find the planted near-duplicates, all ≥ threshold") {
    val pairs = Dedup.jaccardPairs(docs, n = 5, minJaccard = 0.8)
    assert(pairs.count() > 0)
    assert(pairs.filter($"jaccard" < 0.8 || $"jaccard" > 1.0).count() == 0)
    assert(pairs.filter($"doc_a" >= $"doc_b").count() == 0)
  }

  test("minhash-LSH candidates contain every very-high-jaccard pair") {
    val truth = Dedup.jaccardPairs(docs, n = 5, minJaccard = 0.95)
      .select("doc_a", "doc_b")
    val lsh = Dedup.minhashLshPairs(docs, n = 5, minJaccard = 0.7)
      .select("doc_a", "doc_b")
    // 4 bands × 4 rows: P(catch | j=0.95) = 1-(1-0.95^4)^4 ≈ 0.9996 per
    // pair; the planted ~0.98 pairs must all surface
    val missed = truth.join(lsh, Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() == 0)
  }

  test("minhashConfigFor: rows grow with n, recall algebra holds, refuse is loud") {
    // r grows like log n (the anti-quadratic lever), never shrinks
    val rs = Seq(1e4, 1e6, 1e8, 1e10).map(n =>
      Dedup.minhashConfigFor(n.toLong, threshold = 0.7)._2)
    assert(rs == rs.sorted && rs.distinct.size > 1, s"rows must grow with n: $rs")
    // every returned config meets the stated recall target
    for (n <- Seq(1e4, 1e7); theta <- Seq(0.6, 0.7, 0.8)) {
      val (b, r) = Dedup.minhashConfigFor(n.toLong, theta)
      val recall = 1.0 - math.pow(1.0 - math.pow(theta, r), b)
      assert(recall >= 0.95, f"($b,$r) at θ=$theta n=$n%.0f → recall $recall%.3f")
      assert(b * r <= 256)
    }
    // refuse-don't-truncate: an unreachable recall/load combination
    // throws with the achievable numbers, never silently degrades
    val e = intercept[IllegalArgumentException] {
      Dedup.minhashConfigFor(1e12.toLong, threshold = 0.5, targetRecall = 0.999,
        bgSim = 0.4, maxHashes = 64)
    }
    assert(e.getMessage.contains("Raise maxHashes"))
  }

  test("sized minhash banding preserves the planted-pair recall of the pinned config") {
    val truth = Dedup.jaccardPairs(docs, n = 5, minJaccard = 0.95)
      .select("doc_a", "doc_b")
    val nDocs = docs.count()
    val sized = Dedup.minhashLshPairsSized(docs, nDocs, n = 5, minJaccard = 0.7)
      .select("doc_a", "doc_b")
    // the sized config states recall ≥0.95 AT θ=0.7; at j≈0.95+ the
    // per-pair catch probability is ≈1, so every planted pair surfaces
    val missed = truth.join(sized, Seq("doc_a", "doc_b"), "left_anti")
    assert(missed.count() == 0)
    // and the deterministic parameter stream is reproducible
    assert(Dedup.minhashParamsFor(8) == Dedup.minhashParamsFor(8))
    assert(Dedup.minhashParamsFor(8).forall { case (a, b) =>
      a >= 1 && a < Dedup.minhashP && b >= 0 && b < Dedup.minhashP })
  }

  test("near-dup clusters: canonical is cluster-minimum, pairs share a cluster") {
    val labels = Dedup.nearDupClusters(docs, n = 5, minJaccard = 0.8)
    assert(labels.filter($"canonical_id" > $"doc_id").count() == 0)
    val pairs = Dedup.jaccardPairs(docs, n = 5, minJaccard = 0.8)
    val la = labels.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("canonical_id", "ca")
    val lb = labels.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("canonical_id", "cb")
    assert(pairs.join(la, Seq("doc_a")).join(lb, Seq("doc_b"))
      .filter($"ca" =!= $"cb").count() == 0)
  }

  test("simhash: near-duplicate pairs are close in hamming distance") {
    val sims = Dedup.simhash(docs)
    val pairs = Dedup.jaccardPairs(docs, n = 5, minJaccard = 0.95)
    val withHash = pairs
      .join(sims.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("simhash", "ha"), Seq("doc_a"))
      .join(sims.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("simhash", "hb"), Seq("doc_b"))
      .withColumn("hamming", bit_count($"ha".bitwiseXOR($"hb")))
    val avgHam = withHash.agg(avg($"hamming")).as[Double].head()
    assert(avgHam < 8.0, s"near-dup avg hamming $avgHam should be low (32-bit hash)")
  }

  test("language ID is deterministic and scores count real stopword hits") {
    val out = TextAnalysis.withLangId(docs.limit(50))
    assert(out.filter($"predicted_lang".isNull).count() == 0)
    val row = TextAnalysis
      .withLangId(Seq((1L, "the cat and the hat is on the mat")).toDF("doc_id", "text"))
      .select("score_en", "predicted_lang").collect()(0)
    assert(row.getLong(0) == 6L && row.getString(1) == "en") // the×3, and, is, on
  }

  test("similarity: cosine bounded, self excluded, LSH subset of brute force") {
    val bf = Similarity.bruteForceTopK(Tables.embeddings(spark, sf), k = 10, maxQueryId = 16)
    assert(bf.filter($"cos" > 1.0000001 || $"cos" < -1.0000001).count() == 0)
    assert(bf.filter($"query_id" === $"cand_id").count() == 0)
    val lsh = Similarity.lshBucketTopK(Tables.embeddings(spark, sf), k = 5, maxQueryId = 16)
    // every LSH hit must also be a valid scored pair with identical cosine
    val joined = lsh.join(bf.withColumnRenamed("cos", "cos_bf"),
      Seq("query_id", "cand_id"))
    assert(joined.filter($"cos" =!= $"cos_bf").count() == 0)
  }

  // multimodal coverage moved to MediaCodecSpec/MultimodalSpec alongside
  // the real header-level codec (round-6: stub retired)

  test("property: prefix-filtered Jaccard join equals the plain shingle join exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // overlapping word soups with planted duplications and tight sizes —
    // the threshold-boundary shapes (min = t·max) the prefix math must
    // survive. Thresholds cover tight-to-loose.
    val words = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    val genDocs = for {
      nDocs <- Gen.choose(2, 12)
      docs <- Gen.listOfN(nDocs, Gen.choose(6, 18).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf(words)).map(_.mkString(" "))))
      dupOf <- Gen.choose(0, nDocs - 1)
      suffix <- Gen.oneOf("", " alpha", " beta gamma")
      t <- Gen.oneOf(0.5, 0.7, 0.8)
    } yield (docs :+ (docs(dupOf) + suffix), t)
    val prop = Prop.forAll(genDocs) { case (docs, t) =>
      val df = docs.zipWithIndex.map { case (text, i) => (i.toLong, text) }
        .toDF("doc_id", "text")
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          math.round(r.getDouble(5) * 1e9))
      val plain = graft.textops.Dedup.jaccardPairs(df, n = 3, minJaccard = t)
        .collect().map(key).toSet
      val pref = graft.textops.Dedup.jaccardPairsPrefix(df, n = 3, minJaccard = t)
        .collect().map(key).toSet
      pref == plain
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
