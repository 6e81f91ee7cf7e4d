package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× scale smoke: generate a deterministic 10M-row tick table (100×
  * the sf0.1 events table, same shape: 1500 keys × ~80 days) in a temp
  * dir, then run the full ETL composite (filter → compress → candle →
  * enrich-shaped aggregation) and the heavy window ops on it. Prints
  * per-stage wall times — evidence that the operator plans survive a
  * 100× scale-up without restructuring (SCALE.md).
  *
  * Usage: runMain graft.ScaleSmoke [nRows]
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft-scale").toString
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    timed(s"generate $n ticks") {
      spark.range(n)
        .select(
          col("id").as("event_id"),
          pmod(hash(col("id") * 7), lit(1500)).cast("long").as("user_id"),
          // deterministic pseudo-random walk-ish prices, ~80 days of micros
          timestamp_micros(lit(1704067200000000L) + col("id") * 700000L).as("ts"),
          (abs(hash(col("id"))) % 20000 / 100.0 + 1.0).as("value"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dir/ticks")
    }
    val ticks = spark.read.parquet(s"$dir/ticks")

    timed("full ETL: filter -> compress -> daily candles (count)") {
      val compressed = graft.etl.Compress.tickCompression(
        ticks.filter($"value" > 0), "user_id", "ts", "value")
      val candles = graft.etl.Candles.ohlcvDaily(compressed, "user_id", "ts", "value")
      println(s"[scale]   candles: ${candles.count()}")
    }
    timed("scalable (key,day) compression (count)") {
      println(s"[scale]   kept: ${graft.etl.Compress.tickCompressionScalable(ticks, "user_id", "ts", "value").count()}")
    }
    timed("bollinger window (force full evaluation)") {
      // count(bb_mid) makes the window non-prunable — a bare count() would
      // let Catalyst elide the window entirely
      val r = graft.analytics.Indicators.bollinger(ticks, "user_id", "ts", "value")
        .agg(count(col("bb_mid")), sum(col("bb_upper"))).collect()(0)
      println(s"[scale]   non-null bands: ${r.getLong(0)}")
    }
    timed("sessionization (count)") {
      println(s"[scale]   sessions: ${ticks.groupBy($"user_id", session_window($"ts", "30 minutes")).count().count()}")
    }

    // near-dup detection at a 25× corpus (50k vectors vs sf0.1's 2k),
    // PRODUCTION parameters: threshold 0.9 → wide 12-bit bands, 16
    // tables (the oracle's 0.4-threshold config needs many narrow
    // tables; at real near-dup thresholds the cost collapses — SCALE.md).
    // ids 25000-25999 are plants: copies of ids 0-999 with one dimension
    // shifted (cos ≈ 0.999) — the found-fraction is a recall proxy.
    timed("embedding near-dup, 50k vectors, threshold 0.9 (sign-LSH 16x12bit)") {
      val emb = spark.range(50000).select(
        col("id").as("vec_id"),
        expr("""transform(sequence(1, 64), d ->
                  cast((hash((CASE WHEN id BETWEEN 25000 AND 25999 THEN id - 25000 ELSE id END) * 100 + d) % 2001) / 1000.0
                       + (CASE WHEN id BETWEEN 25000 AND 25999 AND d = 1 THEN 0.05 ELSE 0.0 END) as float))""")
          .as("embedding"))
      val pairs = graft.similarity.Similarity
        .nearDupPairs(emb, threshold = 0.9, sigBits = 64, tables = 16, bandBits = 12)
        .cache()
      val planted = pairs.filter($"vec_b" - $"vec_a" === 25000L).count()
      println(s"[scale]   pairs: ${pairs.count()}, planted found: $planted / 1000")
      pairs.unpersist()
    }

    // 50k vectors, ids 25000-25999 duplicate ids 0-999 with a +0.05 bump
    // on dim 1 (cos ≈ 0.9996) — the planted-truth corpus for the
    // clustering composite and the tables-vs-threshold sweep below
    def mkEmb50k = spark.range(50000).select(
      col("id").as("vec_id"),
      expr("""transform(sequence(1, 64), d ->
                cast((hash((CASE WHEN id BETWEEN 25000 AND 25999 THEN id - 25000 ELSE id END) * 100 + d) % 2001) / 1000.0
                     + (CASE WHEN id BETWEEN 25000 AND 25999 AND d = 1 THEN 0.05 ELSE 0.0 END) as float))""")
        .as("embedding"))

    // the embedding_clusters COMPOSITE end-to-end at 25×: LSH pairs →
    // star-contraction CC → labels. Every planted (i, i+25000) pair must
    // land in one cluster; CC round telemetry is the drift alarm
    timed("embedding clusters composite, 50k vectors (1000 planted dup pairs)") {
      val pairs = graft.similarity.Similarity
        .nearDupPairs(mkEmb50k, threshold = 0.9, sigBits = 64, tables = 16, bandBits = 12)
        .select("vec_a", "vec_b")
      val (labels0, cc) = graft.textops.Dedup.connectedComponentsWithStats(pairs)
      val labels = labels0.withColumnRenamed("doc_id", "vec_id").cache()
      val coLabeled = labels.as("l1")
        .filter(col("l1.vec_id") < 1000L)
        .join(labels.as("l2"), col("l1.vec_id") + 25000L === col("l2.vec_id"))
        .filter(col("l1.canonical_id") === col("l2.canonical_id")).count()
      println(s"[scale]   cc rounds: ${cc.rounds} (edges/round: ${cc.edgesPerRound.mkString(", ")}); " +
        s"labeled nodes: ${labels.count()}, planted co-labeled: $coLabeled / 1000")
      assert(coLabeled == 1000L, s"only $coLabeled/1000 planted dup pairs share a cluster label")
      labels.unpersist()
    }

    // tables-vs-threshold cost curve (SCALE.md): the catalog's 128-table/
    // 4-bit setting exists only because the synthetic oracle threshold is
    // 0.4 (the random-pair noise tail) — production thresholds (≥0.8)
    // need far fewer tables. Recall measured on the 1000 planted pairs.
    for ((thr, tables, bandBits) <- Seq((0.95, 8, 14), (0.9, 16, 12), (0.8, 32, 10))) {
      timed(f"near-dup sweep: threshold $thr%.2f, $tables tables x $bandBits bits") {
        val pairs = graft.similarity.Similarity
          .nearDupPairs(mkEmb50k, threshold = thr, sigBits = 64,
            tables = tables, bandBits = bandBits)
          .cache()
        val planted = pairs.filter($"vec_b" - $"vec_a" === 25000L).count()
        println(s"[scale]   pairs: ${pairs.count()}, planted recall: $planted / 1000")
        pairs.unpersist()
      }
    }

    // PQ-ADC at the same 25× corpus: corpus touched only through 4 byte
    // codes per vector; the per-query lookup tables broadcast
    timed("PQ-ADC top-10, 50k vectors, 32 queries") {
      val emb = spark.range(50000).select(
        col("id").as("vec_id"),
        expr("transform(sequence(1, 64), d -> cast((hash(id * 100 + d) % 2001) / 1000.0 as float))")
          .as("embedding"))
      val topk = graft.similarity.Similarity.pqAdcTopK(emb, k = 10, maxQueryId = 32)
      println(s"[scale]   adc rows: ${topk.count()}")
    }

    // distributed prefix sum at 10M rows / 64 partitions: the driver sees
    // one scalar per partition, never rows
    timed("pack_sequences prefix sum, 10M docs") {
      val toks = spark.range(10000000L).select(
        col("id").as("doc_id"),
        (abs(hash(col("id"))) % 300 + 20).cast("long").as("n"))
        .repartition(64)
      val packed = graft.operators.PrefixSum.exclusivePrefixSum(toks, "doc_id", "n", nParts = 64)
        .select(col("doc_id"), col("n"), col("start_off"),
          expr("start_off div 512").as("seq_id"))
      val last = packed.agg(max(col("start_off") + col("n")).as("total"),
        count_distinct(col("seq_id")).as("seqs")).collect()(0)
      println(s"[scale]   total tokens: ${last.getLong(0)}, sequences: ${last.getLong(1)}")
    }

    // asymmetric containment dedup at a 25× doc corpus (12.5k docs vs
    // sf0.1's 500): candidates from the shingle-key join only — work
    // scales with SHARED shingles, not n². ids 12000-12499 are plants:
    // the first 60% of ids 0-499's tokens → containment 1.0
    timed("containment dedup, 12.5k docs (500 planted 60%-prefix copies)") {
      val base = spark.range(12000).select(
        col("id").as("doc_id"),
        // multiplier > max token index keeps (id, i) token streams
        // decorrelated across docs — with a small multiplier, doc id+k
        // would contain a shifted copy of doc id's tokens and the corpus
        // would be full of accidental near-dups
        expr("""array_join(transform(sequence(1, cast(abs(hash(id)) % 200 + 50 as int)),
                  i -> concat('w', pmod(hash(id * 100003 + i), 5000))), ' ')""").as("text"))
      val planted = base.filter($"doc_id" < 500).select(
        ($"doc_id" + 12000L).as("doc_id"),
        expr("""array_join(slice(split(text, ' '), 1,
                  cast(size(split(text, ' ')) * 6 div 10 as int)), ' ')""").as("text"))
      val pairs = graft.textops.Dedup
        .containmentPairs(base.unionByName(planted), n = 5, minContainment = 0.8)
        .cache()
      val found = pairs.filter($"doc_a" - 12000L === $"doc_b").count()
      println(s"[scale]   pairs: ${pairs.count()}, planted found: $found / 500")
      pairs.unpersist()
    }

    // bucketed interval join at 10M points × 100k intervals: intervals
    // explode into ≤2 five-minute buckets (span ≤ 3 min), points carry
    // one bucket — the join is a plain hash join on the bucket key; the
    // naive inequality-join plan would be a 10M × 100k nested loop
    timed("interval join, 10M points x 100k intervals (60-180 s spans)") {
      val intervals = spark.range(100000).select(
        col("id").as("incident_id"),
        timestamp_micros(lit(1704067200000000L)
          + (abs(hash(col("id") * 13)) % 6998000L) * 1000000L).as("start_ts"))
        .withColumn("end_ts",
          timestamp_micros(unix_micros(col("start_ts"))
            + (lit(60L) + abs(hash(col("incident_id") * 31)) % 121L) * 1000000L))
      val joined = graft.operators.RangeJoin.pointInInterval(
        ticks.select("event_id", "ts"), "ts", intervals, "start_ts", "end_ts",
        bucketSeconds = 300L)
      println(s"[scale]   attributed pairs: ${joined.count()}")
    }

    // decontamination at a 20× corpus (100k docs vs sf0.1's 5k): every
    // 10th doc is the eval shard; 500 extra TRAIN docs (ids ≡ 1 mod 10)
    // embed a bench doc's full token stream plus a unique suffix — all
    // 500 must surface, and ONLY those (the 100003 multiplier keeps
    // independent docs' 8-gram sets disjoint)
    timed("decontamination, 100k docs / 8-grams (500 planted overlaps)") {
      val base = spark.range(100000).select(
        col("id").as("doc_id"),
        expr("""array_join(transform(sequence(1, cast(abs(hash(id)) % 200 + 50 as int)),
                  i -> concat('w', pmod(hash(id * 100003 + i), 5000))), ' ')""").as("text"))
      val plants = base.filter($"doc_id" % 10 === 0 && $"doc_id" < 5000)
        .select(($"doc_id" + 1000001L).as("doc_id"),
          concat($"text", lit(" xtra"), ($"doc_id" + 1000001L).cast("string")).as("text"))
      val out = graft.textops.Decontaminate
        .contaminated(base.unionByName(plants), isBench = $"doc_id" % 10 === 0, n = 8)
        .cache()
      val found = out.filter($"doc_id" >= 1000001L).count()
      println(s"[scale]   contaminated docs: ${out.count()}, planted found: $found / 500")
      out.unpersist()
    }

    // span scrubbing at the 20× corpus: 50k docs + 500 exact copies —
    // every copy must scrub to zero kept tokens while its canonical
    // stays intact; first-occurrence selection is one min-agg per 8-gram
    timed("span scrubbing, 50.5k docs (500 exact copies)") {
      val base = spark.range(50000).select(
        col("id").as("doc_id"),
        expr("""array_join(transform(sequence(1, cast(abs(hash(id)) % 200 + 50 as int)),
                  i -> concat('w', pmod(hash(id * 100003 + i), 5000))), ' ')""").as("text"))
      val copies = base.filter($"doc_id" < 500)
        .select(($"doc_id" + 400000L).as("doc_id"), $"text")
      val out = graft.textops.Decontaminate
        .scrubDupSpans(base.unionByName(copies), n = 8).cache()
      val copiesScrubbed = out.filter($"doc_id" >= 400000L && $"n_kept" === 0).count()
      val originalsIntact = out.filter($"doc_id" < 500 && $"n_kept" === $"n_tokens").count()
      println(s"[scale]   copies fully scrubbed: $copiesScrubbed / 500, canonicals intact: $originalsIntact / 500")
      out.unpersist()
    }

    // bloom-prefiltered decontamination vs the plain join at a REALISTIC
    // bench:corpus ratio — 2.5k bench docs (0.5%) against 500k training
    // docs. The plain plan shuffles every training shingle; the bloom
    // plan drops non-candidates at the scan, so only plants + fpp noise
    // shuffle. Both must find exactly the 300 planted copies
    timed("decontamination 500k docs, 0.5% bench: plain vs bloom prefilter") {
      val corpus = spark.range(500000).select(
        col("id").as("doc_id"),
        expr("""array_join(transform(sequence(1, cast(abs(hash(id)) % 200 + 50 as int)),
                  i -> concat('w', pmod(hash(id * 100003 + i), 5000))), ' ')""").as("text"))
      val plants = corpus.filter($"doc_id" < 2400 && $"doc_id" % 8 === 0) // exactly 300
        .select(($"doc_id" + 2000003L).as("doc_id"),
          concat($"text", lit(" tail"), ($"doc_id" + 2000003L).cast("string")).as("text"))
      val docs = corpus.unionByName(plants)
      val isBench = $"doc_id" < 2500
      val t0 = System.nanoTime()
      val plain = graft.textops.Decontaminate.contaminated(docs, isBench, n = 8)
      val plainFound = plain.count()
      val tPlain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val bloom = graft.textops.Decontaminate.contaminatedBloom(docs, isBench, n = 8)
      val bloomFound = bloom.count()
      val tBloom = (System.nanoTime() - t1) / 1e9
      println(f"[scale]   plain: $plainFound rows in $tPlain%.1f s; bloom: $bloomFound rows in $tBloom%.1f s")
      assert(plainFound == bloomFound, s"bloom changed the result: $bloomFound vs $plainFound")
      assert(bloomFound >= 300L, s"plants missing: $bloomFound < 300")
    }

    // k-means codebook training at 50k vectors: 16 planted geometric
    // clusters; farthest-first seeding + 4 Lloyd rounds must recover
    // them (purity ≥ 0.95). Per round: broadcast-codebook assignment
    // (no shuffle) + one (cell, dim) mean agg
    timed("k-means training, 50k vectors, 16 planted clusters, 4 rounds") {
      val emb = spark.range(50000).select(
        col("id").as("vec_id"),
        expr("""transform(sequence(1, 64), d ->
                  cast((hash((id % 16) * 1000 + d) % 2001) / 1000.0
                       + (hash(id * 37 + d) % 21) / 1000.0 as float))""").as("embedding"))
      val (assign, _) = graft.similarity.KMeans.train(emb, k = 16, iters = 4)
      val purity = assign
        .withColumn("planted", pmod(col("vec_id"), lit(16)))
        .groupBy(col("cell"), col("planted")).count()
        .groupBy(col("cell")).agg(max(col("count")).as("maj"), sum(col("count")).as("tot"))
        .agg(sum(col("maj")) / sum(col("tot"))).head.getDouble(0)
      println(f"[scale]   purity: $purity%.4f over ${assign.count()} assignments")
      assert(purity >= 0.95, f"k-means purity $purity%.3f below 0.95 at 50k vectors")
    }

    // k-means|| at PQ-codebook scale: k=1024 is where farthest-first's k
    // SEQUENTIAL driver passes stop being viable (~1024 cluster scans);
    // the oversampling init draws all candidates in 5 passes total and
    // reclusters the ~2·oversample·k·rounds-row candidate set driver-side.
    // 64 planted clusters (not 1024 — planting 1024 separable clusters in
    // 64 dims is geometrically meaningless); the check is that a k >>
    // #clusters codebook still covers every planted cluster and the
    // seeding cost stays flat in k
    timed("k-means|| init, 50k vectors, k=1024 (5 oversampling passes)") {
      val emb = spark.range(50000).select(
        col("id").as("vec_id"),
        expr("""transform(sequence(1, 64), d ->
                  cast((hash((id % 64) * 1000 + d) % 2001) / 1000.0
                       + (hash(id * 37 + d) % 21) / 1000.0 as float))""").as("embedding"))
      val (assign, cents) = graft.similarity.KMeans.trainParallelInit(
        emb, k = 1024, iters = 2, rounds = 5, oversample = 2.0)
      val nCents = cents.count()
      // at k >> #planted every cell should be HOMOGENEOUS: a degenerate
      // seeding (all seeds in few clusters) forces cells to straddle
      // cluster boundaries and per-cell purity collapses
      val purity = assign
        .withColumn("planted", pmod(col("vec_id"), lit(64)))
        .groupBy(col("cell"), col("planted")).count()
        .groupBy(col("cell")).agg(max(col("count")).as("maj"), sum(col("count")).as("tot"))
        .agg(sum(col("maj")) / sum(col("tot"))).head.getDouble(0)
      println(f"[scale]   centroids: $nCents, cell purity: $purity%.4f")
      assert(nCents == 1024L, s"expected 1024 centroids, got $nCents")
      assert(purity >= 0.99, f"cell purity $purity%.3f below 0.99 — degenerate seeding")
    }

    // blocked fuzzy join at the entity-resolution scale: 10k dirty
    // probes (one char dropped) against 100k canonical names. PassJoin
    // segment keys are length- and position-qualified exact substrings,
    // so per-probe candidates stay small — never the 10k × 100k
    // cartesian levenshtein
    timed("blocked fuzzy join, 10k probes vs 100k canonical names") {
      import graft.textops.TextAnalysis.{hashBucketExpr, hashRawExpr}
      val canon = spark.range(100000).selectExpr(
        "id AS c_key",
        s"""concat('w', cast(${hashBucketExpr("(id * 3)", 5000L)} as string),
                   '-w', cast(${hashBucketExpr("(id * 3 + 1)", 5000L)} as string),
                   '-w', cast(${hashBucketExpr("(id * 3 + 2)", 5000L)} as string)) AS c_name""")
      val dirty = canon.filter(col("c_key") < 10000)
        .withColumn("p",
          expr(hashRawExpr("(c_key * 7)")) % (length(col("c_name")) - 1) + 1)
        .selectExpr("c_key + 1000000 AS d_key",
          "concat(substring(c_name, 1, cast(p - 1 as int)), substring(c_name, cast(p + 1 as int), 100)) AS d_name")
      val out = graft.operators.FuzzyJoin
        .bestMatch(dirty, "d_key", "d_name", canon, "c_key", "c_name",
          maxDist = 2, q = 3, maxGramDf = 5000L)
        .cache()
      val toSource = out.filter(col("d_key") - 1000000L === col("c_key")).count()
      println(s"[scale]   matched: ${out.count()} / 10000, to exact source: $toSource")
      // a handful of hash-collision duplicate names may tie to a lower
      // key; everything else must resolve to its own source
      assert(toSource >= 9990L, s"only $toSource/10000 probes resolved to their source")
      out.unpersist()
    }

    // Z-order layout at 5M rows: both keys must come out prunable —
    // span sums are the expected-files-scanned proxy per dimension
    timed("z-order layout, 5M rows x 64 files, span sums vs single-key") {
      import graft.operators.ZOrder
      val rows = spark.range(5000000L).select(
        pmod(hash(col("id") * 13), lit(100000)).cast("long").as("x"),
        pmod(hash(col("id") * 29), lit(100000)).cast("long").as("y"))
      rows.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
        .write.mode("overwrite").parquet(s"$dir/zx")
      ZOrder.writeZOrdered(rows, col("x"), col("y"), bits = 17, nFiles = 64, path = s"$dir/zz")
      val (xs1, ys1) = ZOrder.spanSums(spark.read.parquet(s"$dir/zx"), col("x"), col("y"))
      val (xs2, ys2) = ZOrder.spanSums(spark.read.parquet(s"$dir/zz"), col("x"), col("y"))
      println(f"[scale]   single-key spans: x=${xs1 / 1e6}%.2fM y=${ys1 / 1e6}%.2fM; z-order: x=${xs2 / 1e6}%.2fM y=${ys2 / 1e6}%.2fM")
      assert(ys2 < 0.5 * ys1, s"curve did not cut the y span sum: $ys2 vs $ys1")
      assert(xs2 < 0.5 * 64L * 100000L, s"x no longer prunable under the curve: $xs2")
    }

    // the warehouse z-order write path, measured by what a REAL filtered
    // read does (scan-node metrics), not spanSums: 5M ticks over 20
    // days, point (day, key) predicate. Partition pruning must cut the
    // file count to ~one day's slice and parquet row-group min/max
    // skipping (off the pushed key filter) must cut the rows the scan
    // surfaces to a fraction of the day
    // 32 files/day: a 1/32 curve slice is a ≤ 1/8-x-extent box, so the
    // point-key read should surface ~1/4 of the day or less. (16/day
    // measured 50% surfaced — slices that coarse span half the x-range;
    // real warehouses have far MORE files per day, never fewer)
    timed("z-ordered warehouse read, 5M ticks x 20 days x 640 files") {
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      val ticks = spark.range(5000000L).select(
        pmod(hash(col("id") * 13), lit(2000)).cast("long").as("user_id"),
        timestamp_micros(lit(1704067200000000L) +
          pmod(col("id"), lit(20)) * 86400000000L +
          pmod(hash(col("id")), lit(86400)) * 1000000L).as("ts"),
        (abs(hash(col("id") * 7)) % 100000).cast("double").as("value"))
      graft.sources.Warehouse.writeDayPartitionedZOrdered(
        ticks, "ts", col("user_id"), col("value"), bits = 15, nFiles = 640,
        path = s"$dir/whz")
      val q = spark.read.parquet(s"$dir/whz")
        .filter(col("day") === "2024-01-10" && col("user_id") === 777L)
      // collect(), not count(): count() executes a DIFFERENT QueryExecution
      // and q's own scan metrics would stay zero (vacuous asserts)
      val got = q.collect().length
      val scan = (q.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).collectFirst { case f: FileSourceScanExec => f }.get
      val filesRead = scan.metrics("numFiles").value
      val surfaced = scan.metrics("numOutputRows").value
      println(f"[scale]   rows=$got files_read=$filesRead/640 rows_surfaced=$surfaced/${5000000 / 20} (one day)")
      assert(got > 0 && filesRead > 0 && filesRead <= 65,
        s"partition pruning did not fire (or metrics unpopulated): $filesRead files")
      assert(surfaced > 0 && surfaced < 0.4 * 250000,
        s"row-group skip did not fire (or metrics unpopulated): $surfaced rows surfaced")
    }

    // incremental dedup at the daily-ops scale: a 10k-doc new batch
    // against a 100k-doc store — candidates are new×store band
    // collisions only (the store is never self-joined). 300 plants
    // (ids 200000+3i) copy store doc 3i's text; all 300 must surface
    timed("incremental dedup, 10k new docs vs 100k store (300 plants)") {
      val store = spark.range(100000).select(
        col("id").as("doc_id"),
        expr("""array_join(transform(sequence(1, cast(abs(hash(id)) % 200 + 50 as int)),
                  i -> concat('w', pmod(hash(id * 100003 + i), 5000))), ' ')""").as("text"))
      val cleanNew = spark.range(9700).select(
        (col("id") + 300000L).as("doc_id"),
        expr("""array_join(transform(sequence(1, cast(abs(hash(id + 300000) % 200) + 50 as int)),
                  i -> concat('w', pmod(hash((id + 300000) * 100003 + i), 5000))), ' ')""").as("text"))
      val plants = store.filter($"doc_id" % 3 === 0 && $"doc_id" < 900)
        .select(($"doc_id" + 200000L).as("doc_id"), $"text")
      val pairs = graft.textops.Dedup
        .incrementalLshPairs(cleanNew.unionByName(plants), store, n = 5, minJaccard = 0.7)
        .cache()
      val found = pairs.filter($"doc_new" - 200000L === $"doc_store").count()
      println(s"[scale]   pairs: ${pairs.count()}, planted found: $found / 300")
      pairs.unpersist()
    }

    // the PERSISTED-SIGNATURE path against a deliberately huge store:
    // 2.02M signature rows (200× the 10k batch) — 20k real signatures
    // (the plant sources) plus 2M synthetic padding rows with uniform
    // mh values (band-key collision odds ~ (1/P)^4 per band, nil). The
    // store TEXT is never touched — per-batch cost is the batch shingle
    // pass plus one band equi-join against the k-integer signature
    // table, so wall time tracks the 100k-text-store smoke above, not
    // the 20× store growth. Signatures go through parquet (the actual
    // persisted-store flow), scan included in the timing.
    val realDocs = spark.range(20000).select(
      col("id").as("doc_id"),
      expr("""array_join(transform(sequence(1, cast(abs(hash(id)) % 200 + 50 as int)),
                i -> concat('w', pmod(hash(id * 100003 + i), 5000))), ' ')""").as("text"))
    timed("build + persist 2.02M-signature store (one-time, amortized)") {
      val padSigCols = (0 until graft.textops.Dedup.minhashParams.size).map(i =>
        expr(s"cast(abs(hash(id * 31 + $i)) % ${graft.textops.Dedup.minhashP} as bigint)").as(s"mh$i"))
      val pad = spark.range(2000000L)
        .select((col("id") + 1000000L).as("doc_id") +: padSigCols: _*)
        .withColumn("sig_spec", lit(graft.textops.Dedup.sigSpec(5)))
      graft.textops.Dedup.minhashSignatures(realDocs, n = 5)
        .unionByName(pad)
        .write.mode("overwrite").parquet(s"$dir/sigstore")
    }
    timed("incremental dedup, 10k new docs vs persisted 2.02M-signature store (300 plants)") {
      val storeSigs = spark.read.parquet(s"$dir/sigstore")
      val cleanNew = spark.range(9700).select(
        (col("id") + 3000000L).as("doc_id"),
        expr("""array_join(transform(sequence(1, cast(abs(hash(id + 3000000) % 200) + 50 as int)),
                  i -> concat('w', pmod(hash((id + 3000000) * 100003 + i), 5000))), ' ')""").as("text"))
      val plants = realDocs.filter($"doc_id" % 3 === 0 && $"doc_id" < 900)
        .select(($"doc_id" + 200000L).as("doc_id"), $"text")
      val pairs = graft.textops.Dedup
        .incrementalSigPairs(cleanNew.unionByName(plants), storeSigs,
          n = 5, minEstJaccard = 0.7)
        .cache()
      val found = pairs.filter($"doc_new" - 200000L === $"doc_store").count()
      println(s"[scale]   pairs: ${pairs.count()}, planted found: $found / 300")
      assert(found == 300L, s"persisted-signature path surfaced only $found/300 plants")
      pairs.unpersist()
    }

    // the embedding analog of the signature store: a 10k-vector daily
    // batch against a PERSISTED 500k-vector ANN index (50× batch).
    // Candidates are new×store table-key collisions only; verify uses
    // the index's stored quantization — store embeddings never re-read.
    // 1k plants (ids 9M+i copy store vec i with a +0.05 bump) must all
    // surface against exactly their source.
    val storeEmb = spark.range(500000L).select(
      col("id").as("vec_id"),
      expr("transform(sequence(1, 64), d -> cast((hash(id * 100 + d) % 2001) / 1000.0 as float))")
        .as("embedding"))
    timed("build + persist 500k-vector ANN index (one-time, amortized)") {
      graft.similarity.Similarity.writeEmbeddingIndex(
        storeEmb, s"$dir/annstore", sigBits = 64, tables = 16, bandBits = 14)
    }
    timed("incremental embedding dedup, 10k new vs persisted 500k-vector index (1k plants)") {
      val storeIdx = spark.read.parquet(s"$dir/annstore")
      val cleanNew = spark.range(9000L).select(
        (col("id") + 8000000L).as("vec_id"),
        expr("transform(sequence(1, 64), d -> cast((hash((id + 8000000) * 100 + d) % 2001) / 1000.0 as float))")
          .as("embedding"))
      val plants = spark.range(1000L).select(
        (col("id") + 9000000L).as("vec_id"),
        expr("""transform(sequence(1, 64), d ->
                  cast((hash(id * 100 + d) % 2001) / 1000.0
                       + (CASE WHEN d = 1 THEN 0.05 ELSE 0.0 END) as float))""")
          .as("embedding"))
      val pairs = graft.similarity.Similarity
        .incrementalNearDupPairs(cleanNew.unionByName(plants), storeIdx,
          threshold = 0.9, sigBits = 64, tables = 16, bandBits = 14)
        .cache()
      val found = pairs.filter($"vec_new" - 9000000L === $"vec_store").count()
      val total = pairs.count()
      println(s"[scale]   pairs: $total, planted found: $found / 1000")
      assert(found == 1000L, s"incremental ANN-index path surfaced only $found/1000 plants")
      // the zero-false-positive claim SCALE.md records must be enforced,
      // not just printed: every reported pair is a planted copy
      assert(total == 1000L, s"expected exactly the 1000 planted pairs, got $total")
      pairs.unpersist()
    }

    // connected components on a planted 2M-edge graph: 10k CHAINS of
    // length 200 (the worst case for round count — a chain needs
    // O(log L) star-contraction rounds where per-hop propagation needs
    // L) plus 100k 2-cliques. Every node must label with its chain/pair
    // minimum; convergence must stay within the maxRounds budget.
    timed("connected components, ~2.1M planted edges (10k chains x 200 + 100k pairs)") {
      val chains = spark.range(10000L * 199L).select(
        expr("id div 199 * 1000 + id % 199").as("u"),
        expr("id div 199 * 1000 + id % 199 + 1").as("v"))
      val pairBase = 100000000L
      val pairs2 = spark.range(100000L).select(
        (col("id") * 2 + pairBase).as("u"), (col("id") * 2 + 1L + pairBase).as("v"))
      val (labels0, cc) = graft.textops.Dedup
        .connectedComponentsWithStats(chains.unionByName(pairs2))
      val labels = labels0.cache()
      // telemetry: a chain of length 200 needs ~log2(200)≈8 star rounds;
      // drift toward maxRounds is the production alarm signal
      println(s"[scale]   cc rounds: ${cc.rounds}, edges/round: ${cc.edgesPerRound.mkString(", ")}")
      assert(cc.rounds <= 15, s"CC took ${cc.rounds} rounds — convergence drifting")
      // chain node k*1000+i labels with k*1000; pair node labels with its even id
      val wrongChain = labels.filter($"doc_id" < pairBase)
        .filter($"canonical_id" =!= expr("doc_id div 1000 * 1000")).count()
      val wrongPair = labels.filter($"doc_id" >= pairBase)
        .filter($"canonical_id" =!= expr(s"(doc_id - ${pairBase}L) div 2 * 2 + ${pairBase}L")).count()
      println(s"[scale]   nodes labeled: ${labels.count()}, wrong: ${wrongChain + wrongPair}")
      labels.unpersist()
      assert(wrongChain + wrongPair == 0, s"CC mislabeled $wrongChain chain + $wrongPair pair nodes")
    }

    // mass propagation at ~40× the sf0.1 graph: 4M directed edges over a
    // 210k-node bipartite graph, 4 Pregel rounds. The invariant that
    // makes the op auditable at ANY scale: total mass is conserved
    // exactly (integer shares + remainders), so one BIGINT sum certifies
    // every round's joins lost nothing
    timed("mass propagation, 4M-edge bipartite graph (200k x 10k), 4 rounds") {
      val pairs = spark.range(2000000L).select(
        (col("id") % 200000L).as("p"),
        (pmod(hash(col("id")), lit(10000)) + 1L).cast("long").as("s")).distinct()
      val edges = pairs.select(col("p").as("src"), (-col("s")).as("dst"))
        .unionByName(pairs.select((-col("s")).as("src"), col("p").as("dst")))
        .localCheckpoint()
      val nEdges = edges.count()
      val nNodes = edges.select(col("src")).union(edges.select(col("dst")))
        .distinct().count()
      val m = graft.operators.MassFlow.propagate(edges, iters = 4)
      val total = m.agg(sum($"mass")).head().getLong(0)
      println(s"[scale]   edges=$nEdges nodes=$nNodes total_mass=$total (expect ${nNodes * 1000000L})")
      assert(total == nNodes * 1000000L,
        s"mass not conserved: $total != ${nNodes * 1000000L}")
    }

    // multimodal codec at 1M docs (2000× the sf0.01 documents table):
    // build real four-format headers + parse them back in one
    // mapPartitions pass — pure per-row CPU, zero shuffles, the shape
    // that scales embarrassingly. Corrupt plants (id % 97) must all fail,
    // everything else must decode with the planted fields.
    timed("multimodal build+decode round trip, 1M docs") {
      val docs = spark.range(1000000L).select(
        col("id").as("doc_id"),
        expr("""repeat(concat('w', cast(id % 997 as string), ' '), cast(id % 50 + 10 as int))""").as("text"),
        lit("en").as("lang"), lit("gen").as("source"), lit(0L).as("n_chars"))
      val f = graft.multimodal.Multimodal.features(spark, docs)
      val agg = f.agg(
        count(lit(1)).as("n"),
        sum(when(col("decoded_ok"), 1L).otherwise(0L)).as("ok"),
        sum(when(col("format").isNull && !col("decoded_ok"), 1L).otherwise(0L)).as("failed"),
        sum(col("n_frames")).as("frames")).collect()(0)
      val corrupt = (0L until 1000000L).count(_ % 97 == 0)
      println(s"[scale]   docs: ${agg.getLong(0)}, decoded: ${agg.getLong(1)}, " +
        s"failed: ${agg.getLong(2)} (expected $corrupt), total frames: ${agg.getLong(3)}")
      assert(agg.getLong(1) == 1000000L - corrupt && agg.getLong(2) == corrupt,
        "decode success/failure counts do not match the corrupt plant arithmetic")
    }

    // calendar gap-fill at 100k keys × sparse year: ~40 observed days per
    // key forward-filled onto each key's own min..max spine (~36M spine
    // rows from 4M observations) — spine rows ∝ keys × span, one window
    timed("gap-fill, 100k keys x sparse year (~4M obs -> per-key spine)") {
      val obs = spark.range(4000000L).select(
        (col("id") % 100000L).as("key_id"),
        timestamp_micros(lit(1704067200000000L)
          + (abs(hash(col("id"))) % 365L) * 86400000000L
          + (col("id") % 86400L) * 1000000L).as("ts"),
        (abs(hash(col("id") * 3)) % 10000 / 100.0).as("value"))
      val filled = graft.analytics.TimeSeries.gapFillDaily(obs, "key_id", "ts", "value")
      val r = filled.agg(count(lit(1)).as("rows"),
        sum(when(col("is_gap"), 1L).otherwise(0L)).as("gaps")).collect()(0)
      println(s"[scale]   spine rows: ${r.getLong(0)}, gaps filled: ${r.getLong(1)}")
    }

    // 100×-scale streaming warehouse replay: the 10M ticks stream through
    // day-close candles into the batch-partitioned sink, then the largest
    // batch is re-written under its own batchId (the engine's at-least-once
    // retry) — row count must not change
    timed("streaming warehouse sink, 10M ticks + forced batch replay") {
      val streamDir = s"$dir/ticks"
      val stream = spark.readStream
        .schema(ticks.schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(streamDir)
      val out = java.nio.file.Files.createTempDirectory("graft-scale-sink")
      val warehousePath = out.resolve("daystocks").toString
      val q = graft.streaming.StreamingCandles.warehouseSink(
        graft.streaming.StreamingCandles.dailyCandles(stream, "user_id", "ts", "value"),
        warehousePath,
        out.resolve("ckpt").toString)
      try q.processAllAvailable() finally q.stop()
      val before = spark.read.parquet(warehousePath).count()
      val replayId = spark.read.parquet(warehousePath)
        .groupBy("batch").count().orderBy(desc("count"))
        .collect().head.getAs[Any]("batch").toString.toLong
      val stage = out.resolve("stage").toString
      spark.read.parquet(s"$warehousePath/batch=$replayId").write.parquet(stage)
      graft.streaming.StreamingCandles.writeBatch(
        spark.read.parquet(stage), warehousePath, replayId)
      val after = spark.read.parquet(warehousePath).count()
      println(s"[scale]   candles: $before, after replaying batch $replayId: $after" +
        (if (before == after) " (idempotent)" else " MISMATCH"))
      assert(before == after, s"replay duplicated rows: $before -> $after")
    }

    // stream-stream attribution at 10M events: 5M views + 5M clicks over
    // ~40 days, 4 chronological chunks per side. The volume claims under
    // test: (1) the streaming join emits EXACTLY the batch join, and
    // (2) the state store ends holding a lookback-sized tail, not the
    // stream — the O(window) bound that lets this run forever
    timed("stream-stream attribution, 5M views x 5M clicks, 4-chunk replay") {
      import graft.streaming.StreamJoins
      val n = 5000000L
      def side(tag: String, salt: Int) = spark.range(n).select(
        pmod(hash(col("id") * salt), lit(100000)).cast("long").as("user_id"),
        col("id").as(s"${tag}_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * 700000L).as(s"${tag}_ts"))
      val views = side("view", 7).localCheckpoint()
      val clicks = side("click", 13).localCheckpoint()
      def stage(df: org.apache.spark.sql.DataFrame, tag: String): String = {
        val d = java.nio.file.Files.createTempDirectory(s"graft-ssj-$tag")
        (0L until 4L).foreach { i =>
          val f = d.resolve(s"chunk$i")
          df.filter(col(s"${tag}_id") >= i * n / 4 && col(s"${tag}_id") < (i + 1) * n / 4)
            .coalesce(4).write.parquet(f.toString)
          f.toFile.listFiles().foreach(_.setLastModified(1700000000000L + i * 60000L))
        }
        d.toString + "/*"
      }
      val vStream = spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 4).parquet(stage(views, "view"))
      val cStream = spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 4).parquet(stage(clicks, "click"))
      val q = StreamJoins.attributeClicks(vStream, cStream,
          lookback = "1 hour", delay = "1 hour")
        .writeStream.format("memory").queryName("ssj_scale")
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        val emitted = spark.table("ssj_scale").count()
        val expected = views.join(clicks,
          views("user_id") === clicks("user_id") &&
            clicks("click_ts") >= views("view_ts") &&
            clicks("click_ts") <= views("view_ts") + expr("INTERVAL 1 hour")).count()
        val retained = q.recentProgress.reverse.collectFirst {
          case p if p.stateOperators.nonEmpty => p.stateOperators.map(_.numRowsTotal).sum
        }.getOrElse(0L)
        println(s"[scale]   matches: $emitted (batch: $expected), state rows at end: $retained / ${2 * n}")
        assert(emitted == expected, s"streaming $emitted != batch $expected")
        assert(retained > 0 && retained < (2 * n) / 20,
          s"state held $retained of ${2 * n} — eviction did not bound the join")
      } finally q.stop()
    }
    spark.stop()
  }
}

/** Hot-day fan-out smoke (round 9): the maintenance scenario the
  * `filesPerDay` knob exists for — one day carrying most of an upsert.
  * Measures the upsert wall time and the hot day's file count at
  * filesPerDay = 1 (the pre-r9 behavior: the whole day serializes
  * through one task) vs 8, plus a key-filtered read against each
  * layout to show pruning survives the fan-out.
  * Usage: runMain graft.WarehouseFanoutSmoke [nRows]
  */
object WarehouseFanoutSmoke {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toLong).getOrElse(5000000L)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val base = java.nio.file.Files.createTempDirectory("graft-fanout").toString
    // a thin 3-day warehouse, then an update batch where 90% of rows land
    // on day 2 — the late-feed-for-one-hot-day shape
    val seed = spark.range(n / 50).select(
      col("id").as("user_id"),
      timestamp_micros(lit(1704067200000000L) + pmod(col("id"), lit(3)) * 86400000000L +
        pmod(hash(col("id")), lit(86400)).cast("long") * 1000000L).as("ts"),
      (col("id") % 1000 / 10.0).as("value"))
    val updates = spark.range(n).select(
      (col("id") + 1000000000L).as("user_id"),
      timestamp_micros(lit(1704067200000000L) +
        when(pmod(col("id"), lit(10)) < 9, lit(1L)).otherwise(lit(2L)) * 86400000000L +
        pmod(hash(col("id") * 3), lit(86400)).cast("long") * 1000000L).as("ts"),
      (col("id") % 1000 / 10.0).as("value"))
      .repartition(64).localCheckpoint()

    def hotDayFiles(path: String): Int = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sessionState.newHadoopConf())
      fs.listStatus(new org.apache.hadoop.fs.Path(path, "day=2024-01-02"))
        .count(_.getPath.getName.endsWith(".parquet"))
    }
    Seq(1, 8).foreach { fpd =>
      val path = s"$base/wh$fpd"
      graft.sources.Sources.writeDayPartitioned(seed, "ts", "user_id", path)
      timed(s"hot-day upsert of $n rows, filesPerDay=$fpd") {
        graft.sources.Warehouse.upsertDayPartitioned(
          spark, path, updates, "ts", Seq("user_id"), filesPerDay = fpd)
      }
      println(s"[scale]   hot-day files: ${hotDayFiles(path)}")
      timed(s"point read (day + key range), filesPerDay=$fpd") {
        val got = spark.read.parquet(path)
          .filter(col("day") === "2024-01-02" &&
            col("user_id").between(1002000000L, 1002050000L))
          .count()
        println(s"[scale]   rows: $got")
      }
    }
    spark.stop()
  }
}

/** Round-9 stores/graph smoke: triangle counting under a celebrity
  * node, the quantile store over a 10M-tick table, and snapshot commit
  * cost vs table size. Usage: runMain graft.Round9Smoke [nRows]
  */
object Round9Smoke {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-r9").toString
    timed(s"generate $n ticks") {
      spark.range(n).select(
        col("id").as("event_id"),
        pmod(hash(col("id") * 7), lit(1500)).cast("long").as("user_id"),
        timestamp_micros(lit(1704067200000000L) + col("id") * 700000L).as("ts"),
        (abs(hash(col("id"))) % 20000 / 100.0 + 1.0).as("value"))
        .repartition(64)
        .write.mode("overwrite").parquet(s"$dir/ticks")
    }
    val ticks = spark.read.parquet(s"$dir/ticks")

    // triangle counting under a CELEBRITY node — the case the degree
    // orientation exists for. 2M edges over 100k nodes, one hub
    // connected to 50k of them: id-ordered wedges at the hub would be
    // ~1.25e9 on a single key; oriented, the hub is every edge's HEAD
    // (max degree) and contributes zero wedges.
    timed("triangles: 2M edges, 100k nodes, one 50k-degree hub") {
      val ring = spark.range(2000000).select(
        pmod(hash(col("id") * 13), lit(100000)).cast("long").as("u"),
        pmod(hash(col("id") * 29), lit(100000)).cast("long").as("v"))
      val hub = spark.range(50000).select(
        lit(100001L).as("u"), (col("id") * 2).as("v"))
      val counts = graft.operators.Triangles.perNodeCounts(ring.unionByName(hub))
      val agg = counts.agg(sum(col("n_triangles")), count(lit(1))).head()
      println(s"[scale]   triangle-memberships: ${agg.getLong(0)}, nodes in triangles: ${agg.getLong(1)}")
    }

    // quantile store over the 10M-tick table — build the per-day
    // histograms once, then answer a range p95 from the store alone
    // (the fact table is never rescanned).
    val histPath = s"$dir/histq"
    timed(s"quantile store: build per-day histograms over $n ticks") {
      graft.operators.QuantileStore.writeDailyHistogram(
        ticks, "ts", "value", histPath, lo = 0.0, hi = 220.0, bins = 1024)
    }
    timed("quantile store: p50/p95/p99 over a 30-day range from the store") {
      val est = graft.operators.QuantileStore.estimateQuantiles(
        spark, histPath, "value", "2024-01-01", "2024-01-30",
        Seq(0.5, 0.95, 0.99), lo = 0.0, hi = 220.0, bins = 1024)
        .collect().map(r => f"${r.getDouble(0)}->${r.getDouble(1)}%.2f").mkString(", ")
      println(s"[scale]   $est")
    }

    // snapshot commit cost is proportional to the AFFECTED days, not
    // the table — a 1-day correction against an ~80-day table rewrites
    // one day's rows and re-points a manifest.
    val snapRoot = s"$dir/snap"
    timed(s"snapshots: initial commit of $n ticks (~80 days)") {
      graft.sources.Snapshots.commitUpsert(
        spark, snapRoot, ticks, "ts", Seq("event_id"))
    }
    timed("snapshots: 1-day correction commit + time-travel read-back") {
      val day1 = ticks.filter(to_date(col("ts")) === "2024-01-02")
        .withColumn("value", col("value") + 1.0)
      val v2 = graft.sources.Snapshots.commitUpsert(
        spark, snapRoot, day1, "ts", Seq("event_id"))
      val before = graft.sources.Snapshots.readAt(spark, snapRoot, v2 - 1)
        .filter(to_date(col("ts")) === "2024-01-02").agg(sum(col("value"))).head().getDouble(0)
      val after = graft.sources.Snapshots.readAt(spark, snapRoot, v2)
        .filter(to_date(col("ts")) === "2024-01-02").agg(sum(col("value"))).head().getDouble(0)
      println(f"[scale]   v${v2 - 1} day-sum ${before / 1e6}%.3fM -> v$v2 ${after / 1e6}%.3fM (time travel intact)")
    }
    spark.stop()
  }
}

/** Prefix-filter crossover smoke (round 9): `dedup_jaccard_prefix` is
  * SLOWER than the plain shingle join at sf0.1 (2.3 s vs 1.6 s — the df
  * join + per-doc sort + verify joins are fixed overhead against a mere
  * ~14k-pair-row plain volume) and also on a purely dup-HEAVY corpus
  * (true near-dup groups make candidates irreducibly group-quadratic,
  * so verification dominates both ways). The regime it exists for is
  * the post-crawl REALITY: heavy shared BOILERPLATE (headers, navs,
  * licenses — high-df shingles under the cap) among documents that are
  * NOT near-duplicates of each other, plus a thin layer of true dups.
  * There the plain join pays Σ df²/2 pair rows for pairs that verify to
  * nothing, while boilerplate never enters the rare-first prefixes at
  * all. This smoke builds exactly that corpus and measures both wall
  * time and candidate volume.
  * Usage: runMain graft.JaccardPrefixSmoke [nDocs]
  */
object JaccardPrefixSmoke {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toLong).getOrElse(60000L)
    val streams = 300L // boilerplate families; df per boiler shingle ≈ n/streams
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // each doc: 20 per-doc-unique words + a contiguous 20-word slice of
    // its stream's boilerplate — same-stream docs share high-df shingles
    // but sit far below the 0.8 threshold (J ≈ 0.3). Every ~997th doc is
    // an exact copy of its neighbor (true dups stay a thin layer).
    val eff = when(pmod(col("id"), lit(997)) === 0, col("id") + 1).otherwise(col("id"))
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(39)), j =>
        when(j < 20, concat(lit("u"), eff * lit(40) + j))
          .otherwise(concat(lit("b"), pmod(eff, lit(streams)) * lit(1000) +
            pmod(floor(eff / lit(streams)).cast("long"), lit(5)) * lit(4) + j))),
        " ").as("text"))
      .localCheckpoint()
    val sh = graft.textops.Dedup.cappedShingles(docs, 5).localCheckpoint()
    val plainVol = sh.groupBy("shingle").agg(count(lit(1)).as("d"))
      .agg(sum(expr("d * (d - 1) / 2"))).head().getDouble(0)
    println(f"[scale] plain candidate volume: ${plainVol / 1e6}%.1fM pair rows")
    val nPlain = timed(s"plain shingle-join jaccard over $n dup-heavy docs") {
      graft.textops.Dedup.jaccardPairs(docs, 5, 0.8).count()
    }
    val nPref = timed(s"prefix-filtered jaccard over $n dup-heavy docs") {
      graft.textops.Dedup.jaccardPairsPrefix(docs, 5, 0.8).count()
    }
    require(nPlain == nPref, s"variants disagree: $nPlain vs $nPref")
    println(s"[scale] pair count (identical): $nPlain")
    spark.stop()
  }
}

/** Graph-traversal smoke (round 9): BFS and hop-bounded SSSP on a 10M-edge
  * random digraph (1M nodes, avg out-degree 10) — evidence that the
  * frontier/delta iteration shapes survive a 100× scale-up over the
  * catalog graph: per-round cost tracks the wave front, the visited
  * state stays O(V), and lineage truncation keeps round N as cheap as
  * round 1. Prints per-hop reach counts (the frontier profile) and
  * total walls.
  * Usage: runMain graft.GraphTraversalSmoke [nEdges]
  */
object GraphTraversalSmoke {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nodes = n / 10
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val edges = timed(s"generate $n edges / $nodes nodes") {
      spark.range(n).select(
        pmod(hash(col("id")), lit(nodes)).cast("long").as("src"),
        pmod(hash(col("id") * 31 + 7), lit(nodes)).cast("long").as("dst"),
        (pmod(hash(col("id") * 131), lit(1000)) + 1).cast("long").as("w"))
        .localCheckpoint()
    }
    timed("BFS 5 rounds from node 0") {
      val hops = graft.operators.Bfs.hops(edges, Seq(0L).toDF("node"), maxHops = 5)
      val profile = hops.groupBy("hops").count().orderBy("hops")
        .as[(Long, Long)].collect()
      println(s"[scale]   frontier profile (hop -> discovered): ${profile.mkString(", ")}")
    }
    timed("SSSP 5 rounds from node 0 (weighted)") {
      val d = graft.operators.Sssp.hopBounded(edges, Seq(0L).toDF("node"), rounds = 5)
      println(s"[scale]   reached: ${d.count()} nodes, min dist sum sanity: " +
        d.agg(sum(col("dist"))).head().getLong(0))
    }
    spark.stop()
  }
}

/** Winnowing throughput smoke (round 9): the explode-per-position +
  * min-over-window plan vs the O(n) rolling kernel at a 10× corpus
  * (50k docs, ~17 M chars), SAME Horner gram hash on both sides so the
  * comparison is purely plan shape: the kernel's only shuffle-side cost
  * is the final per-doc aggregate row, while the explode path pushes
  * one row per character through a full doc_id exchange + sort.
  * Measured: 1.6 s vs 34.2 s (21×, vs 6.8× at sf0.1 where the corpus
  * is 10× smaller — the gap widens with scale, as the shuffle-volume
  * argument predicts). Checksums asserted equal.
  * Usage: runMain graft.WinnowThroughputSmoke [nDocs]
  */
object WinnowThroughputSmoke {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(transform(sequence(lit(0), lit(59)), j =>
        concat(lit("w"), pmod(hash(col("id") * 61 + j), lit(3000)))), " ").as("t"))
      .localCheckpoint()
    val nChars = docs.agg(sum(length(col("t")))).head().getLong(0)
    println(f"[scale] corpus: $n docs, ${nChars / 1e6}%.1f M chars")
    val B = graft.textops.TextAnalysis.WinnowBase
    val M = graft.textops.TextAnalysis.WinnowMod
    val rollingSum = timed("rolling kernel (graft_winnow, per-row aggregates)") {
      docs.select(col("doc_id"),
          expr(s"graft_winnow(t, 5, 4, $B, $M)").as("fps"))
        .select(aggregate(array_distinct(col("fps")), lit(0L), _ + _).as("ck"))
        .agg(sum(col("ck"))).head().getLong(0)
    }
    val md5Sum = timed("per-position explode + min-over-window plan") {
      import org.apache.spark.sql.expressions.Window
      val pos = docs
        .select(col("doc_id"), col("t"),
          explode(sequence(lit(1L), (length(col("t")) - 4).cast("long"))).as("i"))
        .withColumn("h",
          expr(graft.textops.TextAnalysis.hornerGramExprSpark("t", "i", 5)))
        .drop("t")
      val frame = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, 3)
      val per = Window.partitionBy("doc_id")
      pos
        .withColumn("fp", min(col("h")).over(frame))
        .withColumn("np", count(lit(1)).over(per))
        .filter(col("i") <= col("np") - 3)
        .groupBy("doc_id").agg(sum_distinct(col("fp")).as("ck"))
        .agg(sum(col("ck"))).head().getLong(0)
    }
    require(rollingSum == md5Sum, s"variants disagree: $rollingSum vs $md5Sum")
    println(s"[scale] checksums agree: $rollingSum")
    spark.stop()
  }
}
