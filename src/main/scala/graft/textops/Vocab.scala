package graft.textops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE-style vocabulary induction (Sennrich et al. 2016) as a
  * distributed pipeline — what a tokenizer-training job runs over a
  * training corpus before the corpus is tokenized.
  *
  * Scale shape (the part that matters at 100 TB): the corpus is touched
  * EXACTLY ONCE, by the word-frequency aggregation (map-side partial
  * combine on the word key — the same shape as `ohlcv_daily`). Every
  * merge round after that runs on the COMPACT (word, freq, segmentation)
  * table — O(|vocab|) rows (a web-scale corpus has ~10⁷–10⁸ distinct
  * words, versus ~10¹³ tokens), so the iterative part never rescans the
  * data. Each round is: pair-count aggregation over the vocab, take the
  * argmax, rewrite segmentations with one higher-order-function pass.
  * Per-round lineage is truncated with `localCheckpoint` like
  * `Dedup.connectedComponents` — k merge rounds must not build a
  * k-deep nested plan.
  *
  * The reference has no tokenizer training; this extends its text
  * surface the way SURVEY.md §2's X-tier extends UDFs: reference
  * `etl/etl.py:119` normalizes symbols with a memoized per-string
  * function — here the per-word work is hoisted into the vocab table
  * once, the same cache idea expressed as a DataFrame.
  */
object Vocab {

  /** (w, freq): the one corpus-scale pass. Empty tokens are dropped
    * (split('') artifacts — see TextAnalysis). */
  def wordFreq(documents: DataFrame): DataFrame =
    documents
      .withColumn("w", explode(expr(TextAnalysis.tokensExpr)))
      .filter(length(col("w")) > 0)
      .groupBy("w")
      .agg(count(lit(1)).as("freq"))

  /** Adjacent-symbol-pair counts over a segmentation, weighted by word
    * frequency: the quantity BPE maximizes each round. `segmented` must
    * have (w, freq, sym: array<string>).
    */
  def pairCounts(segmented: DataFrame): DataFrame =
    segmented
      .withColumn("pair", explode(expr(
        """CASE WHEN size(sym) >= 2
             THEN transform(sequence(1, size(sym) - 1),
                            i -> concat(element_at(sym, i), ' ', element_at(sym, i + 1)))
             ELSE array() END""")))
      .groupBy("pair")
      .agg(sum(col("freq")).as("cnt"))

  /** Initial segmentation: each word split into single characters. */
  def segmentChars(wordFreq: DataFrame): DataFrame =
    wordFreq.withColumn("sym",
      expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))"))

  /** One greedy left-to-right merge of the adjacent pair (a, b) → a||b
    * in every word's segmentation — `aaa` under merge (a,a) becomes
    * [aa, a], matching the standard trainer. A fold over symbol indices
    * carrying (output, skip-next) state; higher-order functions don't
    * codegen, but this runs on the compact vocab table, never the corpus.
    */
  private[graft] def applyMerge(segmented: DataFrame, a: String, b: String): DataFrame = {
    def lit_(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
    segmented.withColumn("sym", expr(
      s"""aggregate(
            sequence(1, size(sym)),
            named_struct('out', CAST(array() AS array<string>), 'skip', false),
            (acc, i) -> CASE
              WHEN acc.skip THEN named_struct('out', acc.out, 'skip', false)
              WHEN i < size(sym) AND element_at(sym, i) = '${lit_(a)}'
                   AND element_at(sym, i + 1) = '${lit_(b)}'
                THEN named_struct('out', array_append(acc.out, '${lit_(a + b)}'), 'skip', true)
              ELSE named_struct('out', array_append(acc.out, element_at(sym, i)), 'skip', false)
            END,
            acc -> acc.out)"""))
  }

  /** Apply a trained segmentation to a corpus — the ENCODE step. The
    * corpus joins the compact (w, sym) vocab on the word; out-of-vocab
    * words fall back to character segmentation (the trainer's round-0
    * state). At 100 TB the vocab is broadcast-size (10⁷ words × short
    * arrays), so tokenization costs one corpus scan with a broadcast
    * hash join — no per-document merge replay. Returns per-doc
    * (doc_id, n_words, n_subwords, subword_fp); `subword_fp` is the md5
    * of the position-ordered, space-joined subword stream, so an oracle
    * checks segmentation CONTENT, not just counts. Documents whose
    * tokenization yields zero non-empty tokens are absent from the
    * output (the explode drops them — group-by-key semantics, same as
    * a SQL GROUP BY over the token stream).
    */
  def encode(documents: DataFrame, seg: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), posexplode(expr(TextAnalysis.tokensExpr)).as(Seq("tpos", "w")))
      .filter(length(col("w")) > 0)
      .join(broadcast(seg.select(col("w"), col("sym"))), Seq("w"), "left")
      .withColumn("sym", coalesce(col("sym"),
        expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(col("sym"))).cast("long").as("n_subwords"),
        expr("""md5(concat_ws(' ',
                  transform(array_sort(collect_list(struct(tpos, sym))),
                            x -> concat_ws(' ', x.sym))))""").as("subword_fp"))

  /** Segmentation table for a FIXED, already-published merge list applied
    * in rank order — the encode-against-a-shipped-tokenizer path (the
    * common production case: the vocab is trained once, then every encode
    * job applies the frozen merges). Unlike `bpeTrain`'s output this is
    * fully determined by (corpus words, merge list), so it is
    * oracle-expressible: see `segJoinedDuck`.
    */
  def fixedSeg(documents: DataFrame, merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(segmentChars(wordFreq(documents))) {
      case (s, (a, b)) => applyMerge(s, a, b)
    }

  /** DuckDB expression computing the space-joined subword segmentation of
    * word column `w` under the same fixed merge list — generated from the
    * SAME list as `fixedSeg` so engine and oracle cannot drift (the
    * shared-idiom rule, like `ZOrder.zValueDuck`).
    *
    * Greedy left-to-right pair merging is exactly non-overlapping
    * left-to-right string replace — PROVIDED adjacent matches share no
    * characters. Plain single-space joining breaks that ('t h t h' with
    * merge (t,h): the first match consumes the middle space and the
    * second occurrence is missed, giving [th,t,h] where greedy BPE gives
    * [th,th]). So each symbol is wrapped in chr(31) boundaries —
    * (shown as ␟ here): the segmentation [a, b] becomes ␟a␟␟b␟ — making every match
    * self-contained: replace(s, ␟a␟␟b␟, ␟ab␟) ≡ one `applyMerge` pass,
    * including the `aaa`→[aa,a] tiebreak. chr(31) (unit separator)
    * cannot occur inside a whitespace-split token.
    */
  def segJoinedDuck(w: String, merges: Seq[(String, String)]): String = {
    val B = "chr(31)"
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    val init = s"$B || array_to_string(string_split($w, ''), $B||$B) || $B"
    val merged = merges.foldLeft(init) { case (s, (a, b)) =>
      s"replace($s, $B||${q(a)}||$B||$B||${q(b)}||$B, $B||${q(a + b)}||$B)"
    }
    s"trim(replace($merged, $B||$B, ' '), $B)"
  }

  /** Tokenizer-grain spec stamped into persisted vocab artifacts — the
    * same self-description contract as `Dedup.sigSpec`: an encode
    * against a vocab trained under a different tokenization must fail
    * loudly, not silently mis-segment. */
  def vocabSpec(nMerges: Int): String = s"v1:bpe:ws-lower:m$nMerges"

  /** Persist a trained vocab: `<path>/merges` (rank, left, right, cnt)
    * and `<path>/seg` (w, freq, sym) parquet, both stamped with
    * `vocab_spec` — the tokenizer artifact a production pipeline trains
    * once and every encode job reads. */
  def writeVocab(path: String, merges: Seq[(Int, String, String, Long)],
                 seg: DataFrame, nMerges: Int): Unit = {
    val spark = seg.sparkSession
    import spark.implicits._
    merges.toDF("rank", "left", "right", "cnt")
      .withColumn("vocab_spec", lit(vocabSpec(nMerges)))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
    seg.select(col("w"), col("freq"), col("sym"))
      .withColumn("vocab_spec", lit(vocabSpec(nMerges)))
      .write.mode("overwrite").parquet(s"$path/seg")
  }

  /** Read a persisted vocab back, validating the spec. Returns
    * (merges, seg) — seg plugs straight into `encode`. */
  def readVocab(spark: org.apache.spark.sql.SparkSession, path: String,
                nMerges: Int): (DataFrame, DataFrame) = {
    val merges = spark.read.parquet(s"$path/merges")
    val seg = spark.read.parquet(s"$path/seg")
    Seq(merges, seg).foreach { df =>
      require(df.columns.contains("vocab_spec"),
        s"$path has no vocab_spec column — not a writeVocab artifact")
      df.select("vocab_spec").head(1).foreach { r =>
        require(r.getString(0) == vocabSpec(nMerges),
          s"vocab scheme mismatch: artifact is ${r.getString(0)}, caller requested ${vocabSpec(nMerges)}")
      }
    }
    (merges.drop("vocab_spec"), seg.drop("vocab_spec"))
  }

  /** Train `nMerges` BPE merges. Returns (merges, final segmentation);
    * merges = (rank, left, right, cnt) with rank 1 = first merge.
    * Tiebreak on equal counts is lexicographic on the pair — both
    * deterministic and engine-independent. Stops early when no pair
    * remains (fully merged vocab).
    */
  def bpeTrain(documents: DataFrame, nMerges: Int): (Seq[(Int, String, String, Long)], DataFrame) = {
    // the corpus-scale agg is over; size the per-round parallelism to the
    // VOCAB, not the corpus — a small vocab (test scale, domain corpora)
    // spread over 32 shuffle partitions pays 16 rounds × 32 empty-task
    // scheduling for nothing. Web-scale vocabs (≥ ~1M words) keep the
    // session's partitioning.
    val wf = wordFreq(documents).localCheckpoint()
    val nVocab = wf.count()
    val sized = if (nVocab < 1000000L) wf.coalesce(1) else wf
    var seg = segmentChars(sized).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      // argmax by (cnt desc, pair asc): ONE row to the driver per round
      val top = pairCounts(seg)
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((rank, a, b, cnt))
        seg = applyMerge(seg, a, b).localCheckpoint()
        rank += 1
      }
    }
    (merges.toSeq, seg)
  }
}
