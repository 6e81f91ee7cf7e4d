package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact-duplicate removal as the FIRST stage of a streaming document
  * ingest — the cheap standard filter that sits on the stream BEFORE the
  * expensive per-batch work (quality gate, signature-store near-dup join,
  * packing). An at-least-once source replays whole files; paying a
  * minhash join to re-discover byte-identical replays is wasted work the
  * watermark-scoped exact dedup removes for the cost of one hash and one
  * keyed state lookup.
  *
  * Mechanics: a 128-bit content hash over `contentCols`, then
  * `dropDuplicatesWithinWatermark` on it — the first arrival of a hash is
  * emitted, later arrivals within the watermark horizon are dropped, and
  * the (hash, ts) state row is evicted once the watermark passes its
  * event time. State is therefore O(unique documents inside the
  * watermark window), never O(history) — the property that lets the
  * stream run forever at 100 TB/day.
  *
  * Equivalence contract (spec-proven): for watermark-delivered data —
  * every duplicate arrives within `delay` of the first occurrence — the
  * surviving content set EQUALS batch `dropDuplicates` over the same
  * rows. Accepted divergence, by design: a duplicate arriving with a
  * fresh event time AFTER the watermark evicted its original's state
  * (e.g. a re-crawl weeks later) is emitted again; catching those is the
  * signature store's job (`Dedup.incrementalSigPairs` downstream), which
  * persists across the whole corpus history. The two stages are
  * complementary, not redundant: watermark state handles the replay
  * storm cheaply, the store handles deep history exactly once per
  * SURVIVOR.
  *
  * Nulls: a NULL content column hashes via a reserved sentinel, so
  * (NULL) and ("") are distinct identities and all-NULL rows dedup
  * against each other instead of passing through unchecked.
  */
object StreamingDedup {

  /** The content identity shared by the streaming and batch sides —
    * md5 (128-bit: collisions negligible at corpus scale, unlike a
    * 64-bit hash where 5B docs reach the birthday bound) over the
    * unit-separator-joined content columns. Codegen-friendly: plain
    * `md5`/`concat_ws`, no UDF. U+001F cannot survive in crawl text
    * columns that were whitespace-normalized, and U+0000 marks NULL —
    * the same boundary trick as `Vocab.segJoinedDuck`.
    */
  def withContentHash(docs: DataFrame, contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "contentCols must name at least one column")
    docs.withColumn("content_hash",
      md5(concat_ws("\u001F",
        contentCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)))
  }

  /** `docs` (streaming) with exact content duplicates removed within the
    * watermark horizon. Emits the first arrival of each content hash;
    * `content_hash` is dropped from the output so the stage is
    * schema-transparent to the rest of the ingest loop.
    */
  def exactDedupWithinWatermark(
      docs: DataFrame,
      tsCol: String,
      delay: String,
      contentCols: Seq[String] = Seq("text")): DataFrame =
    withContentHash(docs, contentCols)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("content_hash")
      .drop("content_hash")
}
