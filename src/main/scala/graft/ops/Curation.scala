package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** End-to-end corpus curation: the composition the individual operators
  * exist for, as one declarative pipeline —
  *
  *   quality gate -> PII redaction -> exact dedup -> near-dup dedup
  *   (MinHash-LSH + connected components, canonical survivor) ->
  *   deterministic content sample
  *
  * Every stage is the already-verified operator (each oracled or
  * spec-tested on its own); this module only wires them, so the
  * composition inherits their scale properties: narrow scoring/redaction,
  * bucket-local candidate generation, id-only shuffles, reproducible
  * sampling. Stage counts come back in a [[Curation.Report]] — the
  * numbers a curation run is judged by in practice.
  */
object Curation {

  /** Survivor counts after each stage (input rows -> final corpus). */
  case class Report(input: Long, afterQuality: Long, afterExact: Long,
                    afterNearDup: Long, afterSample: Long)

  /** Run the full gate. Returns (curated docs: idCol + redacted `text`,
    * report). Deterministic: same input -> same output, any run order.
    *
    * @param sampleNibbles leading md5 nibbles to KEEP ("0123" = 25%);
    *   "0123456789abcdef" disables sampling.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
             minScore: Double = 70.0, minTokens: Int = 5,
             jaccardThreshold: Double = 0.5,
             sampleNibbles: String = "0123456789abcdef"): (DataFrame, Report) = {
    val input = docs.count()

    // Each surviving stage is persisted before it is counted, so the
    // docs -> quality -> exact -> near-dup chain is computed exactly once
    // end to end: stage N+1 reads stage N's materialization, and the
    // count actions are scans of already-computed partitions, not
    // re-executions of the whole upstream pipeline.
    val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stage(df: DataFrame): DataFrame = {
      val p = df.persist(StorageLevel.MEMORY_AND_DISK); staged += p; p
    }

    // 1. quality gate (narrow, per-row score battery) + 2. PII redaction
    // (narrow, BEFORE dedup so documents differing only in redacted
    // spans collapse as exact duplicates) — one persisted stage
    val qualityIds = TextAnalysis.qualityFilter(docs, idCol, textCol,
      minScore, minTokens).select(col(idCol))
    val quality = stage(docs.join(qualityIds, Seq(idCol), "left_semi"))
    val nQuality = quality.count()
    val redacted = quality.select(col(idCol),
      TextAnalysis.redactPii(col(textCol)).as(textCol))

    // 3. exact dedup: deterministic first-write-wins survivor
    val exactKeep = Dedup.exact(redacted, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val afterExact = stage(redacted.join(exactKeep, Seq(idCol), "left_semi"))
    val nExact = afterExact.count()

    // 4. near-dup dedup: canonical survivor per LSH/components cluster
    // (internally materialized write-then-read by connectedComponents)
    val canonical = Dedup.nearDupClusters(afterExact, idCol, textCol,
        threshold = jaccardThreshold)
      .filter(col("is_canonical")).select(col(idCol))
    val afterNearDup = stage(afterExact.join(canonical, Seq(idCol), "left_semi"))
    val nNearDup = afterNearDup.count()

    // 5. deterministic content-keyed sample — materialized eagerly so the
    // returned frame survives the unpersist of its parents
    val sampled = TextAnalysis.sampleByContent(afterNearDup, textCol, sampleNibbles)
      .localCheckpoint(true)
    val nSampled = sampled.count()
    staged.foreach(_.unpersist(false))

    (sampled, Report(input, nQuality, nExact, nNearDup, nSampled))
  }
}
