package graft.streaming

/** T1 — count-or-time rotation predicate (reference: time-to-save?,
  * src/kinesis3/core.clj:113-120; defaults batch=1e6, interval=180 s at
  * core.clj:207-209).
  *
  * Fires iff at least one item is buffered AND (the interval has elapsed
  * since the last write OR the buffer reached the batch-size cap).
  *
  * In the Spark engine this predicate is the *contract*, not the mechanism:
  * Structured Streaming rotates on micro-batch boundaries, so the engine
  * enforces the observable guarantee ("≤ batchSize records per file,
  * ≤ interval seconds of latency") via Trigger.ProcessingTime(interval) +
  * a source-side rate cap (maxOffsetsPerTrigger-style). This object is the
  * single place both the batch sink and the tests read the rule from.
  */
object RotationTrigger {
  val DefaultBatchSize: Long = 1000000L
  val DefaultIntervalMs: Long = 180000L

  /** @param itemCount   records buffered since last rotation
    * @param lastWriteMs epoch-millis of the last rotation
    * @param nowMs       current epoch-millis
    */
  def timeToSave(
      batchSize: Long,
      itemCount: Long,
      lastWriteMs: Long,
      intervalMs: Long,
      nowMs: Long): Boolean =
    itemCount > 0 && (nowMs >= lastWriteMs + intervalMs || itemCount >= batchSize)
}
