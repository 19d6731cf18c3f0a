package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for the standing streaming jobs, plus
  * THE one place the per-job state cardinality bounds are documented.
  *
  * The default HDFSBackedStateStoreProvider keeps every key's state on
  * the executor HEAP (with snapshot files behind it). That is fine for
  * the window-keyed jobs, whose key space the watermark bounds, but the
  * identity-keyed jobs below carry state proportional to the user/key
  * population — at 100 TB-scale ingest that is hundreds of millions of
  * keys per partition group, which no heap survives. RocksDB
  * (`RocksDBStateStoreProvider`, in-box since Spark 3.2) keeps state
  * off-heap on local SSD with incremental checkpointing — the standard
  * deployment for identity-scale state — and changes NO semantics: the
  * provider is a storage swap, and RocksDbStateSpec proves every
  * stateful job emits identical rows under both backends.
  *
  * Per-job state cardinality (what actually sits in the store):
  *   - windowedAgg / histogramSketch / dauWordsStream / driftToTable:
  *     O(active windows × event types) — WATERMARK-BOUNDED, heap is fine.
  *   - bounceRateStream: O(users active inside the session gap + open
  *     windows) — population-scale transiently, gap-evicted.
  *   - dedupedStream: O(distinct event ids inside the watermark) —
  *     horizon-bounded but identity-dense; RocksDB recommended.
  *   - noveltyStream / noveltyToTable: O(users) × per-user seen-set cap
  *     (versioned state, documented at the job) — IDENTITY-SCALE.
  *   - heavyHittersStream: O(partition groups × k) Misra–Gries counters
  *     — constant per group by construction.
  *   - funnelStream: O(users mid-funnel) — identity-scale until the
  *     timeout reaps them.
  *   - debounced: O(users) single last-event rows — identity-scale.
  *   - cdcToTable: O(live keys) latest-row cells — IDENTITY-SCALE, the
  *     canonical RocksDB case.
  *
  * Deployment: call [[useRocksDb]] on the session BEFORE starting the
  * standing jobs (the conf is read at query start; running queries keep
  * their provider). Local default stays HDFS-backed so tests and the
  * sandbox need no native RocksDB tuning.
  */
object StateBackend {

  val RocksDbProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Route all subsequently-started streaming queries' state to RocksDB. */
  def useRocksDb(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      RocksDbProvider)

  /** Restore the default heap-backed provider (new queries only). */
  def useDefault(spark: SparkSession): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
}
