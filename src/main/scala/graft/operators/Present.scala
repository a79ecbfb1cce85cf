package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Final presentation ordering for ANSWER-SIZED results.
  *
  * A global `orderBy` plans a range exchange whose partition bounds come
  * from a SEPARATE sampling job over the child — two extra scheduler
  * round-trips that are pure floor when the thing being ordered is a
  * card: an aggregate summary, a top-k join-back, a per-group rollup
  * (measured on this machine: collect of a 25-row aggregate is 4 jobs /
  * 0.31 s with `orderBy` vs 2 jobs / 0.22 s via this shape; the sampling
  * job alone is a full extra pass over the input when it is NOT
  * answer-sized, which is why the helper must never migrate to corpus
  * frames). `cardSort` plans the same total order as
  * `Repartition(1, shuffle=false)` + partition-local sort: one task
  * sorts the handful of result rows, no sampling pass, no range
  * exchange, one sorted output file from Verify's parquet dump.
  *
  * Contract — callers guarantee the input is ANSWER-sized (bounded by
  * group-key cardinality / top-k / card geometry, NOT by corpus size):
  * `coalesce(1)` serializes everything after the last exchange, which is
  * exactly right for ≤ ~100 k presentation rows and exactly wrong for a
  * doc-sized frame. Corpus-sized ordered outputs (doc dumps, shard
  * writes) keep the global range sort — at 100 TB that parallel sort IS
  * the correct plan, and [[graft.sources.Layout]] owns those paths.
  */
object Present {
  def cardSort(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)
}
