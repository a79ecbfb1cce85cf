package graft

/** Pins MEASURED shuffle volume for the queries whose scale contract is
  * "shuffle the answer, not the data". PlanSpec proves the topology
  * (broadcasts, TakeOrdered, banding); this proves the bytes: a regression
  * that keeps the plan shape but starts moving corpus-sized data (e.g. a
  * broadcast threshold change demoting a join to sort-merge under AQE, a
  * pruned column reappearing in the shuffle) fails here even if every
  * plan-string assertion still matches. Bounds are ×10-generous over
  * measured values at sf0.001 so compression/partitioning wobble cannot
  * flake them, while corpus-sized movement (100s of KB even at sf0.001)
  * still fails.
  */
class ShuffleAuditSpec extends SparkSpec {

  test("answer-sized-shuffle queries move card bytes, sim_topk moves zero") {
    val names = Seq(
      "q_sim_topk", "q_join_agg", "q_rollup_revenue",
      "q_sim_ann_ivf", "q_dedup_minhash")
    val audited = ShuffleAudit.measure(spark, sf, names)
    // measure drops queries that THROW — name them here instead of dying
    // on a bare key-not-found below
    assert(audited.keySet == names.toSet,
      s"queries failed during audit: ${names.toSet -- audited.keySet}")

    // broadcast query vector + per-partition top-k heaps (TakeOrdered):
    // nothing to shuffle at all — the flagship zero-shuffle contract
    assert(audited("q_sim_topk").shuffleBytes == 0L,
      s"q_sim_topk shuffled ${audited("q_sim_topk").shuffleBytes} bytes — " +
        "the broadcast/TakeOrdered plan must not move corpus data")

    // both dimension joins broadcast; the only exchange carries the
    // handful of partial-aggregate card rows
    assert(audited("q_join_agg").shuffleBytes < 16 * 1024,
      s"q_join_agg shuffle ${audited("q_join_agg").shuffleBytes}")

    // ROLLUP partials: grouping-set card rows only
    assert(audited("q_rollup_revenue").shuffleBytes < 16 * 1024,
      s"q_rollup_revenue shuffle ${audited("q_rollup_revenue").shuffleBytes}")

    // IVF probe: only the probed cells' candidate ids move
    assert(audited("q_sim_ann_ivf").shuffleBytes < 64 * 1024,
      s"q_sim_ann_ivf shuffle ${audited("q_sim_ann_ivf").shuffleBytes}")

    // band join on ids — candidate doc ids, never text or signatures
    assert(audited("q_dedup_minhash").shuffleBytes < 64 * 1024,
      s"q_dedup_minhash shuffle ${audited("q_dedup_minhash").shuffleBytes}")
  }
}
