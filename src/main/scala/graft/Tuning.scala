package graft

/** The engine's measured dispatch/sizing constants, hoisted to ONE
  * surface. Every value here was set by a box measurement (the "where
  * measured" pointer on each constant; the full table lives in SCALING.md
  * §"Tuning constants"), and every one of them is the kind of number that
  * needs RETUNING when the hardware changes — a 100× cluster re-derives
  * them from its own probes, which should be an env override
  * (`GRAFT_<NAME>`), never a five-file source edit.
  *
  * The constants stay REFERENCED from their algorithm's scaladoc (the
  * measurement story reads best next to the dispatch it drives); this
  * object is the single point of truth for the values.
  */
object Tuning {
  private def envLong(name: String, dflt: Long): Long =
    sys.env.get(name).map(_.toLong).getOrElse(dflt)
  private def envDouble(name: String, dflt: Double): Double =
    sys.env.get(name).map(_.toDouble).getOrElse(dflt)

  /** Corpus size (vectors) above which PQ training-sample collection and
    * the encode scan repartition to core count instead of inheriting file
    * parallelism. Measured fork points (BENCHMARKS.md round-7 "PQ fan-out
    * gate", sf-ladder solo probes): 20k vectors −1.7×, 100k −1.2× (fan-out
    * loses — repartition overhead beats the extra cores), 200k +1.7×
    * (wins); 128k sits between the measured arms. Used by
    * [[graft.similarity.Pq]]. */
  val PqFanoutGateVectors: Long =
    envLong("GRAFT_PQ_FANOUT_GATE_VECTORS", 128L * 1024)

  /** Largest per-group row count the window-rank (single-task-per-group
    * sort) exact-percentile form may handle before bucket selection takes
    * over. Measured crossover ~1M rows/group (q52 shape, QueryProbe solo:
    * sort wins at 0.3M, loses 3× at 3M, 5× at 30M — BENCHMARKS.md round-7
    * percentile table); 512k sits just under it and is also a comfortable
    * single-task sort memory-wise. Used by [[graft.ops.Percentiles]]. */
  val SortPathMaxGroupRows: Long =
    envLong("GRAFT_SORT_PATH_MAX_GROUP_ROWS", 512L * 1024)

  /** Largest pair-rows-per-posting ratio (Σ df·(df−1)/2 over Σ df) at
    * which the posting-count similarity-join regime is still preferred
    * over prefix-filter+verify. Bracketed (BENCHMARKS.md round-7
    * "τ-dispatch crossover"): GenScale corpora sit at 0.5–4.9 where
    * posting-count wins 1.5–3× at every probed τ; one planted hot gram
    * pushes the ratio to 51.5 where prefix wins 2.9× at 5k docs and
    * diverges df² vs linear beyond. Used by [[graft.dedup.Dedup]]. */
  val PostingMaxPairRowsPerPosting: Double =
    envDouble("GRAFT_POSTING_MAX_PAIR_ROWS_PER_POSTING", 16.0)

  /** Target bytes per FASTA output file; write fan-out = max(cores,
    * estimated bytes / this). The round-7 sf10 sweep caught the constant
    * fan-out this replaced (whole corpus rendered through 4 tasks → q101
    * at 137 s; volume-derived fan-out → 2.9 s steady). 64 MB matches the
    * parquet-side maxPartitionBytes convention — big enough that file
    * count tracks volume, small enough that one file is one task's write.
    * Used by [[graft.sources.Fasta.write]]. */
  val FastaWriteTargetBytes: Long =
    envLong("GRAFT_FASTA_WRITE_TARGET_BYTES", 64L << 20)

  /** Largest query-batch size adcTopKBatch evaluates in ONE plan before
    * chunking. HISTORY: through r11 the batched projection computed Q
    * ADC distances per codes row as Q×M nested element_at lookups in
    * one generated method, whose per-row cost grew super-linearly past
    * Q≈64 as the method defeated whole-stage codegen (r10 sweep at 20k
    * vectors, single-plan: Q=256 169 s — SLOWER than 256 singles — plus
    * a 16 GB driver OOM from JIT deopt); 32 was the measured-best chunk.
    * r12 rewrote the scorer to explode qi FIRST and key the table
    * lookup by the qi COLUMN, so the generated expression is ONE M-term
    * sum at any Q — remeasured same-box A/B at Q=256: one plan 18.5 s
    * vs chunked-32 24.1 s at sf0.1 and 22.0 s vs 25.9 s at sf1, no OOM,
    * every chunk being a FULL extra codes scan on this path.
    * r13 swept the remaining ceiling — the distance-table plan literal —
    * to Q=2000 and found the r12 shape shipped M COPIES of the whole
    * Q×M×K literal per task binary (one copy per sum term: 59 KB/query,
    * 117.9 MiB task binary and 183 s at Q=2000). Per-subspace literals
    * (Pq.adcSubspaceTableCols — each referenced once) dropped the task
    * binary to ~3.8 KB/query (7.6 MiB at Q=2000) and the one-plan wall
    * to 2.6/4.6/8.6/23.3 s at Q=256/512/1024/2000 — LINEAR, no cliff
    * through the full sf0.1 corpus, so the ceiling rises to 2048
    * (task binary ≈ Q×M×K×8 B×2 ≈ 8 MiB there; chunked@256 measured
    * equal at toy sf but pays ceil(Q/chunk)−1 extra FULL corpus scans
    * at real scale). BENCHMARKS r13 has the sweep table.
    * Used by [[graft.similarity.Pq.adcTopKBatch]]. */
  val AdcBatchMaxQ: Int =
    envLong("GRAFT_ADC_BATCH_MAX_Q", 2048L).toInt

  /** The IVF-PQ batch path's chunk ceiling ([[graft.similarity.IvfPq
    * .ivfPqTopKBatch]]) — SEPARATE from [[AdcBatchMaxQ]] because its
    * chunking is not overhead: each chunk scans only the UNION of its
    * members' probe partitions, and greedy probe-overlap packing
    * measured −13.5% scanned rows at Q=256/nprobe=6 (r11). On a
    * partition-pruned index, scanned volume — not plan width — is the
    * 10¹¹-vector cost, so chunks stay small; the r12 explode-first
    * scorer removed the codegen reason to chunk, not the pruning one. */
  val IvfPqBatchMaxQ: Int =
    envLong("GRAFT_IVFPQ_BATCH_MAX_Q", 32L).toInt

  /** Appended-mass fraction past which an IVF-PQ index should retrain
    * (the model-drift contract, r12 verdict task #7). The PQ codebooks
    * and IVF centroids quantize the distribution they trained on;
    * appends from that distribution are free, but once appended mass is
    * a substantial share of the trained corpus the model can be
    * quantizing a moved distribution — ~25% is the documented
    * operational threshold (Jégou et al. §V; FAISS practice; COVERAGE.md
    * drift note). [[graft.similarity.IvfPq.ivfPqAppend]] warns on stderr
    * at the crossing; [[graft.similarity.IvfPq.ivfPqDrift]] exposes the
    * fraction programmatically. Env knob: the fraction × 100 (percent),
    * because envLong is the established integer-only surface here. */
  val IvfPqRetrainFraction: Double =
    envLong("GRAFT_IVFPQ_RETRAIN_PCT", 25L) / 100.0

  /** Cap on the triangle census's wedge-prefilter Bloom sketch
    * ([[graft.graph.Graph.trianglesOriented]], r13). The sketch rides
    * the plan as a literal, so its size is a per-task-binary cost: at
    * the 1% fpp's ~9.6 bits/edge, 2^28 bits ≈ 32 MiB covers ~2.8e7
    * edges; past the cap the realized fpp rises smoothly (more wedges
    * survive the prefilter and are verified by the unchanged closing
    * join — graceful degradation, never a wrong row). Measured at
    * sf0.1: 41.1M wedges → ~0.3% close; the prefilter removes the
    * suite's largest exchange (456 MB → ~6 MB). A cluster with more
    * executor headroom can raise this to keep fpp at 1% on bigger
    * graphs. */
  val TriangleBloomMaxBits: Long =
    envLong("GRAFT_TRIANGLE_BLOOM_MAX_BITS", 1L << 28)

  /** Row count past which SMJ/cartesian per-key match buffers switch from
    * an on-heap ArrayBuffer to a spillable UnsafeExternalSorter
    * (`spark.sql.{sortMergeJoinExec,cartesianProductExec}.buffer.in.memory
    * .threshold`). Spark's default is effectively infinite, which turned
    * one skewed gram-join key into an executor OOM at sf10 (stage-1030
    * smj_findNextJoinRows — BENCHMARKS.md round-6). 64k rows ≈ single-digit
    * MB for the widest buffered rows here: negligible for normal keys,
    * disk instead of heap for pathological ones. Used by
    * [[graft.Sessions]] and [[graft.Bench]]. */
  val JoinBufferSpillRows: Long =
    envLong("GRAFT_JOIN_BUFFER_SPILL_ROWS", 65536L)
}
