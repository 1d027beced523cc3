"""Host-ceiling measurement for THE ACTUAL BUILD KERNEL, no Spark.

Runs the flat-postings Arrow inversion kernel over identical
RecordBatches with 1 and 4 OS processes (fixed total work) to measure
what parallel efficiency the silicon itself can deliver for this exact
workload.  This separates host loss (memory bandwidth / CPU steal)
from Spark-side loss (JVM cache scan, Arrow IPC, scheduling) when
reading the N->4N scaling number in BENCH/scaling_latest.md.

Usage: python tools/kernel_ceiling.py [cycles] [batch_rows]
"""
from __future__ import annotations

import multiprocessing as mp
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

CYCLES = int(sys.argv[1]) if len(sys.argv) > 1 else 96
BATCH_ROWS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
SF_DIR = "/root/testdata/sf0.1"

_BATCHES: list[pa.RecordBatch] = []


def _init(batches):
    global _BATCHES
    _BATCHES = batches


def _work(idxs):
    from lucene_clj_spark._udfs import flat_postings_arrow_generator
    from lucene_clj_spark.analysis import resolve_analyzer, STANDARD

    an = resolve_analyzer(None, STANDARD)
    emit = flat_postings_arrow_generator(
        [("text", False)],
        [("lang", False), ("source", False)],
        {}, an,
    )
    rows = 0
    for i in idxs:
        for out in emit(iter([_BATCHES[i]])):
            rows += out.num_rows
    return rows


def main():
    tbl = pq.read_table(
        f"{SF_DIR}/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    base = tbl.combine_chunks()
    n_base = base.num_rows
    batches = []
    # cycle the corpus like bench.cycled_docs, chopped into the same
    # ~batch size Spark's Arrow transfer uses
    reps = []
    for c in range(CYCLES):
        reps.append(base)
    big = pa.concat_tables(reps).combine_chunks()
    for b in big.to_batches(max_chunksize=BATCH_ROWS):
        batches.append(b)
    n_docs = big.num_rows
    print(f"{n_docs} docs in {len(batches)} batches of <= {BATCH_ROWS}")

    res = {}
    for procs in (1, 4, 1, 4):  # interleaved, keep best per level
        chunks = [list(range(i, len(batches), procs)) for i in range(procs)]
        t0 = time.time()
        with mp.Pool(procs, initializer=_init, initargs=(batches,)) as p:
            total = sum(p.map(_work, chunks))
        dt = time.time() - t0
        res[procs] = min(res.get(procs, 1e9), dt)
        print(f"procs={procs}: {dt:.2f}s  ({n_docs/dt:.0f} docs/s, "
              f"{total} postings rows)")
    eff = res[1] / (4 * res[4])
    print(f"KERNEL CEILING 1->4: speedup {res[1]/res[4]:.2f}x, "
          f"efficiency {eff:.3f}")


if __name__ == "__main__":
    mp.set_start_method("fork")
    main()
