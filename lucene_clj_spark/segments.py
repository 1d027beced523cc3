"""Compressed posting-segment build — the at-scale index artifact.

Layout (north_star: per-partition inverted-index segments as sorted
(term, docID-delta, tf) posting lists with varint block compression plus
per-block max-score metadata, merged via repartition-by-term-hash,
resumable from per-partition manifests):

    <index>/segments/bucket=<b>/*.parquet   one row per posting BLOCK:
        field, term, chunk, block_id, n, first_doc, last_doc,
        doc_deltas BINARY (varint gaps), tfs BINARY (varint),
        norms BINARY (1 byte/posting, SmallFloat byte4),
        positions BINARY (varint, per-posting delta runs),
        impacts ARRAY<STRUCT<tf,qdl>> (pareto frontier, see below)
    <index>/manifests/bucket_<b>.json       lineage + metrics manifest
    <index>/manifests/delta_<n>.json        per-append delta manifest

Impacts instead of scores (format 2): each block stores the PARETO
FRONTIER of its postings' (tf, quantized-dl) pairs — exactly Lucene's
impact metadata model. The BM25 block upper bound
``max_i idf * tf_i / (tf_i + k1*(1-b+b*qdl_i/avgdl))`` is computed AT
QUERY TIME from the frontier with the CURRENT corpus stats (wand.py
_segment_scan), which keeps block-max pruning exact. This makes the
encoded segments independent of (N, avgdl, df) — so an append of new
documents never invalidates or re-encodes existing segment files, it
just adds DELTA blocks (append_segments), Lucene's flush-then-merge
model (reference indexer.clj:35-39).

Scale/skew design:
- Buckets = ``pmod(xxhash64(term), n_buckets)`` — the repartition-by-
  term-hash merge. One BUCKET JOB per bucket, committed independently
  with its manifest; interrupted builds resume by skipping buckets whose
  manifest exists (write data THEN manifest, so a missing manifest means
  incomplete — SURVEY.md §7 hard-part #5).
- Hot terms do NOT skew the encode: the applyInPandas group key is
  (field, term, chunk) where ``chunk = doc_id // chunk_span`` — a
  stopword with 10^11 postings becomes 10^11/chunk_span bounded groups
  spread over all partitions. This is structural salting; no AQE luck
  needed.
- Each bucket writes MULTIPLE files, range-partitioned and sorted on
  (field, term, chunk): parquet min/max statistics on the sorted term
  column preserve seek behavior while the write parallelism scales with
  the cluster instead of funnelling a bucket through one task (the
  VERDICT r02 repartition(1) choke).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F

from lucene_clj_spark import bm25, codec

SEGMENT_SCHEMA = (
    "field string, term string, chunk long, block_id int, n int, "
    "first_doc long, last_doc long, doc_deltas binary, tfs binary, "
    "norms binary, positions binary, "
    "impacts array<struct<tf: double, qdl: double>>"
)

# 1 = encode-time block_max_score; 2 = impact pairs (varint blocks);
# 3 = impact pairs + fixed-layout FOR blocks; 4 = adaptive FOR/varint
# blocks, first value split into the header, split position streams;
# 5 = + PFor arm (patched FOR: base width chosen by a bit-length-
# histogram cost model, outliers' high bits in fixed-width side
# streams under tag 0x40|w). Every layout change bumps the format —
# 3 and 4 share codec.encode_block, but decoding an older file with
# a newer decoder would return garbage, not an error, so the meta
# gate must refuse it.
SEGMENT_FORMAT = 5

DEFAULT_CHUNK_SPAN = 1 << 17  # 131072 docs per chunk group
DEFAULT_BUCKETS = 16


def _check_no_pending_append(root: str | None) -> None:
    """Honor the add_documents crash journal: a surviving
    ``_append_pending.json`` means the postings/docs tables AND any
    delta segment files may be partial — encoding or merging from them
    would bake the partial state into committed segment files that the
    load-time refusal can no longer protect."""
    from lucene_clj_spark.indexer import APPEND_PENDING, PURGE_PENDING
    from lucene_clj_spark.errors import ValidationError

    if root and os.path.exists(os.path.join(root, APPEND_PENDING)):
        raise ValidationError(
            f"index at {root} has an interrupted append "
            f"({APPEND_PENDING} present) — its tables and delta "
            "segments may be partial; rebuild the index or restore "
            "from source before (re)building or merging segments",
            {"path": root},
        )
    if root and os.path.exists(os.path.join(root, PURGE_PENDING)):
        # purge_deletes clears this marker once the TABLES are
        # consistent and only then rebuilds segments (a crash during
        # that rebuild leaves a half-built segment set, which the
        # manifest machinery already fences) — so a visible marker
        # always means a crashed table rewrite
        raise ValidationError(
            f"index at {root} has an interrupted purge "
            f"({PURGE_PENDING} present) — its tables may mix "
            "purged and unpurged state; rebuild the index or restore "
            "from source before (re)building or merging segments",
            {"path": root},
        )


def _impact_frontier(tfs: np.ndarray, qdl: np.ndarray) -> list[dict]:
    """Pareto frontier of (tf, qdl): keep pairs where no other pair has
    tf >= and qdl <=. BM25 is increasing in tf and decreasing in qdl,
    so ``max over frontier`` equals ``max over postings`` for ANY
    (idf, avgdl) — the stats-independent exact block bound."""
    order = np.lexsort((qdl, -tfs))  # tf desc, qdl asc
    q = qdl[order]
    # vectorized frontier: keep i where q[i] strictly improves on the
    # running min of everything with higher-or-equal tf before it (no
    # per-posting Python loop — this runs in the encode hot path)
    keep = np.empty(q.size, dtype=bool)
    keep[0] = True
    keep[1:] = q[1:] < np.minimum.accumulate(q)[:-1]
    kept = order[keep]
    return [
        {"tf": float(t), "qdl": float(d)}
        for t, d in zip(tfs[kept], qdl[kept])
    ]


def _encode_group(pdf: pd.DataFrame, block_size: int) -> pd.DataFrame:
    """Encode one (field, term, chunk) group of postings into blocks.
    Stats-free: needs only the postings themselves (format 2)."""
    pdf = pdf.sort_values("doc_id")
    field = pdf["field"].iloc[0]
    term = pdf["term"].iloc[0]
    chunk = int(pdf["chunk"].iloc[0])

    doc_ids = pdf["doc_id"].to_numpy(np.int64)
    tfs = pdf["tf"].to_numpy(np.int64)
    dls = pdf["dl"].to_numpy(np.int64)
    norms = bm25.norm_byte_np(dls)
    has_pos = pdf["positions"].iloc[0] is not None
    out = []
    for b0 in range(0, len(pdf), block_size):
        sl = slice(b0, b0 + block_size)
        ids = doc_ids[sl]
        btf = tfs[sl]
        bnorm = norms[sl]
        qdl = bm25.LENGTH_TABLE[bnorm].astype(np.float64)
        if has_pos:
            pos_buf = codec.encode_positions(
                btf, pdf["positions"].iloc[sl].to_list()
            )
        else:
            pos_buf = b""
        out.append(
            {
                "field": field,
                "term": term,
                "chunk": chunk,
                "block_id": b0 // block_size,
                "n": len(ids),
                "first_doc": int(ids[0]),
                "last_doc": int(ids[-1]),
                "doc_deltas": codec.encode_block(
                    codec.delta_encode(ids).astype(np.uint64)
                ),
                "tfs": codec.encode_block(btf.astype(np.uint64)),
                "norms": bnorm.tobytes(),
                "positions": pos_buf,
                "impacts": _impact_frontier(
                    btf.astype(np.float64), qdl
                ),
            }
        )
    return pd.DataFrame(out)


PA_SEGMENT_SCHEMA = pa.schema([
    pa.field("field", pa.string()),
    pa.field("term", pa.string()),
    pa.field("chunk", pa.int64()),
    pa.field("block_id", pa.int32()),
    pa.field("n", pa.int32()),
    pa.field("first_doc", pa.int64()),
    pa.field("last_doc", pa.int64()),
    pa.field("doc_deltas", pa.binary()),
    pa.field("tfs", pa.binary()),
    pa.field("norms", pa.binary()),
    pa.field("positions", pa.binary()),
    pa.field("impacts", pa.list_(pa.struct([
        pa.field("tf", pa.float64()),
        pa.field("qdl", pa.float64()),
    ]))),
])


def _one_chunk(col) -> pa.Array:
    """A Table column (ChunkedArray) as a single contiguous Array."""
    if isinstance(col, pa.ChunkedArray):
        return col.combine_chunks()
    return col


def _last_group_start(tbl: pa.Table) -> int:
    """Start index of the trailing (field, term, chunk) group of a
    group-sorted slab — the split point for the cross-batch carry."""
    n = tbl.num_rows
    fld = _one_chunk(tbl.column("field"))
    trm = _one_chunk(tbl.column("term"))
    chk = tbl.column("chunk").to_numpy()
    same = (
        pc.equal(fld, fld[n - 1]).to_numpy(zero_copy_only=False)
        & pc.equal(trm, trm[n - 1]).to_numpy(zero_copy_only=False)
        & (chk == chk[n - 1])
    )
    not_tail = np.flatnonzero(~same)
    return int(not_tail[-1]) + 1 if not_tail.size else 0


def _encode_table(tbl: pa.Table, block_size: int) -> pa.RecordBatch:
    """Encode a SLAB of postings — many complete (field, term, chunk)
    groups, already sorted by (field, term, chunk, doc_id) — in one
    vectorized pass. Group boundaries come from adjacent-row compares
    on dictionary codes; norms/qdl are computed once for the whole
    slab; positions are sliced straight out of the Arrow list column's
    flat values buffer (no per-posting python objects). Replaces the
    per-group applyInPandas encode, whose fixed per-group overhead
    measured 76% of encode wall-clock at a realistic (24k-term Zipf)
    vocabulary — the regime a web corpus is actually in."""
    n = tbl.num_rows
    field_a = _one_chunk(tbl.column("field"))
    term_a = _one_chunk(tbl.column("term"))
    chunk = tbl.column("chunk").to_numpy()
    doc_ids = np.ascontiguousarray(tbl.column("doc_id").to_numpy(), np.int64)
    tfs_all = np.ascontiguousarray(tbl.column("tf").to_numpy(), np.int64)
    dls = np.ascontiguousarray(tbl.column("dl").to_numpy(), np.int64)
    norms_all = bm25.norm_byte_np(dls)
    qdl_all = bm25.LENGTH_TABLE[norms_all].astype(np.float64)
    tf_f64 = tfs_all.astype(np.float64)
    tf_u64 = tfs_all.astype(np.uint64)

    f_codes = pc.dictionary_encode(field_a).indices.to_numpy()
    t_codes = pc.dictionary_encode(term_a).indices.to_numpy()
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (
        (f_codes[1:] != f_codes[:-1])
        | (t_codes[1:] != t_codes[:-1])
        | (chunk[1:] != chunk[:-1])
    )
    g_starts = np.flatnonzero(change)
    g_ends = np.append(g_starts[1:], n)

    pos_a = _one_chunk(tbl.column("positions"))
    pos_valid = pos_a.is_valid().to_numpy(zero_copy_only=False)
    # sliced ListArrays keep absolute offsets into the full child
    # values buffer, so off[i]:off[i+1] indexes pos_vals correctly
    pos_off = pos_a.offsets.to_numpy().astype(np.int64, copy=False)
    pos_vals = pos_a.values.to_numpy(zero_copy_only=False)

    cols: dict[str, list] = {name: [] for name in PA_SEGMENT_SCHEMA.names}
    for gi in range(g_starts.size):
        s, e = int(g_starts[gi]), int(g_ends[gi])
        fld = field_a[s].as_py()
        trm = term_a[s].as_py()
        chk = int(chunk[s])
        has_pos = bool(pos_valid[s])
        block_id = 0
        for b0 in range(s, e, block_size):
            b1 = min(b0 + block_size, e)
            ids = doc_ids[b0:b1]
            cols["field"].append(fld)
            cols["term"].append(trm)
            cols["chunk"].append(chk)
            cols["block_id"].append(block_id)
            cols["n"].append(b1 - b0)
            cols["first_doc"].append(int(ids[0]))
            cols["last_doc"].append(int(ids[-1]))
            cols["doc_deltas"].append(codec.encode_block(
                codec.delta_encode(ids).astype(np.uint64)
            ))
            cols["tfs"].append(codec.encode_block(tf_u64[b0:b1]))
            cols["norms"].append(norms_all[b0:b1].tobytes())
            cols["positions"].append(
                codec.encode_positions_flat(
                    tfs_all[b0:b1], pos_vals[pos_off[b0]:pos_off[b1]]
                ) if has_pos else b""
            )
            cols["impacts"].append(
                _impact_frontier(tf_f64[b0:b1], qdl_all[b0:b1])
            )
            block_id += 1
    return pa.RecordBatch.from_pydict(cols, schema=PA_SEGMENT_SCHEMA)


def _decode_blocks_table(tbl: pa.Table) -> pa.Table:
    """Inverse of ``_encode_table``: a slab of encoded block rows
    (sorted by field, term, chunk, first_doc) back to flat postings
    (field, term, chunk, doc_id, tf, dl, positions), ready to be
    re-encoded. Appended delta blocks always hold doc_ids above the
    base generation's max (add_documents assigns dense ids past the
    current max), so first_doc order concatenates to doc_id order —
    guarded anyway by a lexsort fallback."""
    nb = tbl.num_rows
    field_a = _one_chunk(tbl.column("field"))
    term_a = _one_chunk(tbl.column("term"))
    chunk = tbl.column("chunk").to_numpy()
    dd = tbl.column("doc_deltas").to_pylist()
    tfb = tbl.column("tfs").to_pylist()
    nmb = tbl.column("norms").to_pylist()
    psb = tbl.column("positions").to_pylist()

    counts = np.empty(nb, dtype=np.int64)
    has_pos_rows = np.empty(nb, dtype=bool)
    ids_parts, tf_parts, dl_parts, pos_parts = [], [], [], []
    for i in range(nb):
        ids = codec.delta_decode(codec.decode_block(dd[i]))
        tfs = codec.decode_block(tfb[i]).astype(np.int64)
        norms = np.frombuffer(nmb[i], dtype=np.uint8)
        # norm byte -> quantized length; re-encoding quantizes again
        # (idempotent: int_to_int4(int4_to_int(b)) == b)
        dls = bm25.LENGTH_TABLE[norms].astype(np.int64)
        counts[i] = ids.size
        has_pos_rows[i] = len(psb[i]) > 0
        ids_parts.append(ids)
        tf_parts.append(tfs)
        dl_parts.append(dls)
        if has_pos_rows[i]:
            flat, _ = codec.decode_positions_flat(psb[i], tfs)
            pos_parts.append(flat)

    def cat(parts, dtype=np.int64):
        return (np.concatenate(parts).astype(dtype, copy=False)
                if parts else np.zeros(0, dtype))

    doc_id = cat(ids_parts)
    tf = cat(tf_parts)
    dl = cat(dl_parts)
    block_idx = np.repeat(np.arange(nb, dtype=np.int64), counts)

    post_valid = np.repeat(has_pos_rows, counts)
    per_post_counts = np.where(post_valid, tf, 0)
    offsets = np.concatenate(
        ([0], np.cumsum(per_post_counts))).astype(np.int32)
    pos_arr = pa.ListArray.from_arrays(
        pa.array(offsets),
        pa.array(cat(pos_parts)),
        mask=pa.array(~post_valid),
    )
    idx = pa.array(block_idx)
    ptbl = pa.table({
        "field": pc.take(field_a, idx),
        "term": pc.take(term_a, idx),
        "chunk": pa.array(chunk[block_idx]),
        "doc_id": pa.array(doc_id),
        "tf": pa.array(tf),
        "dl": pa.array(dl),
        "positions": pos_arr,
    })

    # ordering guard: doc_ids must ascend within each (field, term,
    # chunk) group for _encode_table; repair with a lexsort if the
    # non-overlapping-delta invariant ever breaks
    f_codes = pc.dictionary_encode(field_a).indices.to_numpy()
    t_codes = pc.dictionary_encode(term_a).indices.to_numpy()
    g_block = np.zeros(nb, dtype=np.int64)
    if nb > 1:
        g_block[1:] = np.cumsum(
            (f_codes[1:] != f_codes[:-1])
            | (t_codes[1:] != t_codes[:-1])
            | (chunk[1:] != chunk[:-1])
        )
    g_post = np.repeat(g_block, counts)
    if doc_id.size > 1 and bool(np.any(
            (doc_id[1:] < doc_id[:-1]) & (g_post[1:] == g_post[:-1]))):
        perm = np.lexsort((doc_id, g_post))
        ptbl = ptbl.take(pa.array(perm))
    return ptbl


def _encode_blocks(postings: DataFrame, chunk_span: int,
                   block_size: int) -> DataFrame:
    """postings (field, term, doc_id, tf, dl, positions[, ...]) ->
    encoded block rows, grouped on the bounded (field, term, chunk)
    key (structural hot-term salting).

    Second-generation kernel: repartition by the group key (a group
    never splits across partitions), sort within partitions, then
    stream one ``mapInArrow`` pass that encodes whole SLABS of groups
    per Arrow batch — a group that spans batches is carried forward
    until its last row arrives (carry is bounded by chunk_span, the
    structural-salting group-size bound). The prior groupBy +
    applyInPandas route paid ~240µs of fixed overhead PER GROUP: with
    a realistic web vocabulary (groups ≈ terms × chunks, millions at
    scale) that overhead measured 76% of encode wall-clock (A/B:
    836k postings / 24.6k Zipf terms / 70.3k groups — real 22.3s,
    null encode 16.9s, repartition+sort floor 0.98s)."""
    cols = ["field", "term", "chunk", "doc_id", "tf", "dl", "positions"]
    src = postings.withColumn(
        "chunk", (F.col("doc_id") / F.lit(chunk_span)).cast("long")
    )
    if "positions" not in src.columns:
        src = src.withColumn("positions", F.lit(None).cast("array<int>"))
    src = (
        src.select(*cols)
        .repartition("field", "term", "chunk")
        .sortWithinPartitions("field", "term", "chunk", "doc_id")
    )
    bs = int(block_size)

    def encode_iter(batches):
        carry: pa.Table | None = None
        for b in batches:
            tbl = pa.Table.from_batches([b])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
                carry = None
            if tbl.num_rows == 0:
                continue
            tbl = tbl.combine_chunks()
            split = _last_group_start(tbl)
            carry = tbl.slice(split)
            if split:
                out = _encode_table(tbl.slice(0, split), bs)
                if out.num_rows:
                    yield out
        if carry is not None and carry.num_rows:
            yield _encode_table(carry.combine_chunks(), bs)

    return src.mapInArrow(encode_iter, SEGMENT_SCHEMA)


def _gen_dir(root: str, gen: int) -> str:
    """Directory of segment generation ``gen``. Generation 1 is the
    plain ``segments`` dir (back-compatible); merges write ``gen+1``
    SIBLING dirs and atomically repoint _segments_meta.json, so the
    live generation is never renamed or deleted under a running query
    (the parquet snapshot-swap pattern an Iceberg catalog would give)."""
    return os.path.join(
        root, "segments" if gen <= 1 else f"segments_g{gen}"
    )


def seg_dir(root: str, meta: dict | None = None) -> str:
    """The CURRENT generation's segment directory."""
    meta = meta if meta is not None else segments_meta(root)
    return _gen_dir(root, int(meta.get("generation", 1)))


def _all_gen_dirs(root: str) -> dict[int, str]:
    """gen -> dir for every generation dir present under root."""
    out = {}
    try:
        names = os.listdir(root)
    except OSError:
        return out
    for n in names:
        p = os.path.join(root, n)
        if not os.path.isdir(p):
            continue
        if n == "segments":
            out[1] = p
        elif n.startswith("segments_g"):
            try:
                out[int(n[len("segments_g"):])] = p
            except ValueError:
                pass
    return out


def _write_meta(man_root: str, meta: dict) -> None:
    """Atomic meta (re)write: tmp + os.replace — the generation
    pointer swap must never be observable half-written."""
    path = os.path.join(man_root, "_segments_meta.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, path)


def missing_buckets(root: str, meta: dict) -> list[int]:
    """Buckets of the current layout with no committed manifest — the
    single source of truth for completeness, shared by the routing
    gate (segments_ready) and the kernel preamble (_segment_scan)."""
    man = os.path.join(root, "manifests")
    return [
        b for b in range(int(meta["n_buckets"]))
        if not os.path.exists(os.path.join(man, f"bucket_{b}.json"))
    ]


def _bucket_postings(index, b: int, n_buckets: int) -> DataFrame:
    """The postings scan for segment bucket ``b`` of ``n_buckets``.

    A disk index's postings are ALREADY directory-partitioned on
    bucket = pmod(xxhash64(term), P) (indexer._write_postings). When
    the segment bucket count S divides P, pmod(h, S) ==
    pmod(pmod(h, P), S), so segment bucket b is EXACTLY the physical
    partitions {b, b+S, ..., b+P-S} — and a filter on the physical
    partition column partition-PRUNES the scan to 1/S of the table.
    The old recomputed-column filter could not prune, so each of the S
    bucket jobs re-scanned the full postings table: S× read
    amplification on the biggest job in the system (VERDICT r03
    finding #1 — at 100 TB, 16 passes over the corpus postings
    instead of one)."""
    pb = index.buckets
    if (pb and "bucket" in index.postings.columns
            and pb % n_buckets == 0):
        stride = pb // n_buckets
        return index.postings.filter(
            F.col("bucket").isin(
                [b + k * n_buckets for k in range(stride)]
            )
        ).drop("bucket")
    # memory index (nothing to prune) or a non-divisor bucket count:
    # recompute the segment bucket as a column. drop() any physical
    # bucket first so withColumn can't silently shadow it.
    post = index.postings
    if "bucket" in post.columns:
        post = post.drop("bucket")
    return (
        post.withColumn(
            "__seg_bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets))
        )
        .filter(F.col("__seg_bucket") == b)
        .drop("__seg_bucket")
    )


def build_segments(
    index,
    path: str | None = None,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    chunk_span: int = DEFAULT_CHUNK_SPAN,
    block_size: int = codec.BLOCK_SIZE,
    resume: bool = True,
    lineage: dict | None = None,
    log=None,
    concurrency: int = 4,
    files_per_bucket: int | None = None,
) -> str:
    """Encode the index's postings into compressed segments, one
    committed job PER BUCKET (see module docstring). Returns the
    segments root path. Safe to interrupt and re-run with resume=True:
    finished buckets (manifest present) are skipped.

    ``concurrency`` bucket jobs run in flight at once (driver threads;
    Spark schedules concurrent jobs fine) — checkpoint granularity is
    unchanged because each bucket still writes its data before its own
    manifest, but the job-submission latency no longer serializes
    across n_buckets.

    ``files_per_bucket`` controls write parallelism WITHIN a bucket:
    blocks are range-partitioned on (field, term, chunk) and sorted
    within each file, so term seeks still prune via parquet min/max
    while the write fans out across the cluster. Defaults to
    2 * defaultParallelism / n_buckets (at least 2)."""
    root = path or index.path
    if not root:
        raise ValueError("segments need a disk path (index.path or path=)")
    _check_no_pending_append(index.path)
    if root != index.path:
        _check_no_pending_append(root)
    man_root = os.path.join(root, "manifests")
    meta_path = os.path.join(man_root, "_segments_meta.json")
    generation = 1
    if resume and os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                generation = int(json.load(f).get("generation", 1))
        except (OSError, ValueError):
            generation = 1
    seg_root = _gen_dir(root, generation)
    os.makedirs(seg_root, exist_ok=True)
    os.makedirs(man_root, exist_ok=True)

    nf = files_per_bucket or max(
        2, (index.spark.sparkContext.defaultParallelism * 2) // n_buckets
    )

    meta = {
        "format": SEGMENT_FORMAT,
        "n_buckets": n_buckets,
        "chunk_span": chunk_span,
        "block_size": block_size,
    }
    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        if {k: old.get(k) for k in meta} != meta:
            # skipping manifests written under different layout params
            # would silently mix pmod/chunk layouts in one segment set
            raise ValueError(
                "resume with different segment parameters: existing "
                f"{old} vs requested {meta}; pass resume=False to "
                "rebuild, or re-run with the original parameters"
            )
    elif resume:
        # meta file missing (or deleted) but bucket manifests may still
        # exist from an older build — each manifest embeds its layout
        # params, so validate those instead of skipping unchecked
        for fjson in sorted(os.listdir(man_root)):
            if not fjson.startswith("bucket_"):
                continue
            with open(os.path.join(man_root, fjson)) as f:
                man = json.load(f)
            if {k: man.get(k) for k in meta} != meta:
                raise ValueError(
                    f"resume: existing manifest {fjson} was written "
                    f"under different segment parameters "
                    f"({ {k: man.get(k) for k in meta} } vs requested "
                    f"{meta}) and no _segments_meta.json is present; "
                    "pass resume=False to rebuild, or re-run with the "
                    "original parameters"
                )
    if not resume:
        # fresh build: clear any previous layout — every generation
        # dir and stale bucket dirs (e.g. from a larger n_buckets)
        import shutil

        for g, d in _all_gen_dirs(root).items():
            if d != seg_root:
                shutil.rmtree(d, ignore_errors=True)
        for d in os.listdir(seg_root):
            shutil.rmtree(os.path.join(seg_root, d), ignore_errors=True)
        for fjson in os.listdir(man_root):
            if fjson.startswith("bucket_") or fjson.startswith("delta_"):
                os.remove(os.path.join(man_root, fjson))
    _write_meta(man_root, {**meta, "generation": generation})

    def run_bucket(b: int) -> None:
        man_path = os.path.join(man_root, f"bucket_{b}.json")
        if resume and os.path.exists(man_path):
            # Validate the manifest's own embedded layout params before
            # skipping: if _segments_meta.json was missing/deleted (e.g.
            # a pre-guard build) the top-level check above never ran,
            # and skipping unchecked could mix pmod/chunk layouts — the
            # exact hazard the guard exists for (ADVICE r01).
            with open(man_path) as f:
                man = json.load(f)
            if {k: man.get(k) for k in meta} != meta:
                raise ValueError(
                    f"bucket {b} manifest was written under different "
                    f"segment parameters: existing "
                    f"{ {k: man.get(k) for k in meta} } vs requested "
                    f"{meta}; pass resume=False to rebuild, or re-run "
                    "with the original parameters"
                )
            if log:
                log(f"bucket {b}: manifest present, skipping (resume)")
            return
        t0 = time.time()
        part = _bucket_postings(index, b, n_buckets)
        # persist the encoded blocks: repartitionByRange runs a
        # SAMPLING job to pick range bounds, which would otherwise
        # re-execute the whole encode a second time for the write
        # (measured ~1.4x on the full build). Blocks are compressed —
        # tiny next to the postings — so caching them is cheap.
        blocks = _encode_blocks(part, chunk_span, block_size).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        out_dir = os.path.join(seg_root, f"bucket={b}")
        try:
            (
                blocks.repartitionByRange(nf, "field", "term", "chunk")
                .sortWithinPartitions("field", "term", "chunk", "block_id")
                .write.mode("overwrite")
                .parquet(out_dir)
            )
        finally:
            blocks.unpersist()
        # metrics pass over what was written (cheap: local parquet);
        # explicit schema so an EMPTY bucket (no part files) still reads
        written = index.spark.read.schema(SEGMENT_SCHEMA).parquet(out_dir)
        row = written.agg(
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.countDistinct("term").alias("n_terms"),
            F.max("last_doc").alias("max_doc"),
        ).collect()[0]
        manifest = {
            "bucket": b,
            "n_blocks": row["n_blocks"],
            "n_postings": int(row["n_postings"] or 0),
            "n_terms": row["n_terms"],
            "max_doc": row["max_doc"],
            "elapsed_sec": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "lineage": lineage or {"source": index.path or "<memory>"},
            **meta,
        }
        # data first, manifest last: manifest presence == bucket committed
        with open(man_path, "w") as f:
            json.dump(manifest, f, indent=1)
        if log:
            log(
                f"bucket {b}: {row['n_blocks']} blocks, "
                f"{row['n_postings']} postings in {manifest['elapsed_sec']}s"
            )

    if concurrency > 1 and n_buckets > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(min(concurrency, n_buckets)) as pool:
            for fut in [pool.submit(run_bucket, b) for b in range(n_buckets)]:
                fut.result()  # surface the first failure
    else:
        for b in range(n_buckets):
            run_bucket(b)
    return seg_root


def append_segments(index, postings: DataFrame, root: str | None = None,
                    lineage: dict | None = None) -> str:
    """Encode a BATCH of new postings into delta segment files appended
    under the existing bucket layout — Lucene's writer-flushes-new-
    segments model. Existing segment files are untouched (their impact
    metadata is stats-independent, so changed corpus stats never
    invalidate them). One job over all buckets: the batch is small
    relative to the index, per-bucket commit granularity isn't worth
    n_buckets job submissions.

    Caller (Index.add_documents) runs this inside its _append_pending
    journal window, so a mid-append crash is refused at reopen."""
    root = root or index.path
    meta = segments_meta(root)
    if meta.get("format") != SEGMENT_FORMAT:
        raise ValueError(
            "segments were built by an older format "
            f"({meta.get('format')}); rebuild with "
            "build_segments(resume=False) before appending"
        )
    seg_root = seg_dir(root, meta)
    man_root = os.path.join(root, "manifests")
    blocks = _encode_blocks(
        postings, meta["chunk_span"], meta["block_size"]
    ).withColumn(
        "bucket", F.pmod(F.xxhash64("term"), F.lit(meta["n_buckets"]))
    )
    (
        blocks.repartition("bucket")
        .sortWithinPartitions("field", "term", "chunk", "block_id")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(seg_root)
    )
    n = len([f for f in os.listdir(man_root) if f.startswith("delta_")])
    man_path = os.path.join(man_root, f"delta_{n}.json")
    with open(man_path, "w") as f:
        json.dump(
            {
                "delta": n,
                "completed_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
                "lineage": lineage or {"source": root},
                **meta,
            },
            f,
            indent=1,
        )
    return seg_root


def merge_segments(index, root: str | None = None,
                   files_per_bucket: int | None = None) -> str:
    """Background-merge analogue: re-encode each (field, term, chunk)
    group's blocks (base + accumulated deltas) into full-size blocks,
    restoring optimal block-max pruning and file counts after a run of
    appends. Decodes FROM the segments themselves — the postings table
    is not re-read.

    The swap is a GENERATION-POINTER update, never a rename of the
    live directory: the merge writes generation N+1 as a sibling dir,
    atomically repoints _segments_meta.json (tmp + os.replace), keeps
    generation N on disk as a grace window for in-flight queries that
    already resolved its files, and deletes generations older than N.
    Crash anywhere: before the pointer swap, generation N stays fully
    servable (the partial N+1 dir is overwritten by the next merge);
    after it, N+1 is live and N is residue cleaned by the next merge.
    Readers never see a missing or half-renamed segments dir — the
    parquet equivalent of an Iceberg snapshot commit."""
    root = root or index.path
    # the append journal is always written at index.path; check BOTH
    # locations so merge_segments(index, root=<other dir>) can't merge
    # from delta segments left partial by an interrupted append
    # (ADVICE r03: fence inconsistency vs build_segments)
    _check_no_pending_append(index.path)
    if root != index.path:
        _check_no_pending_append(root)
    meta = segments_meta(root)
    if meta.get("format") != SEGMENT_FORMAT:
        raise ValueError(
            "segments were built by an older format; rebuild with "
            "build_segments(resume=False)"
        )
    cur_gen = int(meta.get("generation", 1))
    seg_root = _gen_dir(root, cur_gen)
    man_root = os.path.join(root, "manifests")
    block_size = meta["block_size"]
    spark = index.spark
    nf = files_per_bucket or max(
        2,
        (spark.sparkContext.defaultParallelism * 2) // meta["n_buckets"],
    )

    # decode every block of a group back to flat postings, then
    # re-encode full-size blocks — one streaming mapInArrow pass over
    # group-sorted slabs (same slab kernel + carry as _encode_blocks;
    # the former per-group applyInPandas route paid its ~240µs fixed
    # cost once per (field, term, chunk) — millions of groups at a web
    # vocabulary)
    src = (
        spark.read.schema(SEGMENT_SCHEMA + ", bucket int")
        .parquet(seg_root)
        .drop("bucket")
        .repartition("field", "term", "chunk")
        .sortWithinPartitions(
            "field", "term", "chunk", "first_doc", "block_id"
        )
    )

    def merge_iter(batches):
        carry: pa.Table | None = None
        for b in batches:
            tbl = pa.Table.from_batches([b])
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl])
                carry = None
            if tbl.num_rows == 0:
                continue
            tbl = tbl.combine_chunks()
            split = _last_group_start(tbl)
            carry = tbl.slice(split)
            if split:
                out = _encode_table(
                    _decode_blocks_table(tbl.slice(0, split)), block_size
                )
                if out.num_rows:
                    yield out
        if carry is not None and carry.num_rows:
            yield _encode_table(
                _decode_blocks_table(carry.combine_chunks()), block_size
            )

    merged = (
        src.mapInArrow(merge_iter, SEGMENT_SCHEMA)
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64("term"), F.lit(meta["n_buckets"])),
        )
    )
    new_gen = cur_gen + 1
    new_root = _gen_dir(root, new_gen)
    # persist before repartitionByRange: its sampling job would
    # otherwise run the whole decode+re-encode twice (same hazard as
    # the build writer)
    merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        (
            merged.repartitionByRange(
                nf * meta["n_buckets"], "bucket", "field", "term", "chunk"
            )
            .sortWithinPartitions(
                "bucket", "field", "term", "chunk", "block_id"
            )
            .write.mode("overwrite")  # clears a crashed merge's partial dir
            .partitionBy("bucket")
            .parquet(new_root)
        )
    finally:
        merged.unpersist()
    import shutil

    # COMMIT POINT: atomic generation-pointer swap
    _write_meta(man_root, {**meta, "generation": new_gen})
    # delta manifests are absorbed into the merged base (stale ones
    # after a crash here merely trigger one early re-merge — harmless)
    for fjson in os.listdir(man_root):
        if fjson.startswith("delta_"):
            os.remove(os.path.join(man_root, fjson))
    # keep cur_gen as the in-flight-reader grace window; drop older
    for g, d in _all_gen_dirs(root).items():
        if g < cur_gen:
            shutil.rmtree(d, ignore_errors=True)
    return new_root


def segments_meta(root: str) -> dict:
    with open(os.path.join(root, "manifests", "_segments_meta.json")) as f:
        return json.load(f)


_READY_CACHE: dict[str, tuple[tuple[float, float], bool]] = {}


def segments_ready(root: str) -> bool:
    """True iff the segments at ``root`` are SERVABLE: written by THIS
    engine's format AND complete (every bucket's manifest present — a
    build killed mid-flight leaves some buckets unencoded, and serving
    them would silently return wrong top-k, not an error). The
    auto-routing gate (search._wand_route): not-ready segments fall
    back to the correct DataFrame path; resume the build to get the
    kernels back. Cached per (meta mtime, manifests-dir mtime), so the
    common case costs two os.stats per query."""
    man_dir = os.path.join(root, "manifests")
    meta_path = os.path.join(man_dir, "_segments_meta.json")
    try:
        stamp = (os.path.getmtime(meta_path), os.path.getmtime(man_dir))
    except OSError:
        return False
    hit = _READY_CACHE.get(root)
    if hit is not None and hit[0] == stamp:
        return hit[1]
    try:
        meta = segments_meta(root)
        ok = (
            meta.get("format") == SEGMENT_FORMAT
            and os.path.isdir(seg_dir(root, meta))
            and not missing_buckets(root, meta)
        )
    except (OSError, ValueError, KeyError):
        ok = False
    _READY_CACHE[root] = (stamp, ok)
    return ok


def n_deltas(root: str) -> int:
    """Number of un-compacted delta appends recorded at ``root``."""
    man = os.path.join(root, "manifests")
    try:
        return sum(1 for f in os.listdir(man) if f.startswith("delta_"))
    except OSError:
        return 0


def maybe_merge(index, root: str | None = None, *,
                max_deltas: int = 8) -> bool:
    """Merge policy (Lucene's TieredMergePolicy analogue, simplified):
    compact base + deltas when ``max_deltas`` appends have accumulated
    — keeps the per-bucket file count and block fragmentation bounded
    under continuous ingest without paying a merge on every batch.
    Returns True if a merge ran."""
    root = root or index.path
    if root is None or not segments_ready(root):
        return False
    if n_deltas(root) < max_deltas:
        return False
    merge_segments(index, root)
    return True
