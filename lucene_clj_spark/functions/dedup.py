"""Deduplication operators — exact and near-duplicate detection for
web-scale corpus preparation.

Scale design notes (the 100 TB story, tested at sf0.1):

- ``exact_dedup``: hash-groupBy on the content hash, not the content —
  the shuffle moves 8-byte keys + doc_ids, never document bodies.
- ``ngram_jaccard_pairs``: shingle -> explode -> self-join on shingle.
  The candidate join is the classic "pairs sharing >=1 shingle" —
  quadratic only within a shingle's posting list, so ultra-common
  shingles are capped (``max_shingle_df``) exactly like hot terms are
  skipped in MinHash implementations (boilerplate shingles carry no
  dedup signal but create O(df^2) pairs).
- ``minhash_signatures`` + ``lsh_pairs``: k permutation-min hashes via
  ``(a_i*h + b_i) mod p``; banding turns the all-pairs problem into an
  equality join on (band, band_hash) — linear shuffle, no crossJoin.
- ``simhash``: 32-bit sign-aggregated fingerprint; near-dup = small
  Hamming distance; bucket on bit-blocks for sub-quadratic candidate
  generation.

All arithmetic is portable to DuckDB SQL for oracle checking (see
functions/text.py portable_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_clj_spark.analysis import Analyzer, STANDARD
from lucene_clj_spark.functions.text import portable_hash, tokens_col

MERSENNE_P = 2147483647  # 2^31 - 1

# fixed, documented permutation parameters (odd a, arbitrary b < p).
# The first 8 are the classic LCG multiplier/increment pairs the
# round-2 signatures shipped with — they must NEVER change or reorder
# (signatures and their DuckDB twins are derived from the prefix).
# Entries 9-16 (added round 5 for higher-recall k=16/bands=8 LSH:
# rows-per-band stays 2, band count doubles) are from the published
# Numerical Recipes "quick and dirty" LCG table; multipliers stay
# small enough that a * portable_hash never overflows int64.
MINHASH_PARAMS = [
    (1_103_515_245, 12_345),
    (69_069, 362_437),
    (214_013, 2_531_011),
    (134_775_813, 1),
    (22_695_477, 7_777),
    (1_664_525, 1_013_904_223),
    (48_271, 399_268_537),
    (16_807, 49_297),
    (8_121, 28_411),
    (4_561, 51_349),
    (7_141, 54_773),
    (9_301, 49_297),
    (741, 66_037),
    (1_277, 24_749),
    (2_661, 36_979),
    (1_021, 25_673),
]


def content_key(text, strict: bool = False):
    """Grouping key for exact dedup: md5 (128-bit) of the content.

    The shuffle moves 16-byte digests + doc_ids, never document bodies —
    at 10^12 docs the collision expectation is ~(2^40)^2/2^129 = 2^-49,
    i.e. the hash IS the identity for dedup purposes.  strict=True
    appends the byte length as a second discriminator (a near-free
    belt-and-braces check; any md5 collision would also have to be
    length-preserving).
    """
    key = F.md5(text)
    if strict:
        key = F.concat_ws(":", key, F.octet_length(text).cast("string"))
    return key


def exact_dedup_groups(
    docs: DataFrame, text_col: str = "text", strict: bool = False
) -> DataFrame:
    """(keep_id, n_copies) per distinct content: keep the smallest
    doc_id. Exact dedup = hash-groupBy; only 16-byte digests shuffle
    (map-side partial min/count, then an exchange on the digest — the
    text column is pruned before the shuffle; pinned by a plan-shape
    test)."""
    return (
        docs.select(
            content_key(F.col(text_col), strict).alias("__h"), "doc_id"
        )
        .groupBy("__h")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


def exact_duplicates(
    docs: DataFrame, text_col: str = "text", strict: bool = False
) -> DataFrame:
    """doc_ids that would be DROPPED by exact dedup (non-minimal ids of
    each duplicate-content group).  Window partitions on the content
    digest, so again only (digest, doc_id) pairs shuffle."""
    w = Window.partitionBy("__h")
    return (
        docs.select(
            content_key(F.col(text_col), strict).alias("__h"), "doc_id"
        )
        .withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") != F.col("__keep"))
        .select("doc_id", F.col("__keep").alias("duplicate_of"))
    )


def shingle_col(toks, n: int):
    """Word n-gram shingles (distinct) from a token array column."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        )
    )


def doc_shingles(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """(doc_id, shingle, n_shingles) — exploded distinct word n-grams."""
    from lucene_clj_spark._udfs import shingle_udf

    # explode_OUTER + a post-filter on the generator OUTPUT, not a
    # plain explode: Catalyst's InferFiltersFromGenerate synthesizes
    # `size(child) > 0` under a plain explode and pushes it below the
    # projection, making the (dominant-cost) shingle UDF evaluate
    # TWICE per row; nothing is inferable from explode_outer, and a
    # filter on the output column cannot sink below the generate —
    # one UDF eval per row, plan-pinned by
    # test_ngram_contamination_plan_broadcasts_probes. Empty-shingle
    # docs cost one NULL row each before the filter.
    with_sh = docs.select(
        "doc_id", shingle_udf(analyzer, n)(F.col(text_col)).alias("__sh")
    )
    return with_sh.select(
        "doc_id",
        F.size("__sh").alias("n_shingles"),
        F.explode_outer("__sh").alias("shingle"),
    ).filter(F.col("shingle").isNotNull())


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int = 100,
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity.

    Candidate pairs = docs sharing >=1 shingle (shingles with document
    frequency > max_shingle_df are dropped as boilerplate — see module
    docstring); exact Jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct
    shingle sets. Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = doc_shingles(docs, text_col, n, analyzer)
    sh_df = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    sh = sh.join(
        sh_df.filter(F.col("__df") <= max_shingle_df).select("shingle"),
        "shingle",
    )
    a = sh.select(
        F.col("doc_id").alias("doc_a"),
        F.col("n_shingles").alias("na"),
        "shingle",
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"),
        F.col("n_shingles").alias("nb"),
        "shingle",
    )
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("na") + F.col("nb") - F.col("inter")
    ).cast("double")
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 5,
    k: int = 8,
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """(doc_id, mh_0..mh_{k-1}): permutation-min hashes over shingle
    hashes — ``min((a_i*h + b_i) mod p)`` with fixed (a_i, b_i) and
    p = 2^31-1. Pr[mh_i(A)=mh_i(B)] = Jaccard(A,B)."""
    assert k <= len(MINHASH_PARAMS)
    sh = doc_shingles(docs, text_col, n, analyzer)
    h = portable_hash(F.col("shingle"))
    aggs = []
    for i, (a_i, b_i) in enumerate(MINHASH_PARAMS[:k]):
        perm = F.pmod(h * F.lit(a_i) + F.lit(b_i), F.lit(MERSENNE_P))
        aggs.append(F.min(perm).alias(f"mh_{i}"))
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_pairs(
    signatures: DataFrame,
    k: int = 8,
    bands: int = 4,
) -> DataFrame:
    """Banded-LSH candidate pairs from minhash signatures: docs agreeing
    on ALL rows of at least one band. Equality join on (band_id,
    band_key) — no crossJoin anywhere. Returns (doc_a, doc_b)."""
    rows_per_band = k // bands
    parts = []
    for bi in range(bands):
        cols = [F.col(f"mh_{bi * rows_per_band + r}") for r in range(rows_per_band)]
        key = F.concat_ws("_", *[c.cast("string") for c in cols])
        parts.append(
            signatures.select(
                "doc_id", F.lit(bi).alias("band"), key.alias("band_key")
            )
        )
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    a = buckets.select(F.col("doc_id").alias("doc_a"), "band", "band_key")
    b = buckets.select(F.col("doc_id").alias("doc_b"), "band", "band_key")
    return (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash(
    docs: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """(doc_id, simhash): tf-weighted sign aggregation of token-hash
    bits. Documents with small Hamming distance between simhashes are
    near-duplicates. 32 bits from the portable hash."""
    toks = tokens_col(F.col(text_col), analyzer)
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("__h", portable_hash(F.col("term")))
    )
    bit_sums = []
    for b in range(bits):
        bit = F.floor(F.col("__h") / F.lit(2**b)) % 2
        contrib = F.when(bit == 1, F.col("tf")).otherwise(-F.col("tf"))
        bit_sums.append(
            F.sum(contrib).alias(f"__s{b}")
        )
    agg = tf.groupBy("doc_id").agg(*bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"__s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return agg.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_near_pairs(
    sim: DataFrame, max_hamming: int = 3, block_bits: int = 8
) -> DataFrame:
    """Candidate near-dup pairs by simhash: bucket on each of the
    32/block_bits bit-blocks (pigeonhole: pairs within max_hamming <
    n_blocks agree on >=1 full block), verify exact Hamming distance.
    Returns (doc_a, doc_b, hamming)."""
    n_blocks = 32 // block_bits
    parts = []
    for blk in range(n_blocks):
        key = F.floor(F.col("simhash") / F.lit(2 ** (blk * block_bits))) % F.lit(
            2**block_bits
        )
        parts.append(
            sim.select(
                "doc_id", F.col("simhash"), F.lit(blk).alias("blk"),
                key.alias("key"),
            )
        )
    buckets = parts[0]
    for p in parts[1:]:
        buckets = buckets.unionByName(p)
    a = buckets.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"),
        "blk", "key",
    )
    b = buckets.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"),
        "blk", "key",
    )
    cand = (
        a.join(b, ["blk", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sa", "sb")
        .distinct()
    )
    ham = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# --- duplicate clusters: pairs -> components -> keep-list --------------


def duplicate_components(
    pairs: DataFrame,
    *,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Connected components over a near-duplicate PAIR graph —
    ``(doc_id, component)`` where component = the smallest doc_id
    reachable through pairs. Only documents appearing in at least one
    pair get a row (an isolated doc is trivially its own component).

    Algorithm: min-label propagation — every node starts labeled with
    itself; each round every node takes the min of its own and its
    neighbors' labels; stop when a round changes nothing. Rounds =
    graph diameter, and near-duplicate clusters are near-cliques
    (every member shares most shingles/bands with every other), so
    real corpora converge in 2-3 rounds; ``max_iterations`` fences the
    pathological long-chain case (raises rather than returning a
    half-merged labeling). Per round: one join of the edge list
    against the label table + a min-aggregate — all shuffles are
    edge-sized, never corpus-sized, so the loop costs
    O(diameter x |pairs|) at any scale.
    """
    from lucene_clj_spark.errors import ValidationError

    edges = (
        pairs.select(F.col(doc_a).alias("src"),
                     F.col(doc_b).alias("dst"))
        .unionByName(
            pairs.select(F.col(doc_b).alias("src"),
                         F.col(doc_a).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .persist()
    )
    try:
        for _ in range(max_iterations):
            nbr_min = (
                edges.join(
                    labels.select(
                        F.col("doc_id").alias("dst"),
                        F.col("component").alias("__nc"),
                    ),
                    "dst",
                )
                .groupBy("src")
                .agg(F.min("__nc").alias("__mn"))
                .select(F.col("src").alias("doc_id"), "__mn")
            )
            # localCheckpoint, not persist: each round's plan nests
            # the previous round's — without truncating the lineage an
            # n-round run builds an O(2^n)-node plan tree (a 30-hop
            # chain stack-overflowed Catalyst's tree printer). The
            # checkpoint materializes the round AND cuts the plan back
            # to a leaf.
            new_labels = (
                labels.join(nbr_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("__mn"), F.col("component")),
                    ).alias("component"),
                )
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.join(
                    labels.select(
                        "doc_id", F.col("component").alias("__old")
                    ),
                    "doc_id",
                )
                .filter(F.col("component") != F.col("__old"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if not changed:
                return labels.select("doc_id", "component")
        raise ValidationError(
            f"duplicate_components did not converge in "
            f"{max_iterations} rounds — the pair graph contains a "
            "chain longer than the fence (raise max_iterations, or "
            "inspect the pair generator: near-dup clusters should be "
            "near-cliques)",
            {"max_iterations": max_iterations},
        )
    finally:
        edges.unpersist()


def resolve_duplicates(
    pairs: DataFrame,
    *,
    doc_a: str = "doc_a",
    doc_b: str = "doc_b",
    max_iterations: int = 50,
) -> DataFrame:
    """The keep/drop decision derived from the components: for every
    NON-canonical member (doc_id != its component's min id), one row
    ``(doc_id, duplicate_of)``. Anti-joining this against the corpus
    IS the dedup: canonical members and isolated docs survive."""
    comp = duplicate_components(
        pairs, doc_a=doc_a, doc_b=doc_b, max_iterations=max_iterations
    )
    return comp.filter(F.col("doc_id") != F.col("component")).select(
        "doc_id", F.col("component").alias("duplicate_of")
    )


def ngram_contamination(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    probe_text_col: str | None = None,
    n: int = 13,
    analyzer: Analyzer = STANDARD,
) -> DataFrame:
    """Training-data decontamination: flag corpus documents sharing
    ANY word n-gram with a benchmark probe set — the published
    exact-overlap rule (GPT-3's 13-gram filter; PaLM and successors
    use the same shape). Returns one row per corpus document:
    (doc_id, n_shingles, n_contaminated, contaminated), where
    n_contaminated counts the doc's DISTINCT n-grams that appear
    anywhere in the probe set and ``contaminated`` is n_contaminated
    > 0. Documents shorter than n tokens have 0 shingles and are
    never contaminated.

    Scale shape: the probe side is benchmark-sized (10^3-10^5
    examples, NOT the corpus), so its distinct shingle set BROADCASTS
    to the corpus-side shingle scan — the corpus never shuffles; the
    per-doc hit count is a map-side-combined aggregate, and the final
    assembly joins only (doc_id, counts) rows."""
    from pyspark.sql.functions import broadcast

    p_col = probe_text_col or text_col
    probe_sh = (
        doc_shingles(
            probes.select(
                F.lit(0).alias("doc_id"), F.col(p_col).alias("__pt")
            ),
            "__pt", n, analyzer,
        )
        .select("shingle")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE corpus-side shingle pass: the broadcast LEFT join marks
    # probe-set membership per shingle row and a single aggregate
    # yields both the shingle count and the hit count (count of a
    # nullable column counts non-nulls) — the tokenize+shingle UDF,
    # the dominant cost, runs over each document exactly once
    doc_sh = doc_shingles(docs, text_col, n, analyzer)
    per_doc = (
        doc_sh.join(broadcast(probe_sh), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.count("__hit").alias("__n_hit"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_shingles"), F.lit(0))
            .cast("long").alias("n_shingles"),
            F.coalesce(F.col("__n_hit"), F.lit(0))
            .cast("long").alias("n_contaminated"),
            (F.coalesce(F.col("__n_hit"), F.lit(0)) > 0)
            .alias("contaminated"),
        )
    )
