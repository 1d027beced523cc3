"""Per-action timing of the index build at a given parallelism.
Usage: python tools/profile_build.py <cpus> [cycles]"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1])
cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 64

from bench import build_session, cycled_docs  # noqa: E402
from lucene_clj_spark import create_index  # noqa: E402

spark = build_session(cpus)
spark.sparkContext.setLogLevel("ERROR")
docs, n = cycled_docs(spark, "/root/testdata/sf0.1", cycles)

res = {"cpus": cpus, "n_docs": n}
best = None
for attempt in range(3):
    spark.catalog.clearCache()
    docs.count()  # re-pin the input cache clearCache just evicted
    t = {}
    t0 = time.time()
    idx = create_index(
        spark, docs,
        {"text": "text", "lang": "keyword", "source": "keyword",
         "n_chars": "long"},
        id_column="doc_id",
    )
    t["create_index_call"] = time.time() - t0  # includes stats collect job
    t1 = time.time()
    idx.terms.count()
    t["terms_count"] = time.time() - t1
    t2 = time.time()
    idx.postings.count()
    t["postings_count"] = time.time() - t2
    t3 = time.time()
    idx.docs.count()
    t["docs_count"] = time.time() - t3
    t["total"] = time.time() - t0
    if best is None or t["total"] < best["total"]:
        best = t
res.update({k: round(v, 3) for k, v in best.items()})
print("PROFILE " + json.dumps(res))
spark.stop()
