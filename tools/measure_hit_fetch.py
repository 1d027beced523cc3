"""Reproduce the stored-field-fetch decode-work comparison
(BENCH/BASELINE.md "stored-field retrieval is a doc_id seek").

Builds a docs table (sf dir's documents cycled), writes it in the
pre-r04 unsorted layout AND the r04 doc_id-sorted layout, then runs
the three fetch shapes and reports each one's FileScan decode work
(SQL metric "number of output rows" on the docs scan):

  A) old: broadcast(top-k) join docs           — full-table decode
  B) IN pushdown over the UNSORTED layout      — no row-group prune
  C) IN pushdown over the SORTED layout (r04)  — k row groups

Usage: python tools/measure_hit_fetch.py [cycles] [cpus]
(defaults: 10 cycles of sf0.1 = 50k docs, local[8])
"""
import json
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, functions as F  # noqa: E402

cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 10
cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
UI_PORT = 4049
API = f"http://localhost:{UI_PORT}/api/v1/applications"

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", str(UI_PORT))
    .config("spark.driver.memory", "8g")
    .appName("hit-fetch-decode-work")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
n0 = base.count()
parts = [base]
for i in range(1, cycles):
    parts.append(base.withColumn("doc_id", F.col("doc_id") + F.lit(i * n0)))
docs_src = parts[0]
for p in parts[1:]:
    docs_src = docs_src.unionByName(p)
n = n0 * cycles

tmp = tempfile.mkdtemp(prefix="hit_fetch_")
UNSORTED, SORTED = f"{tmp}/unsorted", f"{tmp}/sorted"
# pre-r04 layout: whatever partitioning the build produced (ids
# scattered across files -> every row group's min/max spans the space)
docs_src.repartition(cpus).write.mode("overwrite").parquet(UNSORTED)
# r04 Index.write layout
(docs_src.repartitionByRange(cpus, "doc_id")
 .sortWithinPartitions("doc_id").write.mode("overwrite").parquet(SORTED))

ids = [int(i * (n / 10) + 3) for i in range(10)]
top = spark.createDataFrame([(i, 1.0) for i in ids],
                            "doc_id long, score double")
top = top.cache()
top.count()


def scan_decode_rows():
    """Decode rows of the LAST completed SQL query's parquet scan."""
    app_id = json.load(urllib.request.urlopen(API))[0]["id"]
    sqls = json.load(urllib.request.urlopen(
        f"{API}/{app_id}/sql?details=true&planDescription=false&length=200"))
    out = None
    for q in sqls:
        for node in q.get("nodes", []):
            if node["nodeName"].startswith("Scan parquet"):
                m = {x["name"]: x["value"] for x in node.get("metrics", [])}
                if "number of output rows" in m:
                    out = m["number of output rows"]
    return out


def measure(name, df):
    t0 = time.time()
    rows = df.collect()
    wall = time.time() - t0
    time.sleep(2)
    print(f"{name}: hit_rows={len(rows)} wall={wall:.2f}s "
          f"scan_decode_rows={scan_decode_rows()}")


docs_u = spark.read.parquet(UNSORTED)
docs_s = spark.read.parquet(SORTED)
cols = docs_u.columns

print(f"corpus: {n:,} docs, fetch k=10")
measure("A old broadcast-scan      ",
        F.broadcast(top).join(docs_u.select(*cols), "doc_id"))
measure("B IN pushdown, unsorted   ",
        F.broadcast(top).join(
            docs_u.select(*cols).filter(F.col("doc_id").isin(ids)),
            "doc_id"))
measure("C IN pushdown, sorted(r04)",
        F.broadcast(top).join(
            docs_s.select(*cols).filter(F.col("doc_id").isin(ids)),
            "doc_id"))
spark.stop()

# Note: at toy scale (few files, one row group per file, hits in
# every file) C shows no decode reduction — the prune needs
# corpus >> k * row_group_rows. The BENCH/BASELINE.md capture at
# 1.6M docs / 96 row groups decodes 189,810 rows vs A's 1,600,000.
