"""Driver-contract sweep: vanilla session -> entry/queries/oracle_sql,
each oracle-backed query compared against DuckDB with the driver's
sorted-columns value hash. Prints per-query lines and a final
``BAD: [...]`` summary line. Mirrors .claude/skills/verify/SKILL.md.

Usage::

    python tools/verify_sweep.py                 # sf0.01 (the driver's t2)
    python tools/verify_sweep.py --sf 0.001      # fast pre-commit tier
    python tools/verify_sweep.py --sf both       # 0.001 then 0.01 — catches
                                                 # SF-dependent bugs (empty
                                                 # partitions, degenerate
                                                 # samples) before the driver
    python tools/verify_sweep.py q_foo q_bar     # only named queries
"""
import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

args = sys.argv[1:]
sfs = ["0.01"]
if "--sf" in args:
    i = args.index("--sf")
    if i + 1 >= len(args):
        sys.exit("--sf needs a value: 0.001, 0.01, 0.1 or both")
    val = args[i + 1]
    if val not in ("both", "0.001", "0.01", "0.1"):
        sys.exit(f"unknown --sf {val!r}: use 0.001, 0.01, 0.1 or both")
    del args[i : i + 2]
    sfs = ["0.001", "0.01"] if val == "both" else [val]
# --master / --shuffle-partitions: determinism probes. Every query's
# result must be INVARIANT to parallelism and partition count — a
# mismatch that appears only under an odd configuration is a real
# nondeterminism bug (order-dependent float folds, limit-without-sort,
# partition-dependent sampling) the default-config sweep can't see.
def _operand(flag: str) -> str:
    i = args.index(flag)
    if i + 1 >= len(args):
        sys.exit(f"{flag} needs a value")
    val = args[i + 1]
    del args[i : i + 2]
    return val


master = "local[8]"
if "--master" in args:
    master = _operand("--master")
shuffle = None
if "--shuffle-partitions" in args:
    shuffle = _operand("--shuffle-partitions")
confs = []
while "--conf" in args:  # repeatable: --conf spark.sql.adaptive.enabled=false
    kv = _operand("--conf")
    k, eq, v = kv.partition("=")
    if not eq or not k or not v:
        sys.exit(f"--conf needs key=value, got {kv!r}")
    confs.append((k, v))
only = args

builder = SparkSession.builder.master(master)
if shuffle is not None:
    builder = builder.config("spark.sql.shuffle.partitions", shuffle)
for k, v in confs:
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402

assert e.entry(spark).count() >= 0
qs, os_ = e.queries(), e.oracle_sql()


def vhash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return hashlib.md5("\n".join(sorted(map(str, df.itertuples(
        index=False, name=None)))).encode()).hexdigest()


bad = []
for sf_tag in sfs:
    sf = f"/root/testdata/sf{sf_tag}"
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            g = fn(spark, sf).toPandas()
            if name in os_:
                w = con.execute(os_[name]).df()
                ok = len(g) == len(w) and vhash(g) == vhash(w)
                print(f"sf{sf_tag}", name, "MATCH" if ok else "MISMATCH",
                      len(g), f"{time.time()-t0:.1f}s", flush=True)
                if not ok:
                    bad.append(f"sf{sf_tag}:{name}")
            else:
                print(f"sf{sf_tag}", name, "rows-only", len(g),
                      f"{time.time()-t0:.1f}s", flush=True)
        except Exception as ex:  # noqa: BLE001
            traceback.print_exc()
            print(f"sf{sf_tag}", name, "ERROR", repr(ex), flush=True)
            bad.append(f"sf{sf_tag}:{name}")
    con.close()
print("BAD:", bad, flush=True)
