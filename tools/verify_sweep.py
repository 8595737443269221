"""Driver-contract sweep: vanilla session -> entry/queries/oracle_sql,
each oracle-backed query compared against DuckDB at sf0.01 with the
driver's sorted-columns value hash. Prints per-query lines and a final
``BAD: [...]`` summary line. Mirrors .claude/skills/verify/SKILL.md."""
import hashlib
import sys
import time
import traceback

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")

spark = SparkSession.builder.master("local[8]").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e  # noqa: E402

assert e.entry(spark).count() >= 0
qs, os_ = e.queries(), e.oracle_sql()
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")


def vhash(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    return hashlib.md5("\n".join(sorted(map(str, df.itertuples(
        index=False, name=None)))).encode()).hexdigest()


bad = []
only = sys.argv[1:]
for name, fn in sorted(qs.items()):
    if only and name not in only:
        continue
    t0 = time.time()
    try:
        g = fn(spark, sf).toPandas()
        if name in os_:
            w = con.execute(os_[name]).df()
            ok = len(g) == len(w) and vhash(g) == vhash(w)
            print(name, "MATCH" if ok else "MISMATCH", len(g),
                  f"{time.time()-t0:.1f}s", flush=True)
            if not ok:
                bad.append(name)
        else:
            print(name, "rows-only", len(g), f"{time.time()-t0:.1f}s",
                  flush=True)
    except Exception as ex:  # noqa: BLE001
        traceback.print_exc()
        print(name, "ERROR", repr(ex), flush=True)
        bad.append(name)
print("BAD:", bad, flush=True)
