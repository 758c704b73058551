"""Simulate the driver's verify flow against /root/repo/__spark_entry__.py.

Set SPARK_GRAFT_SF_DIR to compare at a different scale factor
(default sf0.01, the driver's correctness scale; sf0.1 is the
once-per-round scale-insurance pass, ~30 min).
"""
import hashlib, os, sys, traceback
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as entrymod
from pyspark.sql import SparkSession

# Stock heap (1g) by default — DELIBERATE: the sim doubles as the
# small-executor OOM insurance (r8 caught a real Expand+ObjectHashAgg
# sort-fallback OOM this way). For the sf1 volume pass set
# SPARK_GRAFT_DRIVER_MEM=4g — a realistic production executor size;
# the exact-percentile baseline legitimately buffers ~2M values/group
# there (its registered scale path is the agg_approx_quantile sketch).
_builder = SparkSession.builder
if os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
    _builder = _builder.config(
        "spark.driver.memory", os.environ["SPARK_GRAFT_DRIVER_MEM"])
spark = (_builder.master(
             f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
         .appName("driver-sim")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

# 1. smoke: entry()
df = entrymod.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
assert len(rows) > 0

# 2. t2: queries vs oracle at sf0.01
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
# The canonical table list lives in catalog.TABLES (r9 review wave 5:
# it was hardcoded here AND in bench.py — a new fixture table would be
# silently missed in both).
from frinesis_spark.catalog import TABLES
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def canon(pdf):
    import math, decimal, datetime
    import pandas as pd, numpy as np
    def cv(v):
        if v is None or v is pd.NaT: return "N"
        # repr(float(v)), not repr(v): np.float64 subclasses float, and
        # numpy>=2 reprs it as 'np.float64(0.1)' — spurious mismatches
        # on every float-list column after an upgrade (r9 wave 5).
        if isinstance(v, float): return "N" if math.isnan(v) else repr(float(v))
        if isinstance(v, np.floating): return cv(float(v))
        if isinstance(v, (bool, np.bool_)): return "T" if v else "F"
        if isinstance(v, (int, np.integer)): return str(int(v))
        if isinstance(v, decimal.Decimal): return repr(float(v))
        if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)): return v.isoformat()
        if isinstance(v, (bytes, bytearray)): return bytes(v).hex()
        if isinstance(v, (list, tuple, np.ndarray)): return "["+",".join(cv(x) for x in v)+"]"
        return str(v)
    cols = sorted(pdf.columns)
    # itertuples, not per-cell iloc: the labeled-Series-per-cell form
    # did O(rows*cols) label lookups and dominated the sim's hashing
    # cost on 10k-row results (r9 wave 5).
    rows = sorted(
        tuple(cv(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    )
    h = hashlib.sha256(repr(rows).encode()).hexdigest()[:16]
    return h, len(pdf), tuple(cols)

qs, osql = entrymod.queries(), entrymod.oracle_sql()
print(f"queries: {len(qs)}, oracles: {len(osql)}")
only = set(sys.argv[1:])  # optional: verify just these query names
if only:
    missing = only - qs.keys()
    assert not missing, f"unknown query names: {missing}"
fails = []
for name in sorted(only or qs):
    try:
        spdf = qs[name](spark, SF).toPandas()
        if name in osql:
            dpdf = con.execute(osql[name]).fetchdf()
            sh, sn, scols = canon(spdf); dh, dn, dcols = canon(dpdf)
            # Column-NAME compare too: the real driver records
            # schema_match separately, and identical values under
            # different aliases must fail HERE, not burn a driver
            # round (r9 wave 5 — the #1 documented parity gotcha).
            ok = sh == dh and sn == dn and scols == dcols
            schema_note = "" if scols == dcols else f" SCHEMA spark={scols} duck={dcols}"
            print(f"{'OK ' if ok else 'MISMATCH'} {name}: spark {sn} rows [{sh}] duck {dn} rows [{dh}]{schema_note}")
            if not ok: fails.append(name)
        else:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows")
    except Exception as e:
        print(f"ERROR {name}: {e}")
        fails.append(name)
print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
