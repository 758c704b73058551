#!/usr/bin/env python
"""Compute normalized plan fingerprints for named queries against an
arbitrary source tree (r10 verdict item 1 — retroactive attribution).

The round-10 driver bench flagged 12 queries >=1.5x slower than round
9 with no artifact proving whether their plans had changed. This probe
closes that gap retroactively: run it once against HEAD and once
against a git worktree of the round-9 commit; identical fingerprints
mean identical compiled plans, so any timing delta between those
rounds was environmental.

    python tools/plan_fp_probe.py --tree /path/to/checkout \
        --queries a,b,c [--sf-dir /root/testdata/sf0.1]

Prints one JSON object {query: fingerprint} on stdout. The
normalization ALWAYS comes from the planfp module next to THIS script
(not the target tree, which may predate it), so both runs hash with
byte-identical rules.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
from pathlib import Path

HERE = Path(__file__).resolve().parent


def load_planfp():
    spec = importlib.util.spec_from_file_location(
        "planfp_pinned", HERE.parent / "frinesis_spark" / "planfp.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default=str(HERE.parent),
                    help="source tree whose frinesis_spark to probe")
    ap.add_argument("--queries", required=True,
                    help="comma-separated registry query names")
    ap.add_argument("--sf-dir",
                    default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf0.1"))
    args = ap.parse_args()

    planfp = load_planfp()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "8")
    sys.path.insert(0, str(Path(args.tree).resolve()))
    from frinesis_spark import registry
    from frinesis_spark.session import get_spark

    spark = get_spark("plan_fp_probe")
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.queries()

    out: dict[str, str] = {}
    for name in args.queries.split(","):
        name = name.strip()
        if not name:
            continue
        if name not in queries:
            out[name] = "<unknown>"
            continue
        try:
            out[name] = planfp.fingerprint(queries[name](spark, args.sf_dir))
        except Exception as exc:  # surface, never abort the sweep
            out[name] = f"<error: {type(exc).__name__}: {exc}>"[:120]
    print(json.dumps(out, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()
