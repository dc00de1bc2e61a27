"""Side-by-side verify named registry queries against their DuckDB oracles
at a given sf dir — a fast, targeted replica of the driver's CORRECTNESS
check for use while developing a new query (the full pytest differential
covers the whole registry).

    python scripts/verify_queries.py text_bm25_topk corpus_source_overlap \
        [--sf /root/testdata/sf0.01]

``--window`` (VERDICT r15 task 8, the registry-growth guard) expands the
name list to the driver's priority window PLUS every row whose dependency
files changed since the latest driver run or carry uncommitted edits
(freshness.changed_query_names(include_stale=False)) — the per-round sweep
at ~300 registry rows was the builder's wall-time bottleneck, and this is
the subset whose greenness is actually at risk. The all-rows-eventually
invariant is preserved by the full-registry pytest differential (every
session) and the window rotation (every row driver-green within 6 rounds).

    python scripts/verify_queries.py --window --sf /root/testdata/sf0.1
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import duckdb
from pyspark.sql import SparkSession

from seccosql_spark.registry import REGISTRY, session_for
from seccosql_spark.session import TESTDATA_TABLES


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument(
        "--window",
        action="store_true",
        help="sweep the driver priority window + every hot/dirty row "
        "(changed since the latest driver run or uncommitted) instead of "
        "an explicit name list",
    )
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--no-lint",
        action="store_true",
        help="skip the lint-on-build plan gate (on by default so a new row "
        "with an unallowlisted scale hazard fails HERE, not at pytest time)",
    )
    args = ap.parse_args()
    if not args.no_lint:
        import os

        os.environ.setdefault("SECCO_LINT_ON_BUILD", "1")
    if args.window:
        import importlib.util
        import os as _os

        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        spec = importlib.util.spec_from_file_location(
            "freshness", _os.path.join(repo, "scripts", "freshness.py")
        )
        fr = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(fr)
        from seccosql_spark.registry import _PRIORITY_WINDOW

        extra = fr.changed_query_names(include_stale=False)
        # window order first (the driver's verification order), then the
        # hot/dirty tail alphabetically; explicit names are honored too
        args.names = list(
            dict.fromkeys(
                [*args.names, *_PRIORITY_WINDOW,
                 *sorted(extra - set(_PRIORITY_WINDOW))]
            )
        )
        print(
            f"# --window: {len(args.names)} rows "
            f"({len(_PRIORITY_WINDOW)} window + "
            f"{len(args.names) - len(_PRIORITY_WINDOW)} hot/dirty/explicit)",
            flush=True,
        )
    elif not args.names:
        ap.error("provide query names or --window")

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("verify")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    sess = session_for(spark, args.sf)
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    sys.path.insert(0, "tests")
    from conftest import _canon  # reuse the driver-equivalent canonicalizer

    # validate names up front: a typo'd name mid-list must not kill a sweep
    # hours in (REGISTRY[name] raised BEFORE the per-query try)
    unknown = [n for n in args.names if n not in REGISTRY]
    if unknown:
        print(f"unknown query names: {unknown}", file=sys.stderr)
        return 2

    failed = []
    for name in args.names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            out = spec.build(sess)
            df = out.df if hasattr(out, "df") else out
            spdf = df.toPandas()
            ddf = con.sql(spec.oracle).df()
        except Exception as exc:
            # one crashing query (OOM, ANSI error) must not kill the sweep —
            # the r10 sf0.1 sweep died twice mid-list before this guard.
            # (A JVM-fatal OOM still ends the run; restart past the row.)
            failed.append(name)
            print(
                f"FAIL {name} rows=? {time.time() - t0:.1f}s "
                f"EXC {type(exc).__name__}: {str(exc)[:160]}",
                flush=True,
            )
            continue
        cols_s, cols_d = sorted(spdf.columns), sorted(ddf.columns)
        status = []
        if cols_s != cols_d:
            status.append(f"COLS {cols_s} vs {cols_d}")
        else:
            # driver-faithful canonicalization: the driver sorts with pandas
            # sort_values, which RAISES on list/dict cells — an array-typed
            # output column must fail here, not two rounds later in a red
            # CORRECTNESS row (r08's inverted_index_postings; the old
            # repr-keyed sort silently tolerated it)
            spdf[cols_s].sort_values(by=cols_s)
            ddf[cols_s].sort_values(by=cols_s)
            s_rows = sorted(
                [tuple(_canon(v) for v in r) for r in spdf[cols_s].itertuples(index=False)],
                key=repr,
            )
            d_rows = sorted(
                [tuple(_canon(v) for v in r) for r in ddf[cols_s].itertuples(index=False)],
                key=repr,
            )
            if len(s_rows) != len(d_rows):
                status.append(f"ROWS {len(s_rows)} vs {len(d_rows)}")
            else:
                bad = [
                    (a, b) for a, b in zip(s_rows, d_rows) if repr(a) != repr(b)
                ]
                if bad:
                    status.append(f"VALUES {len(bad)} mismatches; first: {bad[:2]}")
        ok = not status
        if not ok:
            failed.append(name)
        print(
            f"{'PASS' if ok else 'FAIL'} {name} rows={len(spdf)} "
            f"{time.time() - t0:.1f}s {'; '.join(status)}",
            flush=True,
        )
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
