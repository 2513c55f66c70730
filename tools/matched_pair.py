"""Matched-pair benchmark: run each headline query through DuckDB
(oracle SQL) AND Spark (queries() entry) back-to-back in ONE session,
so host-load swings hit both sides of every ratio equally.

Why this exists: the single-sided methodology (bench.py one day,
duck_bench.py another) produced a recorded ratio that swung
1.11x -> 1.44x across rounds on mostly-unchanged code purely from
noisy-neighbor load (round-8 verdict, "What's wrong" #3).  Pairing the
runs makes the ratio load-invariant: whatever the host is doing during
query q, it is doing it to BOTH engines.

Per query: duck cold, spark cold, duck warm, spark warm — the warm
pair is the headline (same two-run methodology as bench.py and
BASELINE.md; cold includes one-time codegen JIT for Spark and nothing
comparable for DuckDB, so only the warm pair is a fair ratio).

Prints ONE JSON line and writes MATCHED_PAIR.json with per-query
detail: {"spark_total": s, "duck_total": s, "ratio": r,
"queries": {name: {"duck": s, "spark": s, "ratio": r}}, ...}.

Usage: python tools/matched_pair.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402
from bench import HEADLINE  # noqa: E402
from etl_excel_to_hyper_tableau_spark import get_spark  # noqa: E402


def _load_avg() -> float:
    try:
        return round(os.getloadavg()[0], 2)
    except OSError:  # pragma: no cover - non-POSIX
        return -1.0


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    oracles = entry.oracle_sql()
    names = args or [q for q in HEADLINE if q in oracles]
    # literal-bearing oracles (embedding_whiten) build their literals
    # for the sf the oracle will RUN on
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    load_start = _load_avg()
    spark = get_spark(app_name="matched_pair")
    qs = entry.queries()
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # same warmup as bench.py: JVM/codegen startup + parquet footers
    spark.range(1000).selectExpr("sum(id)").collect()
    for t in entry.TABLES:
        try:
            entry._t(spark, sf_dir, t).count()
        except Exception:
            pass

    detail: dict[str, dict] = {}
    for name in names:
        sql, fn = oracles[name], qs[name]
        pair: dict[str, float] = {}
        for run in ("cold", "warm"):
            t0 = time.perf_counter()
            dn = len(con.execute(sql).fetchdf())
            pair[f"duck_{run}"] = round(time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            sn = len(fn(spark, sf_dir).toPandas())
            pair[f"spark_{run}"] = round(time.perf_counter() - t0, 3)
        ratio = (round(pair["spark_warm"] / pair["duck_warm"], 3)
                 if pair["duck_warm"] > 0 else None)
        detail[name] = {"duck": pair["duck_warm"],
                        "spark": pair["spark_warm"],
                        "duck_cold": pair["duck_cold"],
                        "spark_cold": pair["spark_cold"],
                        "ratio": ratio,
                        "rows": sn}
        if dn != sn:  # parity is the driver's job; still flag loudly
            detail[name]["row_mismatch"] = [dn, sn]
        print(f"# {name}: duck {pair['duck_warm']:.3f}s "
              f"spark {pair['spark_warm']:.3f}s ratio {ratio}",
              file=sys.stderr)

    spark_total = round(sum(d["spark"] for d in detail.values()), 3)
    duck_total = round(sum(d["duck"] for d in detail.values()), 3)
    summary = {
        "metric": "matched_pair_wall_seconds",
        "spark_total": spark_total,
        "duck_total": duck_total,
        "ratio": round(spark_total / duck_total, 3) if duck_total else None,
        "n_queries": len(detail),
        "sf_dir": sf_dir,
        "load_avg_start": load_start,
        "load_avg_end": _load_avg(),
        "detail": "MATCHED_PAIR.json",
    }
    out = dict(summary)
    out["queries"] = detail
    # a subset run (explicit query names) must not clobber the full
    # recorded artifact — it writes a side file instead
    fname = "MATCHED_PAIR.json" if not args else "MATCHED_PAIR_subset.json"
    summary["detail"] = out["detail"] = fname
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), fname), "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
