"""Driver-exact parity sweep: every oracled queries() entry vs DuckDB at a
given SF, comparing STRINGIFIED pandas values on name-sorted columns — the
driver's value-hash is typing-sensitive (r02's scrape_batch red row was
bigint "282" vs HUGEINT->float64 "282.0"), so this sweep stringifies both
sides the same way instead of relying on Python's 282 == 282.0.

Usage: python scripts/parity_sweep.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon_cell(v):
    import numpy as np

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\0N"
    if isinstance(v, (bool, np.bool_)):
        return "T" if v else "F"
    if isinstance(v, (float, np.floating)):
        f = round(float(v), 9)
        return repr(int(f)) + ".0" if f == int(f) else repr(f)
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def frame_set(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(canon_cell(v) for v in t)
            for t in pdf[cols].itertuples(index=False, name=None)]
    return sorted(rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/parity_sweep.json"
    from crawler_spark.session import get_spark

    spark = get_spark("parity-sweep", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    Q, O = entrymod.queries(), entrymod.oracle_sql()
    only = os.environ.get("PARITY_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        Q = {n: q for n, q in Q.items() if n in keep}
    results: dict[str, dict] = {}
    for name in Q:
        t0 = time.time()
        try:
            sdf = Q[name](spark, sf_dir)
            spdf = sdf.toPandas()
            if name not in O:
                results[name] = {"status": "rows_only", "rows": len(spdf),
                                 "sec": round(time.time() - t0, 1)}
                print(name, results[name], flush=True)
                continue
            opdf = con.execute(O[name]).fetch_df()
            cols_ok = sorted(spdf.columns) == sorted(opdf.columns)
            rows_ok = len(spdf) == len(opdf)
            vals_ok = cols_ok and rows_ok and frame_set(spdf) == frame_set(opdf)
            status = "ok" if (cols_ok and rows_ok and vals_ok) else "MISMATCH"
            res = {"status": status, "rows": len(spdf), "cols_ok": cols_ok,
                   "rows_ok": rows_ok, "vals_ok": vals_ok,
                   "sec": round(time.time() - t0, 1)}
            if status == "MISMATCH" and cols_ok and rows_ok:
                s, d = frame_set(spdf), frame_set(opdf)
                sset, dset = set(s), set(d)
                res["spark_only"] = [list(r) for r in list(sset - dset)[:3]]
                res["duck_only"] = [list(r) for r in list(dset - sset)[:3]]
            results[name] = res
        except Exception as exc:
            results[name] = {"status": "ERROR", "err": f"{type(exc).__name__}: {exc}"[:300],
                             "sec": round(time.time() - t0, 1)}
        print(name, results[name].get("status"), results[name].get("sec"), flush=True)
    n_bad = sum(1 for r in results.values() if r["status"] in ("MISMATCH", "ERROR"))
    with open(out_path, "w") as fh:
        json.dump({"sf": sf_dir, "n": len(results), "n_bad": n_bad,
                   "results": results}, fh, indent=1)
    print(f"SWEEP DONE: {len(results)} queries, {n_bad} bad -> {out_path}")


if __name__ == "__main__":
    main()
