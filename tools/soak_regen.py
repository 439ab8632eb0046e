"""Regen-robustness soak: rerun the strict driver-sim against adversarial
re-materializations of the sf0.01 testdata.

The driver regenerates testdata every round, and every historical driver-gate
failure was regen-induced: decimal rendering, ROUND half-boundaries, and the
events.ts TIMESTAMP(NANOS)/(MICROS) physical-type flip. This soak builds the
variants a hostile regen could produce and requires the FULL oracle contract
to stay green on each:

- ``ts_micros`` / ``ts_nanos``: events.ts written with each parquet
  timestamp physical type (the shipped testdata only ever has one of them,
  so the other branch of ``catalog.load_table`` is otherwise untested
  against the full contract).
- ``half2`` : every money/value double forced onto a x.xx5 half-boundary
  (3 decimals ending in 5) — the worst case for any double→DECIMAL(18,2)
  cast or ROUND(x, 2): Spark rounds the shortest decimal string repr
  (HALF_UP), DuckDB rounds the binary double, and x.xx5 is where they can
  disagree.
- ``half4`` : the same at x.xxxx5 for the DECIMAL(18,4)/scale-4 class.
- ``rowshuffle`` : every table's rows deterministically permuted — a regen
  is free to emit any physical row order, so a query whose ORDER BY lacks
  a total tie-break (or whose window frames depend on input order) would
  hash-differently between regens; this variant catches it now.

Usage: ``python tools/soak_regen.py [variant ...]`` (default: all).
Exit code = number of failing (variant, query) pairs.
"""

from __future__ import annotations

import importlib.util
import shutil
import sys
import tempfile
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF_SRC = Path("/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: money/value double columns per table, forced onto half-boundaries
MONEY_COLS = {
    "lineitem": ["l_extendedprice", "l_discount", "l_tax"],
    "orders": ["o_totalprice"],
    "customer": ["c_acctbal"],
    "supplier": ["s_acctbal"],
    "part": ["p_retailprice"],
    "events": ["value"],
}


def _force_half_boundary(col: pa.ChunkedArray, scale: int) -> pa.ChunkedArray:
    """floor to ``scale`` decimals, then add half an ulp at that scale:
    x -> floor(x·10^s)/10^s + 0.5/10^s. floor (not trunc) keeps negative
    balances (c_acctbal/s_acctbal) on the same .5-offset grid — every
    output sits on a half-boundary regardless of sign."""
    mul = 10.0**scale
    return pc.add(pc.divide(pc.floor(pc.multiply(col, mul)), mul), 0.5 / mul)


def build_variant(name: str, out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        src = SF_SRC / f"{t}.parquet"
        dst = out_dir / f"{t}.parquet"
        if name in ("ts_micros", "ts_nanos") and t == "events":
            tbl = pq.read_table(src)
            unit = "us" if name == "ts_micros" else "ns"
            i = tbl.schema.get_field_index("ts")
            tbl = tbl.set_column(i, "ts", tbl.column("ts").cast(pa.timestamp(unit)))
            # version 2.6 writes TIMESTAMP(NANOS) natively for ns columns
            pq.write_table(tbl, dst, version="2.6")
        elif name == "rowshuffle":
            tbl = pq.read_table(src)
            n = tbl.num_rows
            # deterministic permutation: sort by xxhash-free stand-in
            # (i*2654435761 mod 2^32, a Knuth multiplicative shuffle)
            idx = pa.array(
                sorted(range(n), key=lambda i: (i * 2654435761) & 0xFFFFFFFF)
            )
            pq.write_table(tbl.take(idx), dst)
        elif name in ("half2", "half4") and t in MONEY_COLS:
            scale = 2 if name == "half2" else 4
            tbl = pq.read_table(src)
            for c in MONEY_COLS[t]:
                i = tbl.schema.get_field_index(c)
                tbl = tbl.set_column(
                    i, c, _force_half_boundary(tbl.column(c), scale)
                )
            pq.write_table(tbl, dst)
        else:
            shutil.copyfile(src, dst)


def run_strict_sim(sf_dir: str, spark, con_factory, compare) -> list[str]:
    spec = importlib.util.spec_from_file_location(
        "entry_mod", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    con = con_factory(sf_dir)
    qs, osql = m.queries(), m.oracle_sql()
    failures = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir)
            if name in osql:
                compare(sdf, con, osql[name])
            else:
                sdf.count()
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:200]}")
    return failures


def main(argv: list[str]) -> int:
    sys.path.insert(0, "/root/repo")
    from data_engineering_nd_datalake_project_4_spark.session import get_spark
    from tests.oracle_util import compare, duck_con

    variants = argv or ["ts_micros", "ts_nanos", "half2", "half4", "rowshuffle"]
    spark = get_spark(app_name="soak-regen", shuffle_partitions=16)
    total_fail = 0
    with tempfile.TemporaryDirectory(prefix="soak_regen_") as tmp:
        for v in variants:
            vdir = Path(tmp) / v
            build_variant(v, vdir)
            fails = run_strict_sim(str(vdir), spark, duck_con, compare)
            total_fail += len(fails)
            status = "OK" if not fails else f"{len(fails)} FAIL"
            print(f"[soak] {v:10s} {status}", flush=True)
            for f in fails:
                print(f"    {f}", flush=True)
    spark.stop()
    return total_fail


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
