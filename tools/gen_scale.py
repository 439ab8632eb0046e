"""Deterministic 10× scale-up of the driver testdata for the measured
scale lane (``tools/bench_scale.py``).

The driver ships sf0.001/sf0.01/sf0.1 only; every 100-TB-safety claim in
this repo is otherwise design-argued. This generator materializes an
sf1.0-shaped dataset from sf0.1 so the heavy operator family's scaling
SLOPE can be measured, not guessed.

Replication with structure-preserving perturbation (NOT naive copying —
K identical replicas would make every doc/vector a member of a K-clique
of exact near-duplicates, inflating candidate-pair counts ~K² and
corrupting the slope measurement):

- fact/dim tables (lineitem, orders, customer, supplier): K replicas
  with key offsets of (max_key+1) per replica — FK chains stay
  consistent across the scaled tables; region/nation/part keep their
  fixed cardinality (dims that don't scale with corpus size).
- supplier names are re-derived from the NEW key (``Supplier#%09d``) so
  the distance-1 serial structure q144 measures is preserved while
  replicas are not pairwise-identical.
- documents: replica k>0 rewrites each token with probability 0.3
  (hash-deterministic) to a replica-salted variant. Within-replica
  span/near-dup structure is byte-preserved; cross-replica 3-gram
  survival is 0.7³ ≈ 34% → jaccard ≈ 0.2 between replicas, far below
  every detection threshold, so near-dup density per doc stays constant
  and pair counts scale linearly like a true larger corpus.
- embeddings: replica k>0 adds hash-deterministic elementwise noise
  (±0.3) — decorrelates replicas below the 0.45 semantic-dedup
  threshold for the same reason.

Everything is plain DuckDB SQL over the source parquet — no RNG state,
same output for the same inputs. Usage:

    python tools/gen_scale.py [--src /root/testdata/sf0.1] \
                              [--out /tmp/spark_graft_scale/sf1.0] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

COPY_TABLES = ["region", "nation", "part"]


def _union_k(con, k: int, select_per_replica: str) -> str:
    return " UNION ALL ".join(select_per_replica.format(k=i) for i in range(k))


def generate(src: str, out: str, k: int = 10, tables: list[str] | None = None) -> None:
    """Materialize a k× replica-perturbed copy of ``src`` into ``out``.

    ``tables`` restricts the output (default: everything) — the
    second-decade lane (sf1.0 → sf10, tools/bench_scale.py --decade2)
    only needs ``documents``/``embeddings``, keeping disk bounded while
    the heavy text/vector family gets a second measured decade. The
    replica salt is the replica index, so applying the generator to its
    own sf1.0 output composes cleanly: an sf1.0 token variant ``tok~3``
    becomes ``tok~3~7`` in sf10 replica 7 — still hash-deterministic,
    still decorrelated across replicas (survival 0.7³ per 3-gram per
    decade).
    """

    def want(name: str) -> bool:
        return tables is None or name in tables

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() or 4)}")

    def t(name):
        return f"'{src}/{name}.parquet'"

    def write(name, sql):
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET, COMPRESSION SNAPPY)")
        n = con.execute(f"SELECT COUNT(*) FROM '{out}/{name}.parquet'").fetchone()[0]
        print(f"[gen_scale] {name}: {n} rows")

    for name in COPY_TABLES:
        if want(name) and os.path.exists(f"{src}/{name}.parquet"):
            write(name, f"SELECT * FROM {t(name)}")

    # `or 0`: MAX over an EMPTY source table is NULL — interpolating
    # `+ {k}*None` into SQL is an opaque binder error; with 0 the replicas
    # are empty-over-empty, a clean no-op copy (round-7 empty discipline).
    if want("customer") or want("orders"):
        kc = con.execute(f"SELECT MAX(c_custkey) + 1 FROM {t('customer')}").fetchone()[0] or 0
    if want("orders") or want("lineitem"):
        ko = con.execute(f"SELECT MAX(o_orderkey) + 1 FROM {t('orders')}").fetchone()[0] or 0
    if want("supplier") or want("lineitem"):
        ks = con.execute(f"SELECT MAX(s_suppkey) + 1 FROM {t('supplier')}").fetchone()[0] or 0
    if want("documents"):
        kd = con.execute(f"SELECT MAX(doc_id) + 1 FROM {t('documents')}").fetchone()[0] or 0
    if want("embeddings"):
        kv = con.execute(f"SELECT MAX(vec_id) + 1 FROM {t('embeddings')}").fetchone()[0] or 0

    if want("customer"):
        write("customer", _union_k(con, k,
            f"SELECT c_custkey + {{k}}*{kc} AS c_custkey, c_name, c_nationkey, "
            f"c_acctbal, c_mktsegment FROM {t('customer')}"))
    if want("supplier"):
        write("supplier", _union_k(con, k,
            f"SELECT s_suppkey + {{k}}*{ks} AS s_suppkey, "
            f"printf('Supplier#%09d', s_suppkey + {{k}}*{ks}) AS s_name, "
            f"s_nationkey, s_acctbal FROM {t('supplier')}"))
    if want("orders"):
        write("orders", _union_k(con, k,
            f"SELECT o_orderkey + {{k}}*{ko} AS o_orderkey, "
            f"o_custkey + {{k}}*{kc} AS o_custkey, o_orderstatus, o_totalprice, "
            f"o_orderdate, o_orderpriority FROM {t('orders')}"))
    if want("lineitem"):
        write("lineitem", _union_k(con, k,
            f"SELECT l_orderkey + {{k}}*{ko} AS l_orderkey, l_partkey, "
            f"l_suppkey + {{k}}*{ks} AS l_suppkey, l_linenumber, l_quantity, "
            f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
            f"l_shipdate FROM {t('lineitem')}"))

    if want("events") and os.path.exists(f"{src}/events.parquet"):
        # k-scaled since round 11 (was COPY_TABLES verbatim, which made
        # every event-table slope measurement a fixed-input no-op —
        # q168's 'flat at 10x' was hollow): replicas add events on the
        # SAME days ("more traffic per day" growth), with offset
        # event_id/user_id so ids stay unique and per-user sessions stay
        # intact per replica. ts arithmetic stays out of the replication
        # (both parquet timestamp physical types round-trip verbatim).
        # empty-source guard (round-7 empty-input discipline / ADVICE r11):
        # MAX() over zero rows is NULL, which would interpolate `+ {k}*None`
        # into the SQL — an opaque binder error instead of a clean copy.
        ke = con.execute(f"SELECT MAX(event_id) + 1 FROM {t('events')}").fetchone()[0] or 0
        ku = con.execute(f"SELECT MAX(user_id) + 1 FROM {t('events')}").fetchone()[0] or 0
        write("events", _union_k(con, k,
            f"SELECT event_id + {{k}}*{ke} AS event_id, ts, "
            f"user_id + {{k}}*{ku} AS user_id, event_type, value, props "
            f"FROM {t('events')}"))

    if not want("documents"):
        if want("embeddings"):
            write("embeddings", _emb_union(con, k, kv, t("embeddings")))
        return

    doc_sel = (
        "SELECT doc_id + {{k}}*{kd} AS doc_id, "
        "CASE WHEN {{k}} = 0 OR text IS NULL THEN text ELSE "
        "  array_to_string(list_transform(string_split(text, ' '), "
        "    tk -> CASE WHEN hash(tk || '|' || {{k}}) % 100 < 30 "
        "               THEN tk || '~' || {{k}} ELSE tk END), ' ') "
        "END AS text, lang, source, "
        "CASE WHEN text IS NULL THEN n_chars ELSE NULL END AS __keep_nc "
        "FROM {src_doc}"
    ).format(kd=kd, src_doc=t("documents"))
    write("documents",
        "SELECT doc_id, text, lang, source, "
        "COALESCE(__keep_nc, len(text)) AS n_chars FROM ("
        + _union_k(con, k, doc_sel) + ")")

    if want("embeddings"):
        write("embeddings", _emb_union(con, k, kv, t("embeddings")))


def _emb_union(con, k: int, kv: int, src_emb: str) -> str:
    emb_sel = (
        "SELECT vec_id + {{k}}*{kv} AS vec_id, "
        "CASE WHEN {{k}} = 0 THEN embedding ELSE "
        "  list_transform(range(1, len(embedding) + 1), "
        "    i -> CAST(embedding[i] + "
        "         ((hash(vec_id * 131 + i * 7 + {{k}}) % 1000) / 1000.0 - 0.5) * 0.6 "
        "         AS FLOAT)) "
        "END AS embedding, label FROM {src_emb}"
    ).format(kv=kv, src_emb=src_emb)
    return _union_k(con, k, emb_sel)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_scale/sf1.0")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tables", help="comma-separated subset (e.g. documents,embeddings)")
    args = ap.parse_args()
    tables = [s.strip() for s in args.tables.split(",")] if args.tables else None
    generate(args.src, args.out, args.k, tables=tables)


if __name__ == "__main__":
    main()
