"""Plan linter: run every repo plan-audit class against one query's plan
and print a scale report — the interactive entry point to the same checks
`tests/test_plans.py` enforces repo-wide in CI.

For each target (a registry query name, or an ad-hoc SQL string via
``--sql``) it reports:

- shuffle count and each Exchange's partitioning + payload summary
- wide-payload keyed shuffles (``plans.wide_shuffle_sites``) — tier 1,
  and tier 2 with ``--at-scale`` (re-plans with broadcasts disabled,
  simulating sizes where nothing fits a broadcast)
- unpartitioned rank windows over unbounded input
  (``plans.global_window_sites``)
- default-RANGE running aggregates (``plans.default_range_running_aggs``)
- row-at-a-time Python evaluation (``plans.rowwise_python_sites``)
- CartesianProduct / BroadcastNestedLoopJoin occurrences
- WholeStageCodegen stage count and PushedFilters lines

Usage:
    python tools/plan_lint.py q142_semantic_dedup
    python tools/plan_lint.py q81_array_set_ops --at-scale
    python tools/plan_lint.py --sql "SELECT text, count(*) FROM documents GROUP BY text"
    python tools/plan_lint.py --all            # lint every registry query

Exit code = number of findings (0 = clean), so it can gate ad-hoc work.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DEFAULT = "/root/testdata/sf0.01"


def lint(df, *, label: str, at_scale: bool = False, rebuild=None) -> int:
    """Lint one frame. ``rebuild`` is a zero-arg thunk that re-derives the
    SAME logical plan from scratch — required for ``at_scale=True``
    (the tier-2 audit flips the broadcast threshold, and a plan cached on
    ``df`` before the flip would be silently re-audited unchanged, i.e.
    the at-scale tier would report clean without having looked). The
    legacy ``df._lint_rebuild`` attribute is still honored as a fallback
    so existing callers keep working."""
    from data_engineering_nd_datalake_project_4_spark import plans

    rebuild = rebuild or getattr(df, "_lint_rebuild", None)
    if at_scale and rebuild is None:
        raise ValueError(
            "lint(at_scale=True) needs a rebuild thunk: the broadcast-"
            "threshold flip only affects FRESHLY planned frames, so "
            "auditing the cached plan would silently report the tier-1 "
            "result as the at-scale result. Pass rebuild=lambda: <re-"
            "derive the same frame>."
        )

    findings = 0
    print(f"== {label} ==")
    # codegen count must come from a FRESH frame BEFORE any other explain:
    # the first planning of a df is cached, and a plan first computed with
    # AQE on reports 0 codegen subtrees forever after (helper docstring)
    cg = plans.codegen_stage_count(rebuild() if rebuild else df)
    simple = plans.explain_str(df, "simple")

    n_shuffles = plans.shuffle_count(df)
    print(f"shuffles: {n_shuffles}  codegen stages: {cg}")
    pushed = plans.pushed_filters(df)
    if pushed:
        print("pushed filters:")
        for line in pushed.splitlines():
            print(f"  {line}")

    for title, sites in (
        ("wide payload on keyed shuffle", plans.wide_shuffle_sites(df)),
        ("unpartitioned rank window over unbounded input", plans.global_window_sites(df)),
        ("default-RANGE running aggregate", plans.default_range_running_aggs(df)),
        ("row-at-a-time Python evaluation", plans.rowwise_python_sites(df)),
    ):
        for s in sites:
            findings += 1
            print(f"FINDING [{title}]: {str(s)[:200]}")

    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        n = simple.count(bad)
        if n:
            findings += n
            print(f"FINDING [{bad}]: {n} node(s) (whitelisted sites exist — "
                  "see tests/test_plans.py NON_EQUI_BY_DESIGN)")

    if at_scale:
        spark = df.sparkSession
        thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            # re-derive a fresh plan under the modified threshold (the
            # rebuild thunk was validated non-None above)
            scaled = rebuild()
            for s in plans.wide_shuffle_sites(scaled):
                findings += 1
                print(f"FINDING [at-scale wide shuffle]: {str(s)[:200]}")
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)

    if not findings:
        print("clean")
    print()
    return findings


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("query", nargs="?", help="registry query name (e.g. q142_semantic_dedup)")
    ap.add_argument("--sql", help="lint an ad-hoc SQL string instead (tables pre-registered)")
    ap.add_argument("--all", action="store_true", help="lint every registry query")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", SF_DEFAULT))
    ap.add_argument("--at-scale", action="store_true",
                    help="also run the tier-2 audit (broadcasts disabled)")
    args = ap.parse_args()

    from data_engineering_nd_datalake_project_4_spark.catalog import register_views
    from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY
    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    spark = get_spark(app_name="plan_lint", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    def lint_query(name):
        q = REGISTRY[name]
        return lint(
            q.spark_fn(spark, args.sf),
            label=name,
            at_scale=args.at_scale,
            rebuild=lambda: q.spark_fn(spark, args.sf),
        )

    total = 0
    if args.sql:
        register_views(spark, args.sf)
        sql = args.sql
        total += lint(
            spark.sql(sql),
            label="(ad-hoc sql)",
            at_scale=args.at_scale,
            rebuild=lambda: spark.sql(sql),
        )
    elif args.all:
        for name in sorted(REGISTRY):
            total += lint_query(name)
    elif args.query:
        if args.query not in REGISTRY:
            raise SystemExit(f"unknown query {args.query!r}; names: q01..{sorted(REGISTRY)[-1]}")
        total += lint_query(args.query)
    else:
        ap.error("give a query name, --sql, or --all")
    print(f"total findings: {total}")
    spark.stop()
    return min(total, 125)


if __name__ == "__main__":
    raise SystemExit(main())
