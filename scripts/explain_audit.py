"""Audit the physical plans of the headline queries and write
BENCH/PLANS.md: per-query operator counts (broadcast joins, shuffles,
map-side combines, pushed filters, scan schemas) plus pass/fail against
the scale expectations in plans/audit.py.

Usage: python scripts/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from relation_extraction_cdr_spark.plans.audit import (  # noqa: E402
    EXPECTATIONS,
    audit_facts,
    plan_facts,
)
from relation_extraction_cdr_spark.plans.queries import QUERIES  # noqa: E402
from relation_extraction_cdr_spark.session import spark_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = spark_session("explain-audit", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# BENCH/PLANS.md — physical-plan audit",
        "",
        f"Plans compiled against `{sf_dir}` (pre-AQE operator counts; AQE",
        "may further coalesce at runtime, never the reverse).  Cached",
        "(persisted) subtrees are counted ONCE — the fill plan — not once",
        "per InMemoryTableScan reference, matching what actually executes.",
        "",
        "| query | BHJ | SMJ | BNLJ | exchanges | partial aggs | pushed filters | audited |",
        "|---|---|---|---|---|---|---|---|",
    ]
    failures: list[str] = []
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        f = plan_facts(df)
        v = audit_facts(name, f)
        failures.extend(v)
        status = ("FAIL" if v else "ok") if name in EXPECTATIONS else "—"
        lines.append(
            f"| {name} | {f.broadcast_hash_joins} | {f.sort_merge_joins} "
            f"| {f.nested_loop_joins} | {f.exchanges} | {f.partial_aggs} "
            f"| {len(f.pushed_filter_lines)} | {status} |"
        )

    lines += [
        "",
        "Global invariant: zero `CartesianProduct` in every plan "
        "(enforced by tests/test_plans.py).",
        "",
    ]
    if failures:
        lines += ["## Violations", ""] + [f"- {x}" for x in failures]
    (REPO / "BENCH" / "PLANS.md").write_text("\n".join(lines) + "\n")
    print(f"wrote BENCH/PLANS.md; {len(failures)} violation(s)")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
