"""Regenerate CATALOG.md from the query registry.

Run as: ``python -m data_ingestion_system_spark.plans.gen_catalog``
(module form, like generate_plans_md — running it as a script would put
plans/ on sys.path where inspect.py shadows stdlib inspect).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from data_ingestion_system_spark.registry import load_all  # noqa: E402


def main() -> None:
    reg = load_all()
    lines = [
        "# CATALOG — every registered query (auto-generated)",
        "",
        "Regenerate: `python -m data_ingestion_system_spark.plans.gen_catalog`.",
        "One row per `queries()` entry; `oracle` = has a DuckDB SQL twin the",
        "driver hash-checks (rows-only otherwise); `survey` = the SURVEY.md §2",
        "ids the query covers (EXT-* = extension families beyond the reference).",
        "",
        f"**{len(reg)} queries**, "
        f"{sum(1 for s in reg.values() if s.oracle)} oracle-checked, "
        f"{sum(1 for s in reg.values() if not s.oracle)} rows-only.",
        "",
        "| query | survey | oracle | summary |",
        "|---|---|---|---|",
    ]
    for name, spec in sorted(reg.items()):
        doc = (spec.doc or "").split("\n")[0].strip().rstrip(".")
        if len(doc) > 110:
            doc = doc[:107] + "..."
        lines.append(
            f"| `{name}` | {spec.survey or '—'} | "
            f"{'yes' if spec.oracle else 'rows-only'} | {doc} |"
        )
    with open("/root/repo/CATALOG.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote CATALOG.md", len(reg), "queries")


if __name__ == "__main__":
    main()
