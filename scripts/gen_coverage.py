"""Emit the generated query-index section of COVERAGE.md.

COVERAGE.md's hand-written tables describe operators; this emitter owns
the exhaustive *registry index* at the bottom so a newly registered query
can never be silently undocumented (round-3 verdict: `merge_cdc_snapshot`
drifted exactly this way). `tests/test_oracle_parity.py` asserts the
section in COVERAGE.md is byte-identical to this emitter's output.

Usage:
    python scripts/gen_coverage.py          # print the section
    python scripts/gen_coverage.py --write  # splice it into COVERAGE.md
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BEGIN = "<!-- BEGIN GENERATED QUERY INDEX (scripts/gen_coverage.py) -->"
END = "<!-- END GENERATED QUERY INDEX -->"


def render() -> str:
    from feast_ibm_spark.queries import DRIVER_QUERIES, QUERIES

    lines = [
        BEGIN,
        "## Registered query index (generated — do not edit by hand)",
        "",
        "Regenerate with `python scripts/gen_coverage.py --write`. One row",
        "per `feast_ibm_spark.queries.QUERIES` entry; `gate` says whether",
        "the query is exported to the 50-row driver gate this round or",
        "pinned by the local oracle replica (`tests/test_oracle_parity.py`).",
        "",
        "| Query | Gate | Oracle | Description |",
        "|---|---|---|---|",
    ]
    for name, qd in QUERIES.items():
        gate = "driver" if name in DRIVER_QUERIES else "local"
        oracle = "SQL" if qd.oracle else "rows-only"
        doc = " ".join(qd.doc.split()) or "—"
        lines.append(f"| `{name}` | {gate} | {oracle} | {doc} |")
    lines.append(END)
    return "\n".join(lines) + "\n"


def main() -> None:
    section = render()
    if "--write" not in sys.argv:
        print(section, end="")
        return
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "COVERAGE.md",
    )
    doc = open(path).read()
    if BEGIN in doc:
        head = doc[: doc.index(BEGIN)]
        tail = doc[doc.index(END) + len(END) + 1 :]
        doc = head + section + tail
    else:
        doc = doc.rstrip("\n") + "\n\n" + section
    with open(path, "w") as f:
        f.write(doc)
    print(f"wrote generated index ({len(section.splitlines())} lines) to {path}")


if __name__ == "__main__":
    main()
