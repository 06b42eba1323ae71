"""Exact golden pinning for the rows-only (non-SQL-oracle) kernels.

These queries have no DuckDB oracle (iterative LOESS, Rosner ESD,
ADF/KPSS regressions, binary codec framing, media decoders); before
this file their pytest coverage was behavioral ranges, so a silent
numeric drift — a changed smoothing constant, an off-by-one window, a
re-ordered reduction — would pass CI. Each test recomputes the query
at sf0.001 and exact-compares the canonical serialization digest
against the checked-in fixture (tools/goldens.py regenerates them;
regeneration must ship in the same commit as an intentional kernel
change)."""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from goldens import (GOLDEN_BUILDERS, GOLDEN_DIR, GOLDEN_QUERIES, SF_DIR,
                     canonical_lines, digest)


@pytest.mark.parametrize("name", GOLDEN_QUERIES)
def test_golden_exact(spark, name):
    import __spark_entry__ as entry

    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        golden = json.load(f)
    fn = GOLDEN_BUILDERS.get(name) or entry.queries()[name]
    lines = canonical_lines(fn(spark, SF_DIR))
    assert lines[0] == golden["columns"], "output schema drifted"
    assert len(lines) - 1 == golden["rows"], "row count drifted"
    got = digest(lines)
    if got != golden["sha256"]:
        # show the first divergent rows so the failure is debuggable
        sample = golden["sample"]
        diffs = [(g, l) for g, l in zip(sample, lines[1:6]) if g != l]
        raise AssertionError(
            f"{name}: kernel output drifted from golden "
            f"(sha {got[:12]} != {golden['sha256'][:12]}); "
            f"first sample diffs: {diffs[:3]}; if the change is "
            "intentional, regenerate with tools/goldens.py and commit "
            "the fixture diff alongside the kernel change")
