"""Plan-shape regression gate (VERDICT r13 item 2).

Wall-time cannot police plans — two same-HEAD bench runs differed by 11%
in r13 — so every registered query has a committed structural fingerprint
(PLAN_FINGERPRINTS.json: counts of Exchange / BroadcastExchange / Scan /
Sort / Window / join / aggregate / Python-boundary nodes, plus pushdown
and scan-width) taken at sf0.01. This test regenerates all of them at
HEAD and diffs. A deliberate plan change must update the committed file
in the SAME commit (`python scripts/plan_fingerprint.py`); an accidental
one — a filter that stops pushing, a broadcast that degrades to
sort-merge, a new shuffle — is red here no matter what the bench says.

Runtime note: building 350 plans costs a few minutes (iterative trainers
execute their bounded interior jobs at plan-build time). Set
SPARK_GRAFT_PLAN_GATE=sample for a fast 40-query smoke during local
iteration; CI/full runs leave it unset.
"""

from __future__ import annotations

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FPATH = os.path.join(REPO, "PLAN_FINGERPRINTS.json")
SF_DIR = "/root/testdata/sf0.01"


def test_plan_fingerprints_match_committed(spark) -> None:
    if not os.path.exists(FPATH):
        pytest.skip("PLAN_FINGERPRINTS.json not generated yet")
    if not os.path.isdir(SF_DIR):
        pytest.skip(f"{SF_DIR} missing")

    import __spark_entry__ as se
    from cirro_annotation_spark.plans.fingerprint import (
        diff_fingerprints,
        plan_fingerprint,
    )

    committed: dict[str, dict[str, int]] = json.load(open(FPATH))
    qs = se.queries()
    names = sorted(qs)
    if os.environ.get("SPARK_GRAFT_PLAN_GATE") == "sample":
        names = names[::9]  # ~40 spread across all families
        committed = {k: v for k, v in committed.items() if k in set(names)}

    current = {n: plan_fingerprint(qs[n](spark, SF_DIR)) for n in names}
    drift = diff_fingerprints(committed, current)
    assert not drift, (
        f"{len(drift)} plan fingerprints drifted from PLAN_FINGERPRINTS.json "
        "— if the plan change is deliberate, run "
        "`python scripts/plan_fingerprint.py --update <names>` and commit "
        "the JSON in the SAME commit:\n"
        + "\n".join(drift[:40])
    )
