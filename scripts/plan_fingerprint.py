"""Generate (or check) PLAN_FINGERPRINTS.json — the committed plan-shape
gate for EVERY registered query (VERDICT r13 item 2).

Usage:
    python scripts/plan_fingerprint.py               # diff vs committed (DEFAULT;
                                                     # exit 1 on drift, never writes)
    python scripts/plan_fingerprint.py q1 ...        # subset diff (never writes)
    python scripts/plan_fingerprint.py --update q1 ...  # merge subset into committed
                                                        # (the deliberate-change path)
    python scripts/plan_fingerprint.py --write       # full regeneration — OVERWRITES
                                                     # the gate file; explicit only
    python scripts/plan_fingerprint.py --plans-md    # render PLANS.md's audit table
                                                     # from the COMMITTED json (no
                                                     # Spark; MANUAL section preserved)

Fingerprints are taken at sf0.01 on the engine's tuned session (the same
layout every suite query pins via tune_existing, so vanilla/tuned produce
the same plan). The committed JSON is diffed by
tests/test_plan_fingerprints.py at HEAD: a deliberate plan change updates
the file in the same commit; an accidental one is red regardless of bench
noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "PLAN_FINGERPRINTS.json")


def generate(
    names: list[str] | None = None, sf_dir: str = "/root/testdata/sf0.01"
) -> dict[str, dict[str, int]]:
    import __spark_entry__ as se
    from cirro_annotation_spark.plans.fingerprint import plan_fingerprint
    from cirro_annotation_spark.session import get_spark

    spark = get_spark("plan_fingerprint")
    qs = se.queries()
    todo = names or sorted(qs)
    out: dict[str, dict[str, int]] = {}
    t0 = time.perf_counter()
    for i, name in enumerate(todo, 1):
        out[name] = plan_fingerprint(qs[name](spark, sf_dir))
        if i % 50 == 0 or i == len(todo):
            print(
                f"  {i}/{len(todo)} fingerprinted "
                f"({time.perf_counter() - t0:.1f}s)",
                file=sys.stderr,
            )
    return out


# Everything at or below this marker in an existing PLANS.md is
# hand-written (eager-action inventory, bounded-window notes, ad-hoc
# excerpts) and survives regeneration.
MANUAL_MARKER = "<!-- MANUAL -->"

# Node classes summed into the PLANS.md convenience columns. The JSON
# keeps them separate (the gate diffs exact per-class counts); the
# rendered table groups them the way a human scans for scale smells.
_BROADCAST_KEYS = ("BroadcastHashJoin", "BroadcastNestedLoopJoin")
_PYTHON_KEYS = ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas",
                "BatchEvalPython")


def render_plans_md(out_path: str = os.path.join(REPO, "PLANS.md")) -> None:
    """PLANS.md audit table for ALL registered queries, rendered from the
    committed PLAN_FINGERPRINTS.json — the one plan tool (VERDICT r14
    item 5: plan_audit.py's ~170-query executed-plan audit is superseded
    by the 350-query committed gate; its codegen-stage column was the
    only executed-plan-exclusive signal and is retired — the gate pins
    exact node-class counts instead, which is strictly stronger for
    regression detection)."""
    committed: dict[str, dict[str, int]] = json.load(open(OUT))
    lines = [
        "# PLANS — physical-plan audit of all registered queries",
        "",
        "Rendered by `scripts/plan_fingerprint.py --plans-md` from the "
        "committed PLAN_FINGERPRINTS.json (sf0.01 pre-execution plans — "
        "the same file tests/test_plan_fingerprints.py enforces at HEAD).",
        "Columns: shuffles = Exchange count; pushed = scans with non-empty "
        "PushedFilters / total scans; cols = total ReadSchema width; "
        "bcast = broadcast joins (hash + nested-loop); smj = sort-merge "
        "joins; py = Arrow/Pandas python-boundary nodes (row-at-a-time "
        "BatchEvalPython is zero registry-wide and gate-enforced).",
        "",
        "| query | shuffles | pushed | cols | bcast | smj | py |",
        "|---|---|---|---|---|---|---|",
    ]
    for name in sorted(committed):
        fp = committed[name]
        lines.append(
            f"| {name} | {fp.get('Exchange', 0)} "
            f"| {fp.get('pushed_filters', 0)}/{fp.get('Scan', 0)} "
            f"| {fp.get('scan_cols', 0)} "
            f"| {sum(fp.get(k, 0) for k in _BROADCAST_KEYS)} "
            f"| {fp.get('SortMergeJoin', 0)} "
            f"| {sum(fp.get(k, 0) for k in _PYTHON_KEYS)} |"
        )
    manual = ""
    if os.path.exists(out_path):
        prev = open(out_path).read()
        if MANUAL_MARKER in prev:
            manual = "\n" + MANUAL_MARKER + prev.split(MANUAL_MARKER, 1)[1]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n" + manual)
    print(f"wrote {out_path} ({len(committed)} queries)")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--check", action="store_true",
                    help="diff vs committed (the DEFAULT behavior)")
    ap.add_argument("--update", action="store_true",
                    help="merge named queries' fresh fingerprints into the "
                         "committed file (deliberate plan change)")
    ap.add_argument("--write", action="store_true",
                    help="full regeneration, OVERWRITING the committed file "
                         "— re-baselines the gate; diff first")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--plans-md", action="store_true",
                    help="render PLANS.md from the committed json "
                         "(no Spark session; MANUAL section preserved)")
    args = ap.parse_args()

    if args.plans_md:
        if args.queries or args.write or args.update:
            print("--plans-md takes no other flags or names", file=sys.stderr)
            return 2
        render_plans_md()
        return 0

    # Validate flag/name combinations BEFORE the (minutes-long) generate
    # pass: --write with names used to fall through to diff-only mode,
    # so a user who believed they re-baselined had written nothing
    # (ADVICE r14).
    if args.write and args.queries:
        print(
            "--write takes no names (it overwrites the WHOLE gate file); "
            "use --update <query ...> for a targeted merge",
            file=sys.stderr,
        )
        return 2
    if args.update and not args.queries:
        print("--update requires explicit query names", file=sys.stderr)
        return 2

    current = generate(args.queries or None, args.sf_dir)

    if args.update:
        committed = json.load(open(OUT)) if os.path.exists(OUT) else {}
        committed.update(current)
        with open(OUT, "w") as f:
            json.dump(committed, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"updated {len(current)} entries in {OUT}")
        return 0

    if args.write:
        # The only path that overwrites the whole gate file — explicit
        # opt-in (code-review r14: a flagless run must never silently
        # re-baseline the gate it implements). Name validation above
        # guarantees args.queries is empty here.
        with open(OUT, "w") as f:
            json.dump(current, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {OUT} ({len(current)} queries)")
        return 0

    # Default (and --check): diff against committed, never write.
    from cirro_annotation_spark.plans.fingerprint import diff_fingerprints

    committed = json.load(open(OUT)) if os.path.exists(OUT) else {}
    if args.queries:
        committed = {k: v for k, v in committed.items() if k in current}
    drift = diff_fingerprints(committed, current)
    for line in drift:
        print(line)
    print(f"{len(drift)} drifted / {len(current)} checked")
    return 1 if drift else 0


if __name__ == "__main__":
    sys.exit(main())
