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
    args = ap.parse_args()

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
