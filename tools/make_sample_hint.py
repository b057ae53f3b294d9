"""Regenerate SAMPLE_HINT.json from the committed CORRECTNESS_r*.json
files — the driver's 50-slot correctness sample follows queries()
registration order, and queries() orders itself stalest-driver-evidence
-first (pybabe_spark/queries.py::_sample_order). This hint file is the
human/driver-readable mirror of that order; run this after every round
so it never goes stale (the r9 verdict caught a stale copy claiming 45
never-checked keys when the true residue was 6).

Usage: python tools/make_sample_hint.py
"""

import json
from pathlib import Path


def main() -> None:
    root = Path(__file__).resolve().parent.parent
    import sys

    sys.path.insert(0, str(root))
    from pybabe_spark.queries import _LAST_DRIVER_GREEN, all_queries

    keys = list(all_queries())  # already stalest-first
    never = [k for k in keys if k not in _LAST_DRIVER_GREEN]
    stale = {
        k: _LAST_DRIVER_GREEN[k] for k in keys if k in _LAST_DRIVER_GREEN
    }
    latest_round = max(stale.values(), default=0)
    hint = {
        "purpose": (
            "correctness-sample rotation hint: keys ordered stalest-"
            "driver-evidence-first (never-driver-checked lead; queries() "
            "returns the same order)"
        ),
        "generated_from_rounds_up_to": latest_round,
        "never_driver_checked": never,
        "last_green_round_by_key": stale,
        "sample_order": keys,
    }
    out = root / "SAMPLE_HINT.json"
    out.write_text(json.dumps(hint, indent=1) + "\n")
    print(
        f"wrote {out}: {len(keys)} keys, {len(never)} never-driver-"
        f"checked, evidence through round {latest_round}"
    )
    if never:
        print("never checked:", ", ".join(never))


if __name__ == "__main__":
    main()
