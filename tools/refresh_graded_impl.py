"""Stamp current impl fingerprints for keys graded by the driver.

Run at round START, before editing any operator code (see
``plans/impl_hash.py`` docstring for the protocol).  For every key with a
valid row in any ``CORRECTNESS_r*.json``, records the fingerprint of the
code currently in the tree and the latest round that graded it.  Keys whose
stamp already post-dates their newest record are left untouched, so a
mid-round re-run cannot overwrite a deliberate invalidation with a hash of
already-edited code.

Usage::

    python tools/refresh_graded_impl.py            # stamp
    python tools/refresh_graded_impl.py --check    # report staleness only
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from billing_data_loader_spark.plans import catalog as catalog_mod  # noqa: E402
from billing_data_loader_spark.plans.impl_hash import (  # noqa: E402
    SIDECAR,
    impl_hash,
    load_sidecar,
)
from billing_data_loader_spark.plans.registry import all_queries  # noqa: E402

assert catalog_mod  # imported for its module-registration side effects


def latest_grades() -> dict[str, int]:
    """key -> newest round number with a valid (hash or rows-only) row."""
    grades: dict[str, int] = {}
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        for key, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows")
            )
            if ok:
                grades[key] = max(rnd, grades.get(key, 0))
    return grades


def main() -> int:
    check_only = "--check" in sys.argv
    registered = all_queries()
    grades = latest_grades()
    sidecar = load_sidecar()

    stamped = refreshed = stale = 0
    for key, rnd in sorted(grades.items()):
        spec = registered.get(key)
        if spec is None:
            continue
        cur = impl_hash(spec)
        entry = sidecar.get(key)
        if entry is None:
            sidecar[key] = {"hash": cur, "round": rnd}
            stamped += 1
        elif entry.get("round", 0) < rnd:
            sidecar[key] = {"hash": cur, "round": rnd}
            refreshed += 1
        elif entry.get("hash") != cur:
            stale += 1
            print(f"stale: {key} (graded r{entry.get('round')}, code changed since)")

    if not check_only:
        SIDECAR.write_text(json.dumps(sidecar, indent=1, sort_keys=True) + "\n")
    print(
        f"{'check' if check_only else 'stamp'}: {stamped} new, "
        f"{refreshed} refreshed, {stale} stale, {len(sidecar)} total"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
