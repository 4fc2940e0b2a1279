"""Per-key implementation fingerprints for grade-freshness tracking.

The grading driver records correctness rows in ``CORRECTNESS_r*.json`` but
has no notion of *which code* earned the row.  Round 3 showed why that
matters: three window operators were rewritten after their round-1 green
rows, so the driver's hard signal dated from code that no longer shipped
(VERDICT.md r3, "What's missing" #1).

This module fingerprints each registered query as
``sha256(source of the unwrapped query fn + oracle SQL)``.  A sidecar file
``plans/graded_impl.json`` records the fingerprint each key carried when its
most recent driver row was earned; :func:`stale_keys` compares sidecar
vs. current code so :func:`catalog` can push any key whose implementation
(or oracle) changed since its last grade back into the driver's 50-key
grading window.

Maintenance protocol (documented in README):
  * at round START, before touching operator code, run
    ``python tools/refresh_graded_impl.py`` — it stamps the current
    fingerprint for every key graded in the newest CORRECTNESS file
    (grading ran against end-of-previous-round code, which is exactly the
    current tree at that moment);
  * any operator edited during the round then diverges from its stamp
    automatically and re-enters the grading window.

Limitation (accepted): the fingerprint covers the registered function body
and its oracle, not helper functions it calls.  Whole-file hashing would
re-enqueue all ~20 keys of a module on any one-key edit, churning the
50-key window; rewrites large enough to matter have always touched the
registered body itself.
"""

from __future__ import annotations

import hashlib
import inspect
import json
from pathlib import Path

from .registry import QuerySpec

SIDECAR = Path(__file__).resolve().parent / "graded_impl.json"


def impl_hash(spec: QuerySpec) -> str:
    """Fingerprint of the code+oracle a correctness row would vouch for."""
    fn = inspect.unwrap(spec.fn)  # @query wraps every fn; hash the original
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):  # builtins / REPL-defined in tests
        src = repr(fn)
    payload = src + "\n--oracle--\n" + (spec.oracle or "")
    return hashlib.sha256(payload.encode()).hexdigest()


def load_sidecar() -> dict[str, dict]:
    try:
        data = json.loads(SIDECAR.read_text())
    except (OSError, ValueError):
        return {}
    return data if isinstance(data, dict) else {}


def stale_keys(registered: dict[str, QuerySpec]) -> set[str]:
    """Keys whose current implementation differs from the one last graded.

    A key absent from the sidecar is NOT stale here — it is "never graded"
    and the catalog already front-loads those via the CORRECTNESS scan.
    """
    sidecar = load_sidecar()
    out: set[str] = set()
    for key, spec in registered.items():
        entry = sidecar.get(key)
        if entry and entry.get("hash") != impl_hash(spec):
            out.add(key)
    return out
