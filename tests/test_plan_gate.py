"""CI gate: the physical-plan anti-pattern sweep must stay clean.

VERDICT r3 asked for the plan sweep (``tools/plan_audit.py``) to be wired
into pytest so a plan regression — a new unexplained Exchange
SinglePartition, BroadcastNestedLoopJoin, CartesianProduct, or
row-at-a-time BatchEvalPython node — fails CI instead of waiting for the
next manual PLANS.md refresh.  Every flag must either be absent or carry a
justification in ``tools/plan_audit.py:EXPECTED_FLAGS`` (mirrored in the
operator's docstring).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_DIR  # noqa: E402
from tools.plan_audit import sweep_unexplained  # noqa: E402


def test_no_unexplained_plan_flags(spark):
    bad = sweep_unexplained(spark, SF_DIR)
    assert not bad, (
        "plan regression — unexplained anti-pattern flags (justify in "
        f"tools/plan_audit.py:EXPECTED_FLAGS or fix the plan): {bad}"
    )
