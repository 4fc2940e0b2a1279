from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from billing_data_loader_spark.session import get_spark  # noqa: E402

#: sf0.01 is the driver's correctness tier (SURVEY.md §5). The env knob is
#: shared with the scan_parquet_metadata oracle (sources/connectors.py) so a
#: relocated fixture root re-points tests AND the path-embedding oracle at
#: once (r8 ADVICE).
SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("bdl-tests")
    yield spark
