from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from billing_data_loader_spark.session import get_spark  # noqa: E402

#: sf0.01 is the driver's correctness tier (SURVEY.md §5).
SF_DIR = "/root/testdata/sf0.01"
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("bdl-tests")
    yield spark
