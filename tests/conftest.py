from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pg_mooncake_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pg_mooncake_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "warehouse")


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# Slow tier (see pytest.ini): the files below are the heavyweight
# replay/property suites — per-file wall time from the r19 full-run
# durations profile (tests/ = 1039 tests, 47:12 total; these 15 files
# carry ~29 of those minutes).  Marked centrally here so the split is
# one reviewable list; everything still runs under `-m ""`.
_SLOW_FILES = {
    "test_views.py",          # 265 s  MV fold/replay
    "test_sources.py",        # 227 s  delta/iceberg format roundtrips
    "test_streaming.py",      # 191 s  structured-streaming twins
    "test_sql_txn.py",        # 157 s  transactional replay + crash drills
    "test_moontable_properties.py",  # 140 s property-based suite
    "test_lifecycle.py",      # 101 s  engine lifecycle scenarios
    "test_sql_ddl.py",        # 78 s
    "test_sql_constraints.py",  # 63 s
    "test_xxh64_sql.py",      # 57 s
    "test_regress_replay.py",  # 51 s
    "test_sql_dml_subquery18.py",  # 42 s
    "test_review_r8.py",      # 41 s
    "test_unique_fk_enforce18.py",  # 41 s
    "test_bloom.py",          # 40 s
    "test_mv_dim_churn18.py",  # 33 s
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if os.path.basename(str(item.fspath)) in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
