from __future__ import annotations

import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from open_source_search_engine_spark.session import get_spark

    sp = get_spark(app="osse-tests", master="local[4]", shuffle_partitions=4)
    sp.sparkContext.setLogLevel("ERROR")
    yield sp
    sp.stop()


@pytest.fixture()
def tmp_index():
    d = tempfile.mkdtemp(prefix="osse_test_idx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def small_conf():
    """Small bucket count so tiny test corpora don't pay 64-partition
    overhead."""
    from open_source_search_engine_spark.config import EngineConf

    return EngineConf(n_buckets=4, n_salts=2, salt_df_threshold=10_000)
