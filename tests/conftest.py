import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logstash_filter_elasticsearch_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="lfes-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def seq_data(tmp_path_factory):
    """Small deterministic sequences + lookup dataset (unit tier)."""
    from logstash_filter_elasticsearch_spark.data.gen import write_dataset

    out = str(tmp_path_factory.mktemp("seqdata"))
    seq_dir, lookup_path = write_dataset(out, n_rows=2000, seed=42, rows_per_file=700)
    return {"seq_dir": seq_dir, "lookup": lookup_path}
