"""UDTF / pandas-UDAF declared queries vs oracle."""

import pytest

from tests.oracle import compare
from torua_spark.queries import udf_q


@pytest.mark.parametrize("name", sorted(udf_q.QUERIES))
def test_udf_query_matches_oracle(spark, sf_dir, name):
    compare(udf_q.QUERIES[name](spark, sf_dir), udf_q.ORACLE[name], sf_dir)


def test_udtf_emits_nsplits_per_shard(spark, sf_dir):
    rows = udf_q.q_shard_split_ranges(spark, sf_dir).collect()
    assert len(rows) == 4 * udf_q.N_SPLITS
    per_shard = {}
    for r in rows:
        per_shard.setdefault(r["shard_id"], []).append(r["split_idx"])
    assert all(sorted(v) == list(range(udf_q.N_SPLITS)) for v in per_shard.values())
