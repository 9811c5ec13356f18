"""Streaming + multimodal queries vs oracles (batch-parity goldens)."""

import pytest

from tests.oracle import compare
from torua_spark.queries import streaming_q, topology_q


@pytest.mark.parametrize("name", sorted(streaming_q.QUERIES))
def test_streaming_query_matches_oracle(spark, sf_dir, name):
    compare(streaming_q.QUERIES[name](spark, sf_dir), streaming_q.ORACLE[name], sf_dir)


def test_streaming_health_equals_batch(spark, sf_dir):
    stream = {
        r["node_id"]: (r["unhealthy_transitions"], r["total_failures"], r["total_probes"])
        for r in streaming_q.q_streaming_health_state(spark, sf_dir).collect()
    }
    batch = {
        r["node_id"]: (r["unhealthy_transitions"], r["total_failures"], r["total_probes"])
        for r in topology_q.q_health_consecutive_failures(spark, sf_dir).collect()
    }
    assert stream == batch


def test_streaming_sessions_equal_batch_session_window(spark, sf_dir):
    """The same session_window operator must produce identical sessions
    whether driven by the streaming engine or the batch engine."""
    from torua_spark.queries import temporal_q

    stream = sorted(
        map(tuple, streaming_q.QUERIES["streaming_sessions"](spark, sf_dir).collect())
    )
    batch = sorted(
        map(tuple, temporal_q.q_session_window_native(spark, sf_dir).collect())
    )
    assert stream == batch


def test_frame_sample_is_documented_stub(spark, sf_dir):
    from torua_spark.operators import multimodal
    from torua_spark.sources.catalog import load_table

    media = multimodal.to_media_table(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        multimodal.frame_sample(media)
