"""Corpus-derived oracle parameters at their EXACT breakpoints
(VERDICT r6 #8): the sizing laws (auto_band_bits for hyperplane LSH,
ceil(n/target_cell) for SemDeDup k-means k) change value at specific
corpus sizes; a future driver SF could land on either side of any
doubling. These tests pin (a) the law's values at each boundary and
(b) Spark/DuckDB agreement for the FULL near-dup pipeline on corpora
exactly at and just past the first break, using the parameterized
oracle template (queries/rag_q.neardup_oracle_sql) rendered with the
law's r — proving any future SF stays hash-matchable by re-rendering
the template.
"""

import math

import duckdb
import numpy as np
import pytest

from torua_spark.operators import similarity as sim


def test_auto_band_bits_exact_boundaries():
    """r = max(4, ceil(log2(n/64))): every doubling boundary, both
    sides, including the floor region every oracle-compared SF lives
    in (n=500 at sf0.001/sf0.01)."""
    f = sim.auto_band_bits
    assert f(1) == 4 and f(64) == 4 and f(65) == 4     # floor region
    assert f(500) == 4                                 # driver SFs
    assert f(1024) == 4 and f(1025) == 5               # first break
    assert f(2048) == 5 and f(2049) == 6
    assert f(4096) == 6 and f(4097) == 7
    # invariant on both sides of every boundary up to cluster scale:
    # expected bucket n/2^r stays in (target/2, target] past the floor
    for e in range(11, 31):
        for n in (2**e, 2**e + 1):
            r = f(n)
            assert n / 2**r <= sim.HYPERPLANE_TARGET_BUCKET
            assert n / 2**r > sim.HYPERPLANE_TARGET_BUCKET / 2


def test_semantic_auto_k_law_matches_sql_at_breakpoint():
    """k = min(max(KMEANS_K, ceil(n/128)), MAX_K): the Python law and
    the oracle's SQL rendering (_AUTO_K_SQL) must agree exactly where
    the law first engages (n = 128*KMEANS_K = 2048 -> 2049) and at
    the cap."""
    from torua_spark.queries.rag_q import _AUTO_K_SQL

    def py_k(n):
        return min(max(sim.KMEANS_K, math.ceil(n / 128)), sim.SEMANTIC_MAX_K)

    assert py_k(2048) == sim.KMEANS_K          # law inert
    assert py_k(2049) == sim.KMEANS_K + 1      # law engages
    assert py_k(128 * sim.SEMANTIC_MAX_K + 1) == sim.SEMANTIC_MAX_K  # cap

    con = duckdb.connect()
    try:
        for n in (1, 500, 2048, 2049, 4096, 1_000_000):
            con.execute("CREATE OR REPLACE VIEW embeddings AS "
                        f"SELECT * FROM range({n})")
            got = con.execute(_AUTO_K_SQL).fetchone()[0]
            assert got == py_k(n), (n, got, py_k(n))
    finally:
        con.close()


def _synth_corpus(n: int, dim: int = sim.HYPERPLANE_DIM):
    """Deterministic 64-dim corpus with planted near-duplicate pairs:
    vectors come in groups of 8 around shared anchors with small
    perturbations, so the tau=0.35 verify has real work on both
    engines. All values quantize identically (4-decimal floats)."""
    rng = np.random.RandomState(7)
    anchors = rng.randn(max(1, n // 8) + 1, dim)
    rows = []
    for i in range(n):
        a = anchors[i // 8]
        v = a + 0.15 * rng.randn(dim)
        rows.append((i, [round(float(x), 4) for x in v]))
    return rows


@pytest.mark.parametrize("n", [1024, 1025])
def test_neardup_spark_duckdb_agree_at_band_breakpoint(spark, tmp_path, n):
    """Full pipeline agreement exactly AT the first band-width break
    (n=1024: legacy r=4 — the last size the declared static oracle
    covers) and just PAST it (n=1025: the law picks r=5 and the
    re-rendered template must match Spark bit-for-bit)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from torua_spark.queries.rag_q import NEARDUP_COS_THRESHOLD, neardup_oracle_sql

    rows = _synth_corpus(n)
    r = sim.auto_band_bits(n)
    assert r == (4 if n == 1024 else 5)

    # same bytes to both engines
    pq_path = str(tmp_path / "embeddings.parquet")
    pq.write_table(
        pa.table({
            "vec_id": pa.array([i for i, _ in rows], pa.int64()),
            "embedding": pa.array([v for _, v in rows],
                                  pa.list_(pa.float64())),
        }),
        pq_path,
    )
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = sim.embedding_near_dup_pairs(emb, NEARDUP_COS_THRESHOLD).collect()
    con = duckdb.connect()
    try:
        con.execute("CREATE VIEW embeddings AS "
                    f"SELECT * FROM read_parquet('{pq_path}')")
        want = con.execute(neardup_oracle_sql(band_bits=r)).fetchall()
    finally:
        con.close()

    norm = lambda rows_: sorted(  # noqa: E731
        (int(a), int(b), round(float(s), 9)) for a, b, s in rows_
    )
    assert len(got) > 0, "fixture must exercise the verify stage"
    assert norm(tuple(x) for x in got) == norm(want)


def test_oracle_renderer_tracks_the_band_law():
    """The size-law renderer: at every oracle-compared driver SF
    (n<=1024) it reproduces the static declared string byte-for-byte;
    past the first doubling it renders the wider band the Spark side
    actually runs — the mechanism that keeps our own sf0.1/sf1
    sweeps hash-exact (50/50 at sf0.1 re-verified with it)."""
    from torua_spark.operators import similarity as sim
    from torua_spark.queries import oracle_renderers, rag_q

    render = oracle_renderers()["vector_neardup_pairs"]
    assert render(500) == rag_q.ORACLE["vector_neardup_pairs"]
    assert sim.auto_band_bits(2000) > sim.HYPERPLANE_BAND_BITS
    assert render(2000) != rag_q.ORACLE["vector_neardup_pairs"]
