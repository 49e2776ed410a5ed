"""Connected-components / dup-cluster semantics (operators/graph.py),
including a hypothesis property check against a Python union-find."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from healthcare_aws_data_engineering_spark.operators.graph import (
    connected_components,
    dup_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_cc_path_graph_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, all must land on label 1.
    out = connected_components(_pairs(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]))
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_cc_multiple_components_and_orientation(spark):
    # Two components; edges given in both orientations and with the min
    # node on either side.
    out = connected_components(
        _pairs(spark, [(7, 3), (3, 9), (20, 25), (25, 20)])
    )
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got == {3: 3, 7: 3, 9: 3, 20: 20, 25: 20}


def test_cc_max_iter_truncates_long_chain(spark):
    # diameter > max_iter: labels not fully propagated — documents the
    # bound rather than silently looping forever.
    chain = [(i, i + 1) for i in range(1, 8)]
    out = connected_components(_pairs(spark, chain), max_iter=2)
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got[8] != 1  # far end not yet reached in 2 rounds
    assert got[3] == 1  # near end is


def _union_find_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


edge = st.tuples(
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
).filter(lambda e: e[0] != e[1])


@given(edges=st.lists(edge, min_size=1, max_size=12))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cc_matches_union_find(spark, edges):
    out = connected_components(
        spark.createDataFrame(edges, "doc_a long, doc_b long")
    )
    got = {r.node: r.cluster_id for r in out.collect()}
    assert got == _union_find_labels(edges)


def test_star_equals_label_fixture_graphs(spark):
    # Clusters + a 500-node path (the adversarial diameter the star
    # variant exists for) + a hub star + self-pair singletons, one graph.
    edges = (
        [(1, 2), (2, 3), (3, 1)]                    # triangle cluster
        + [(1000 + i, 1000 + i + 1) for i in range(499)]  # 500-node path
        + [(5000, 5000 + i) for i in range(1, 20)]  # star, hub = min
        + [(7000 + i, 6000) for i in range(1, 20)]  # star, hub = max
        + [(9001, 9001), (9002, 9002)]              # self-pair singletons
    )
    df = _pairs(spark, edges)
    label = {
        r.node: r.cluster_id
        for r in connected_components(df, algorithm="label", max_iter=600).collect()
    }
    star = {
        r.node: r.cluster_id
        for r in connected_components(df, algorithm="star", max_iter=64).collect()
    }
    assert star == label
    assert star[9001] == 9001 and star[9002] == 9002  # self-pairs kept
    assert star[1499] == 1000  # far end of the path reached


edge_loops = st.tuples(
    st.integers(min_value=0, max_value=15), st.integers(min_value=0, max_value=15)
)


@given(edges=st.lists(edge_loops, min_size=1, max_size=12))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_star_matches_label_property(spark, edges):
    # Self-loops allowed here on purpose: degenerate (x, x) pairs must
    # yield identical node coverage in both variants (r4 advice fix).
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    label = {
        r.node: r.cluster_id
        for r in connected_components(df, algorithm="label").collect()
    }
    star = {
        r.node: r.cluster_id
        for r in connected_components(df, algorithm="star").collect()
    }
    assert star == label


def test_dup_clusters_keeper_and_size(spark):
    out = dup_clusters(_pairs(spark, [(10, 11), (11, 12), (30, 31)]))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {10, 11, 12, 30, 31}
    assert rows[10].is_keeper and rows[10].cluster_size == 3
    assert not rows[11].is_keeper and rows[11].cluster_id == 10
    assert rows[30].is_keeper and rows[30].cluster_size == 2
    assert not rows[31].is_keeper and rows[31].cluster_id == 30


def test_pagerank_python_twin(spark):
    from pyspark.sql import Row

    from healthcare_aws_data_engineering_spark.operators.graph import (
        PR_DAMP_PCT,
        PR_GRID,
        pagerank,
    )

    vertices = spark.createDataFrame([Row(vec_id=i) for i in range(4)])
    edge_list = [(0, 1), (1, 2), (2, 0), (0, 2)]  # node 3 dangling
    edges = spark.createDataFrame([Row(src=s, dst=d) for s, d in edge_list])
    got = {
        r["vec_id"]: r["rank_u12"]
        for r in pagerank(vertices, edges, n_iter=3).collect()
    }
    n = 4
    base = ((100 - PR_DAMP_PCT) * PR_GRID // n) // 100
    deg = {0: 2, 1: 1, 2: 1}
    ranks = {i: PR_GRID // n for i in range(n)}
    for _ in range(3):
        contrib: dict[int, int] = {}
        for s, d in edge_list:
            contrib[d] = contrib.get(d, 0) + ranks[s] // deg[s]
        dang = sum(r for i, r in ranks.items() if i not in deg)
        ranks = {
            i: base + (PR_DAMP_PCT * (contrib.get(i, 0) + dang // n)) // 100
            for i in range(n)
        }
    assert got == ranks


def test_pagerank_mass_conserved(spark):
    from healthcare_aws_data_engineering_spark.operators.graph import (
        PR_GRID,
    )
    from healthcare_aws_data_engineering_spark.plans.analytics_queries import (
        q_graph_pagerank,
    )

    rows = q_graph_pagerank(spark, "/root/testdata/sf0.001").collect()
    total = sum(r["rank_u12"] for r in rows)
    # floor losses only: mass never grows, and per-step loss is bounded
    assert total <= PR_GRID
    assert total >= int(PR_GRID * 0.85)
    assert all(r["rank_u12"] > 0 for r in rows)
