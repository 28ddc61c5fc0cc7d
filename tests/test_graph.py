"""Graph-algorithm correctness beyond the SQL oracle: PageRank
against an independent dense numpy power-iteration reference on
random sparse graphs."""

from __future__ import annotations


def test_pagerank_matches_numpy_reference_on_random_graphs(spark):
    import numpy as np

    from maston_spark.graph import pagerank

    rng = np.random.default_rng(11)
    for trial in range(3):
        n = int(rng.integers(8, 20))
        # random sparse digraph; ensure every node has an out-edge so
        # the no-dangling contract holds (the operator documents it)
        edges = set()
        for s in range(n):
            for d in rng.choice(n, size=int(rng.integers(1, 4)), replace=False):
                if s != d:
                    edges.add((s, int(d)))
        # every node must appear (as src or dst); add a cycle edge if not
        present = {x for e in edges for x in e}
        for s in range(n):
            if s not in present:
                edges.add((s, (s + 1) % n))
        # also give dst-only nodes an out-edge
        srcs = {e[0] for e in edges}
        for s in ({x for e in edges for x in e} - srcs):
            edges.add((s, (s + 1) % n))
        elist = sorted(edges)

        # ---- numpy reference replicating the operator's exact
        # fixed-point arithmetic (round-9 contributions, exact sums)
        nodes = sorted({x for e in elist for x in e})
        idx = {v: i for i, v in enumerate(nodes)}
        nn = len(nodes)
        deg = np.zeros(nn)
        for s, d in elist:
            deg[idx[s]] += 1
        base = round(0.15 / nn, 9)
        r = np.full(nn, round(1.0 / nn, 9))
        iters = 4
        for _ in range(iters):
            acc = np.zeros(nn)
            for s, d in elist:
                acc[idx[d]] += round(0.85 * r[idx[s]] / deg[idx[s]], 9)
            r = np.array([round(base + a, 9) for a in acc])
        expected = {v: round(float(r[idx[v]]), 6) for v in nodes}

        df = spark.createDataFrame(elist, "src long, dst long")
        got = {x.node: x.rank for x in pagerank(df, iterations=iters).collect()}
        assert got == expected, (trial, got, expected)


def test_triangle_stats_golden(spark):
    from maston_spark.graph import triangle_stats

    # 4-cycle with the 1-3 chord: triangles {1,2,3} and {1,3,4};
    # degrees 3,2,3,2 -> wedges C(3,2)*2 + C(2,2=1)*2 = 8.
    # Includes a reversed duplicate (2,1) to prove canonicalization.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3), (2, 1)],
        "id_a long, id_b long",
    )
    r = triangle_stats(edges).collect()[0]
    assert r.n_edges == 5
    assert r.n_wedges == 8
    assert r.n_triangles == 2
    assert r.transitivity == 0.75

    # triangle-free graph (a path): zero triangles, defined wedges
    path = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    r = triangle_stats(path).collect()[0]
    assert r.n_triangles == 0 and r.n_wedges == 1 and r.transitivity == 0.0

    # no wedges at all -> transitivity is NULL, not a division error
    single = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = triangle_stats(single).collect()[0]
    assert r.n_wedges == 0 and r.transitivity is None


def test_hits_hand_case_mutual_reinforcement(spark):
    """Two strong hubs pointing at {10,11} vs one weak hub at 12:
    after 2 max-normalized iterations the co-cited pair holds
    authority 1.0 and the singleton decays to 0.125; hubs mirror
    (1, 1, 0.0625). Exact: every fold is DECIMAL(28,9), every
    normalize a round-9 quotient."""
    from maston_spark.graph import hits

    edges = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 12)], "src int, dst int"
    )
    out = {r.node: r for r in hits(edges, iterations=2).collect()}
    assert out[10].authority == 1.0 and out[11].authority == 1.0
    assert out[12].authority == 0.125
    assert out[1].hub == 1.0 and out[2].hub == 1.0
    assert out[3].hub == 0.0625
    # sources never gain authority, sinks never gain hub mass
    assert out[1].authority == 0.0 and out[10].hub == 0.0


def test_k_core_hand_case_peels_pendant_then_converges(spark):
    """Triangle {1,2,3} plus a pendant chain 3-4-5: the 2-core must
    peel vertex 5 (degree 1) in round 1, then 4 (its degree fell to
    1) in round 2, and hold the triangle from round 3 on — the
    cascade no single degree cutoff reproduces. Edges arrive in both
    orientations + a self-loop to pin canonicalization."""
    from maston_spark.graph import k_core

    edges = spark.createDataFrame(
        [
            (1, 2), (2, 3), (3, 1),
            (3, 4), (4, 3),  # duplicate in the other orientation
            (4, 5),
            (5, 5),  # self-loop: dropped
        ],
        "src long, dst long",
    )
    out = k_core(edges, k=2, rounds=4).collect()
    assert [(r.round, r.n_vertices, r.n_edges, r.converged) for r in out] == [
        (1, 4, 4, False),   # 5 peeled, edge 4-5 gone
        (2, 3, 3, False),   # 4 peeled (degree fell to 1)
        (3, 3, 3, True),    # triangle is the 2-core
        (4, 3, 3, True),
    ]


def test_k_core_collapse_to_empty(spark):
    """A path graph has no 2-core: the census must collapse to the
    empty graph and report converged zero rows, not error."""
    from maston_spark.graph import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    out = k_core(edges, k=2, rounds=3).collect()
    assert [(r.n_vertices, r.n_edges) for r in out] == [(2, 1), (0, 0), (0, 0)]
    assert [r.converged for r in out] == [False, False, True]
