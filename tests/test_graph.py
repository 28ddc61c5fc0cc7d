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
