"""Graph-algorithm tests: known-answer small graphs plus randomized
cross-checks against driver-side union-find / power iteration."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from graph_db_clustering_spark.operators.graph import Graph
from graph_db_clustering_spark.operators.graph_algos import (
    connected_components,
    degree_oriented_edges,
    pagerank,
    shortest_paths,
    triangle_count,
)


def _graph(spark, n, edge_list):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(a, b, "e") for a, b in edge_list] or [(0, 0, "e")],
        "src long, dst long, relationship string",
    )
    if not edge_list:
        e = e.limit(0)
    return Graph(v, e)


def test_connected_components_known(spark):
    # components: {0,1,2}, {3,4}, {5}
    g = _graph(spark, 6, [(0, 1), (1, 2), (3, 4)])
    got = {r.id: r.component for r in connected_components(g).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5}


def test_connected_components_random_vs_union_find(spark):
    rng = np.random.RandomState(3)
    n = 60
    edges = [
        tuple(int(x) for x in sorted(rng.choice(n, 2, replace=False))) for _ in range(45)
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # canonical label = min id per root
    members: dict[int, list[int]] = {}
    for i in range(n):
        members.setdefault(find(i), []).append(i)
    want = {i: min(ms) for ms in members.values() for i in ms}
    got = {r.id: r.component for r in connected_components(_graph(spark, n, edges)).collect()}
    assert got == want


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_pagerank_star_and_sum(spark):
    # star: 1..4 all point at 0; 0 is dangling
    g = _graph(spark, 5, [(1, 0), (2, 0), (3, 0), (4, 0)])
    ranks = {r.id: r.rank for r in pagerank(g, max_iter=40).collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)
    assert ranks[0] > ranks[1]
    assert ranks[1] == pytest.approx(ranks[2]) == pytest.approx(ranks[3])


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_pagerank_matches_power_iteration(spark):
    rng = np.random.RandomState(5)
    n = 25
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, n, (80, 2)) if a != b})
    got = {r.id: r.rank for r in pagerank(_graph(spark, n, edges), max_iter=60, tol=1e-12).collect()}
    # driver-side power iteration with the same dangling handling
    d = 0.85
    out = {i: [] for i in range(n)}
    for a, b in edges:
        out[a].append(b)
    r = np.full(n, 1.0 / n)
    for _ in range(60):
        nxt = np.full(n, (1 - d) / n)
        dangling = sum(r[i] for i in range(n) if not out[i])
        nxt += d * dangling / n
        for i in range(n):
            for j in out[i]:
                nxt[j] += d * r[i] / len(out[i])
        if np.abs(nxt - r).sum() < 1e-12:
            r = nxt
            break
        r = nxt
    for i in range(n):
        assert got[i] == pytest.approx(r[i], abs=1e-8)


def test_triangle_count_known(spark):
    # triangle 0-1-2 plus a pendant edge 2-3, plus 4-cycle 4-5-6-7 (no tri)
    edges = [(0, 1), (1, 2), (0, 2), (2, 3), (4, 5), (5, 6), (6, 7), (7, 4)]
    got = {r.id: r.triangles for r in triangle_count(_graph(spark, 8, edges)).collect()}
    assert got == {0: 1, 1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 0}


def test_triangle_count_complete_graph(spark):
    # K5: each vertex is in C(4,2) = 6 triangles
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = {r.id: r.triangles for r in triangle_count(_graph(spark, 5, edges)).collect()}
    assert got == {i: 6 for i in range(5)}


def test_triangle_count_random_vs_bruteforce(spark):
    rng = np.random.RandomState(7)
    n = 30
    edges = list({tuple(sorted((int(a), int(b)))) for a, b in rng.randint(0, n, (90, 2)) if a != b})
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {
        i: sum(
            1
            for j in adj[i]
            for k in adj[i]
            if j < k and k in adj[j]
        )
        for i in range(n)
    }
    got = {r.id: r.triangles for r in triangle_count(_graph(spark, n, edges)).collect()}
    assert got == want


def test_triangle_count_star_hub_bounded_fanout(spark):
    """VERDICT r2 item 6: on a skewed graph the degree orientation points
    every spoke INTO the hub, so the hub's wedge fan-out (oriented
    out-degree, the per-join-key task input) is 0 — not deg^2. A naive
    id-ordered orientation with hub id 0 would give out-degree 200."""
    n = 201
    star = [(0, i) for i in range(1, n)]  # hub 0, degree 200
    tri = [(1, 2)]  # one triangle 0-1-2 so counts are non-trivial
    g = _graph(spark, n, star + tri)
    out_deg = {
        r.src: r.fanout
        for r in degree_oriented_edges(g.edges)
        .groupBy("src")
        .agg(F.count("*").alias("fanout"))
        .collect()
    }
    assert 0 not in out_deg  # hub is highest-rank: zero outgoing wedge arms
    assert max(out_deg.values()) <= 2  # leaves: -> hub, plus 1->2
    got = {r.id: r.triangles for r in triangle_count(g).collect()}
    assert got[0] == 1 and got[1] == 1 and got[2] == 1
    assert sum(got.values()) == 3


def test_shortest_paths_known(spark):
    # path 0-1-2-3 plus edge 1-4; vertex 5 unreachable
    g = _graph(spark, 6, [(0, 1), (1, 2), (2, 3), (1, 4)])
    src = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.dist for r in shortest_paths(g, src).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 2, 5: None}


def test_shortest_paths_multi_source_vs_bfs(spark):
    from collections import deque

    rng = np.random.RandomState(11)
    n = 50
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, n, (70, 2)) if a != b})
    sources = [0, 7, 13]
    adj = {i: set() for i in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {i: None for i in range(n)}
    q = deque((s, 0) for s in sources)
    for s in sources:
        want[s] = 0
    while q:
        u, d = q.popleft()
        for v in adj[u]:
            if want[v] is None:
                want[v] = d + 1
                q.append((v, d + 1))
    src = spark.createDataFrame([(s,) for s in sources], "id long")
    got = {r.id: r.dist for r in shortest_paths(_graph(spark, n, edges), src).collect()}
    assert got == want


def _py_k_core(n, edge_list, k):
    """Driver-side reference peeling (ground truth for k_core)."""
    adj = {i: set() for i in range(n)}
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    alive = set(adj)
    while True:
        drop = {v for v in alive if len(adj[v] & alive) < k}
        if not drop:
            break
        alive -= drop
    return {v: len(adj[v] & alive) for v in alive}


def test_k_core_known(spark):
    """Triangle {0,1,2} plus a pendant chain 2-3-4: 2-core = the
    triangle only; 1-core drops nothing."""
    from graph_db_clustering_spark.operators.graph_algos import k_core

    g = _graph(spark, 5, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    got = {r.id: r.core_degree for r in k_core(g, k=2).collect()}
    assert got == {0: 2, 1: 2, 2: 2}
    got1 = {r.id: r.core_degree for r in k_core(g, k=1).collect()}
    assert set(got1) == {0, 1, 2, 3, 4}


def test_k_core_random_vs_reference(spark):
    from graph_db_clustering_spark.operators.graph_algos import k_core

    rng = np.random.RandomState(7)
    n = 80
    edges = list({tuple(sorted((int(a), int(b))))
                  for a, b in rng.randint(0, n, (300, 2)) if a != b})
    g = _graph(spark, n, edges)
    for k in (2, 3, 4):
        want = _py_k_core(n, edges, k)
        got = {r.id: r.core_degree for r in k_core(g, k=k).collect()}
        assert got == want, f"k={k}"


def test_k_core_empty_and_validation(spark):
    from graph_db_clustering_spark.operators.graph_algos import k_core

    g = _graph(spark, 4, [(0, 1)])
    assert k_core(g, k=2).count() == 0  # a single edge has no 2-core
    with pytest.raises(ValueError, match="k must be"):
        k_core(g, k=0)


def test_label_propagation_separates_cliques(spark):
    from graph_db_clustering_spark.operators.graph_algos import label_propagation

    def clique(ids):
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]]

    edges = clique([0, 1, 2, 3]) + clique([10, 11, 12, 13]) + [(3, 10)]
    v = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11, 12, 13]], "id long"
    )
    e = spark.createDataFrame(
        [(a, b, "e") for a, b in edges], "src long, dst long, relationship string"
    )
    got = {r.id: r.community for r in label_propagation(Graph(v, e)).collect()}
    a = {got[i] for i in (0, 1, 2)}
    b = {got[i] for i in (11, 12, 13)}
    assert len(a) == 1 and len(b) == 1
    assert a != b  # the bridge must not merge the cliques' interiors


def test_label_propagation_partitioning_invariant(spark):
    from graph_db_clustering_spark.operators.graph_algos import label_propagation

    rng = np.random.RandomState(11)
    n = 50
    edges = list({tuple(sorted((int(a), int(b))))
                  for a, b in rng.randint(0, n, (150, 2)) if a != b})
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(a, b, "e") for a, b in edges], "src long, dst long, relationship string"
    )
    r1 = {
        r.id: r.community
        for r in label_propagation(Graph(v.repartition(1), e.repartition(1))).collect()
    }
    r2 = {
        r.id: r.community
        for r in label_propagation(
            Graph(v.repartition(7, "id"), e.repartition(5, "dst"))
        ).collect()
    }
    assert r1 == r2


def test_label_propagation_isolated_vertex_keeps_own_label(spark):
    from graph_db_clustering_spark.operators.graph_algos import label_propagation

    g = _graph(spark, 3, [(0, 1)])
    got = {r.id: r.community for r in label_propagation(g).collect()}
    assert got[2] == 2
    assert got[0] == got[1]


def test_k_core_raises_instead_of_returning_unconverged_peel(spark):
    """A path graph peels two endpoints per round, so a 30-vertex path at
    k=2 needs ~15 rounds; with max_iter=3 the loop must RAISE, never
    hand back the partially peeled middle as 'the 2-core' (whose true
    value is empty)."""
    from graph_db_clustering_spark.operators.graph_algos import k_core

    n = 30
    g = _graph(spark, n, [(i, i + 1) for i in range(n - 1)])
    with pytest.raises(RuntimeError, match="did not converge"):
        k_core(g, k=2, max_iter=3)
    assert k_core(g, k=2, max_iter=30).count() == 0  # the true 2-core


def test_coreness_known(spark):
    """Triangle {0,1,2} + chain 2-3-4 + isolated 5: coreness 2 on the
    triangle, 1 on the chain tail, 0 isolated."""
    from graph_db_clustering_spark.operators.graph_algos import coreness

    g = _graph(spark, 6, [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)])
    got = {r.id: r.coreness for r in coreness(g).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1, 5: 0}


def test_coreness_random_vs_reference_peeling(spark):
    """coreness(v) must equal the largest k whose reference-peeled
    k-core contains v, on random graphs."""
    from graph_db_clustering_spark.operators.graph_algos import coreness

    rng = np.random.RandomState(13)
    n = 70
    edges = list({tuple(sorted((int(a), int(b))))
                  for a, b in rng.randint(0, n, (260, 2)) if a != b})
    g = _graph(spark, n, edges)
    got = {r.id: r.coreness for r in coreness(g).collect()}
    want = {v: 0 for v in range(n)}
    k = 1
    while True:
        core = _py_k_core(n, edges, k)
        if not core:
            break
        for v in core:
            want[v] = k
        k += 1
    assert got == want


def _graph_w(spark, n, edge_list):
    v = spark.createDataFrame([(i,) for i in range(n)], "id long")
    e = spark.createDataFrame(
        [(a, b, float(w)) for a, b, w in edge_list],
        "src long, dst long, weight double",
    )
    return Graph(v, e)


def test_weighted_sssp_known(spark):
    """Classic detour case: 0-1 weighs 10, but 0-2-1 weighs 2+3=5 — the
    weighted path wins where hop-BFS would pick the direct edge."""
    from graph_db_clustering_spark.operators.graph_algos import (
        weighted_shortest_paths,
    )

    g = _graph_w(spark, 4, [(0, 1, 10), (0, 2, 2), (2, 1, 3)])
    src = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.dist for r in weighted_shortest_paths(g, src).collect()}
    assert got == {0: 0.0, 1: 5.0, 2: 2.0, 3: None}


def test_weighted_sssp_random_vs_dijkstra(spark):
    import heapq

    from graph_db_clustering_spark.operators.graph_algos import (
        weighted_shortest_paths,
    )

    rng = np.random.RandomState(17)
    n = 60
    edges = [
        (int(a), int(b), float(w))
        for (a, b), w in zip(
            rng.randint(0, n, (200, 2)), rng.uniform(0.5, 5.0, 200)
        )
        if a != b
    ]
    # driver-side Dijkstra over the same undirected graph
    adj: dict[int, list] = {i: [] for i in range(n)}
    for a, b, w in edges:
        adj[a].append((b, w))
        adj[b].append((a, w))
    dist = {0: 0.0}
    pq = [(0.0, 0)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, float("inf")):
            continue
        for v2, w in adj[u]:
            nd = d + w
            if nd < dist.get(v2, float("inf")):
                dist[v2] = nd
                heapq.heappush(pq, (nd, v2))

    g = _graph_w(spark, n, edges)
    src = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.dist for r in weighted_shortest_paths(g, src).collect()}
    for i in range(n):
        if i in dist:
            assert got[i] == pytest.approx(dist[i], rel=1e-12)
        else:
            assert got[i] is None


def test_weighted_sssp_rejects_negative(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        weighted_shortest_paths,
    )

    g = _graph_w(spark, 2, [(0, 1, -1)])
    src = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError, match="non-negative"):
        weighted_shortest_paths(g, src)


def test_bipartite_project_known(spark):
    from graph_db_clustering_spark.operators.graph_algos import bipartite_project

    # customers x products: 1 and 2 share {p1, p2}; 3 shares p2 with both
    rows = [(1, "p1"), (1, "p2"), (2, "p1"), (2, "p2"), (3, "p2"), (3, "p3")]
    e = spark.createDataFrame(rows, "cust long, prod string")
    got = {
        (r.src, r.dst): r.common
        for r in bipartite_project(e, "cust", "prod").collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    # min_common prunes the tail
    strong = bipartite_project(e, "cust", "prod", min_common=2).collect()
    assert [(r.src, r.dst, r.common) for r in strong] == [(1, 2, 2)]


def test_bipartite_project_hub_guard(spark):
    from graph_db_clustering_spark.operators.graph_algos import bipartite_project

    # 'hub' is shared by everyone (quadratic without the guard)
    rows = [(i, "hub") for i in range(20)] + [(1, "x"), (2, "x")]
    e = spark.createDataFrame(rows, "cust long, prod string")
    guarded = bipartite_project(e, "cust", "prod", max_right_degree=5)
    got = [(r.src, r.dst, r.common) for r in guarded.collect()]
    assert got == [(1, 2, 1)]  # only the non-hub co-occurrence survives
    full = bipartite_project(e, "cust", "prod")
    assert full.count() == 20 * 19 // 2  # unguarded: the quadratic blowup


# --- harmonic centrality (round 7) -----------------------------------------


def test_harmonic_star_and_path_closed_forms(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        harmonic_centrality,
    )

    # star K1,4: center sees 4 at dist 1 -> H=4; each leaf sees center
    # at 1 and three leaves at 2 -> H = 1 + 3/2
    g = _graph(spark, 5, [(0, i) for i in range(1, 5)])
    h = {r.id: r.harmonic for r in harmonic_centrality(g).collect()}
    assert h[0] == pytest.approx(4.0)
    for leaf in range(1, 5):
        assert h[leaf] == pytest.approx(1 + 3 / 2)
    # path 0-1-2-3: ends 1 + 1/2 + 1/3, inners 1 + 1 + 1/2
    p = _graph(spark, 4, [(0, 1), (1, 2), (2, 3)])
    hp = {r.id: r.harmonic for r in harmonic_centrality(p).collect()}
    assert hp[0] == pytest.approx(1 + 1 / 2 + 1 / 3)
    assert hp[1] == pytest.approx(1 + 1 + 1 / 2)


def test_harmonic_disconnected_and_isolated(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        harmonic_centrality,
    )

    # two components + one isolate: unreachable pairs contribute 0
    g = _graph(spark, 5, [(0, 1), (2, 3)])
    h = {r.id: r.harmonic for r in harmonic_centrality(g).collect()}
    assert h[0] == h[1] == h[2] == h[3] == pytest.approx(1.0)
    assert h[4] == 0.0


def test_multi_source_bfs_landmarks_subset(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        harmonic_centrality,
        multi_source_bfs,
    )

    # cycle of 6, landmarks {0, 3}: distances are min(|i-s|, 6-|i-s|)
    g = _graph(spark, 6, [(i, (i + 1) % 6) for i in range(6)])
    lm = spark.createDataFrame([(0,), (3,)], "id long")
    d = {(r.id, r.src): r.dist for r in multi_source_bfs(g, lm).collect()}
    for i in range(6):
        for s in (0, 3):
            want = min(abs(i - s), 6 - abs(i - s))
            assert d[(i, s)] == want, (i, s)
    # landmark harmonic = sum over the 2 landmarks only
    h = {r.id: r.harmonic for r in harmonic_centrality(g, lm).collect()}
    assert h[1] == pytest.approx(1.0 + 1.0 / 2)  # d=1 to 0, d=2 to 3
    assert h[0] == pytest.approx(1.0 / 3)  # d=3 to the other landmark


def test_harmonic_partitioning_invariance(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        harmonic_centrality,
    )

    edges = [(i, (i * 7 + 3) % 40) for i in range(40)] + [
        (i, i + 1) for i in range(39)
    ]
    g1 = _graph(spark, 40, edges)
    h1 = sorted(
        (r.id, round(r.harmonic, 9))
        for r in harmonic_centrality(g1).collect()
    )
    g2 = Graph(
        g1.vertices.repartition(13), g1.edges.repartition(7, "dst")
    )
    h2 = sorted(
        (r.id, round(r.harmonic, 9))
        for r in harmonic_centrality(g2).collect()
    )
    assert h1 == h2


# --- betweenness centrality (round 7) --------------------------------------


def _brandes_reference(n, edge_list):
    """Driver-side textbook Brandes (independent of the Spark code)."""
    from collections import deque

    adj = {i: set() for i in range(n)}
    for a, b in edge_list:
        adj[a].add(b)
        adj[b].add(a)
    bc = {v: 0.0 for v in range(n)}
    for s in range(n):
        stack, preds = [], {v: [] for v in range(n)}
        sigma = {v: 0.0 for v in range(n)}
        dist = {v: -1 for v in range(n)}
        sigma[s], dist[s] = 1.0, 0
        q = deque([s])
        while q:
            v = q.popleft()
            stack.append(v)
            for w in adj[v]:
                if dist[w] < 0:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in range(n)}
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2.0 for v, x in bc.items()}


def test_betweenness_closed_forms(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        betweenness_centrality,
    )

    # path P4: [0, 2, 2, 0]; star K1,4: center C(4,2)=6; cycle C5: all 1
    p = _graph(spark, 4, [(0, 1), (1, 2), (2, 3)])
    got = {r.id: r.betweenness for r in betweenness_centrality(p).collect()}
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}
    s = _graph(spark, 5, [(0, i) for i in range(1, 5)])
    got = {r.id: r.betweenness for r in betweenness_centrality(s).collect()}
    assert got[0] == 6.0 and all(got[i] == 0.0 for i in range(1, 5))
    c = _graph(spark, 5, [(i, (i + 1) % 5) for i in range(5)])
    got = {r.id: r.betweenness for r in betweenness_centrality(c).collect()}
    assert all(v == pytest.approx(1.0) for v in got.values())


def test_betweenness_matches_reference_on_random_graph(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        betweenness_centrality,
    )

    rng = np.random.default_rng(11)
    n = 24
    edges = sorted(
        {
            (int(a), int(b)) if a < b else (int(b), int(a))
            for a, b in rng.integers(0, n, (60, 2))
            if a != b
        }
    )
    want = _brandes_reference(n, edges)
    g = _graph(spark, n, edges)
    got = {r.id: r.betweenness for r in betweenness_centrality(g).collect()}
    for v in range(n):
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_betweenness_disconnected_and_sampled_sources(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        betweenness_centrality,
    )

    # disconnected: P3 + isolate — middle of P3 carries its 1 pair
    g = _graph(spark, 4, [(0, 1), (1, 2)])
    got = {r.id: r.betweenness for r in betweenness_centrality(g).collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 0.0, 3: 0.0}
    # sampled sources: P4 with sources {0} accumulates only s=0
    # dependencies: delta_0(1)=2 (pairs (0,2),(0,3)), delta_0(2)=1 — /2
    lm = spark.createDataFrame([(0,)], "id long")
    got = {
        r.id: r.betweenness
        for r in betweenness_centrality(
            _graph(spark, 4, [(0, 1), (1, 2), (2, 3)]), sources=lm
        ).collect()
    }
    assert got == {0: 0.0, 1: 1.0, 2: 0.5, 3: 0.0}


def test_closeness_and_eccentricity_closed_forms(spark):
    from graph_db_clustering_spark.operators.graph_algos import (
        closeness_centrality,
    )

    # star K1,4: center sum=4 ecc=1 -> closeness 1.0; leaf sum=1+3*2=7
    g = _graph(spark, 5, [(0, i) for i in range(1, 5)])
    got = {r.id: r for r in closeness_centrality(g).collect()}
    assert got[0].closeness == pytest.approx(1.0)
    assert got[0].eccentricity == 1
    for leaf in range(1, 5):
        assert got[leaf].closeness == pytest.approx(4 / 7)
        assert got[leaf].eccentricity == 2
    # isolate in a disconnected graph
    d = _graph(spark, 3, [(0, 1)])
    got = {r.id: r for r in closeness_centrality(d).collect()}
    assert got[2].closeness == 0.0 and got[2].eccentricity == 0
    assert got[0].reached == 2  # its own component only


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_personalized_pagerank_matches_power_iteration(spark):
    """PPR vs a driver-side power iteration with teleport-to-seeds and
    dangling-to-seeds on a random directed graph (round 7)."""
    from graph_db_clustering_spark.operators.graph_algos import (
        personalized_pagerank,
    )

    rng = np.random.RandomState(9)
    n = 20
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, n, (60, 2)) if a != b})
    seeds = [0, 3, 7]
    g = _graph(spark, n, edges)
    sdf = spark.createDataFrame([(s,) for s in seeds], "id long")
    got = {
        r.id: r.rank
        for r in personalized_pagerank(g, sdf, max_iter=80, tol=1e-13).collect()
    }
    d, s = 0.85, len(seeds)
    out = {i: [] for i in range(n)}
    for a, b in edges:
        out[a].append(b)
    r = np.zeros(n)
    r[seeds] = 1.0 / s
    for _ in range(80):
        nxt = np.zeros(n)
        dangling = sum(r[i] for i in range(n) if not out[i])
        nxt[seeds] += (1 - d) / s + d * dangling / s
        for i in range(n):
            for j in out[i]:
                nxt[j] += d * r[i] / len(out[i])
        r = nxt
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for i in range(n):
        assert got[i] == pytest.approx(r[i], abs=1e-9), i


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_personalized_pagerank_confines_mass_to_seed_component(spark):
    """Two disconnected triangles; seeds in the first: the second holds
    exact 0.0 — the property that separates PPR from global PageRank."""
    from graph_db_clustering_spark.operators.graph_algos import (
        personalized_pagerank,
    )

    tri = lambda o: [(o, o + 1), (o + 1, o + 2), (o + 2, o)]
    g = _graph(spark, 6, tri(0) + tri(3))
    sdf = spark.createDataFrame([(0,)], "id long")
    got = {r.id: r.rank for r in personalized_pagerank(g, sdf, max_iter=40).collect()}
    assert got[3] == got[4] == got[5] == 0.0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank(g, sdf.filter(F.col("id") > 99)).collect()


def test_clustering_coefficient_known_shapes(spark):
    """Triangle + pendant: the triangle's corners have C = 1 except the
    one carrying the pendant (deg 3, 1 triangle -> 1/3); the pendant and
    any square's corners are 0 (open wedges only)."""
    from graph_db_clustering_spark.operators.graph_algos import (
        local_clustering_coefficient,
    )

    g = _graph(spark, 4, [(0, 1), (1, 2), (2, 0), (2, 3)])
    got = {r.id: r for r in local_clustering_coefficient(g).collect()}
    assert got[0].clustcoef == 1.0 and got[1].clustcoef == 1.0
    assert abs(got[2].clustcoef - 1 / 3) < 1e-12 and got[2].degree == 3
    assert got[3].clustcoef == 0.0 and got[3].degree == 1
    sq = _graph(spark, 4, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert all(
        r.clustcoef == 0.0 for r in local_clustering_coefficient(sq).collect()
    )


def test_modularity_two_triangles_closed_form(spark):
    """Two disjoint triangles partitioned by triangle: m = 6, each
    community has m_c = 3, d_c = 6 -> Q = 2 * (3/6 - (6/12)^2) = 0.5;
    merging everything into ONE community gives exactly 0 (one term,
    m_c = m, d_c = 2m)."""
    from graph_db_clustering_spark.operators.graph_algos import modularity

    g = _graph(spark, 6, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)])
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, community long"
    )
    assert abs(modularity(g, labels).first().modularity - 0.5) < 1e-12
    one = spark.createDataFrame([(i, 0) for i in range(6)], "id long, community long")
    assert abs(modularity(g, one).first().modularity - 0.0) < 1e-12


def test_assortativity_star_is_minus_one(spark):
    """A star graph is perfectly disassortative: every edge joins the
    hub (deg n-1) to a leaf (deg 1) -> corr = -1. A cycle has constant
    degree -> corr undefined (null)."""
    from graph_db_clustering_spark.operators.graph_algos import (
        degree_assortativity,
    )

    star = _graph(spark, 5, [(0, i) for i in range(1, 5)])
    assert abs(degree_assortativity(star).first().assortativity + 1.0) < 1e-12
    cyc = _graph(spark, 4, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert degree_assortativity(cyc).first().assortativity is None


@pytest.mark.slow  # >=10 s (r15 tiering)
def test_louvain_separates_bridged_cliques(spark):
    """Two 4-cliques joined by one bridge: Louvain must keep them as two
    communities (merging across the bridge lowers Q), label each by its
    minimum member id, and IMPROVE modularity vs the singleton
    partition."""
    from graph_db_clustering_spark.operators.graph_algos import (
        louvain,
        modularity,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = clique([0, 1, 2, 3]) + clique([4, 5, 6, 7]) + [(3, 4)]
    g = _graph(spark, 8, edges)
    got = {r.id: r.community for r in louvain(g).collect()}
    assert {got[i] for i in (0, 1, 2, 3)} == {0}
    assert {got[i] for i in (4, 5, 6, 7)} == {4}
    labels = spark.createDataFrame(
        [(i, c) for i, c in got.items()], "id long, community long"
    )
    singleton = spark.createDataFrame(
        [(i, i) for i in range(8)], "id long, community long"
    )
    q_l = modularity(g, labels).first().modularity
    q_s = modularity(g, singleton).first().modularity
    assert q_l > q_s


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_louvain_contraction_merges_ring_of_cliques(spark):
    """The contraction level must do real work: on a ring of 12
    triangles joined by single bridges, phase 1 resolves exactly the 12
    triangles (Q = 2/3), and merging ADJACENT triangle pairs only pays
    at this ring size (dQ = 1/4m - 2/nt^2 > 0 for nt > 8) — a merge
    only the CONTRACTED level can see. Pin: max_levels=1 yields 12
    intact triangles; max_levels=3 coarsens to 6 pair-communities with
    strictly higher Q and every triangle still intact (the down-map
    composed correctly)."""
    from graph_db_clustering_spark.operators.graph_algos import (
        louvain,
        modularity,
    )

    tris = [[3 * k, 3 * k + 1, 3 * k + 2] for k in range(12)]
    edges = []
    for t in tris:
        edges += [(t[0], t[1]), (t[1], t[2]), (t[0], t[2])]
    for k in range(12):
        edges.append((tris[k][2], tris[(k + 1) % 12][0]))
    g = _graph(spark, 36, edges)

    def run(levels):
        got = {r.id: r.community for r in louvain(g, max_levels=levels).collect()}
        labels = spark.createDataFrame(
            [(i, c) for i, c in got.items()], "id long, community long"
        )
        return got, modularity(g, labels).first().modularity

    got1, q1 = run(1)
    assert len(set(got1.values())) == 12
    assert abs(q1 - 2 / 3) < 1e-9
    got3, q3 = run(3)
    assert len(set(got3.values())) == 6
    assert q3 > q1
    for t in tris:
        assert len({got3[i] for i in t}) == 1, (t, got3)


@pytest.mark.slow  # >=15 s (r15 tiering)
def test_louvain_partitioning_invariant(spark):
    """Same graph, hostile repartition -> identical communities (the
    move rule is argmin over a struct with deterministic tie-break;
    nothing depends on row order)."""
    from graph_db_clustering_spark.operators.graph_algos import louvain

    rng = np.random.default_rng(8)
    edges = list(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, 30, size=(120, 2))
            if a < b
        }
    )
    g1 = _graph(spark, 30, edges)
    base = {r.id: r.community for r in louvain(g1).collect()}
    v2 = spark.createDataFrame([(i,) for i in range(30)], "id long").repartition(7)
    e2 = (
        spark.createDataFrame(
            [(a, b, "e") for a, b in edges],
            "src long, dst long, relationship string",
        )
        .repartition(11)
    )
    got = {r.id: r.community for r in louvain(Graph(v2, e2)).collect()}
    assert got == base


def test_link_prediction_known_path_and_hub_guard(spark):
    """Path 0-1-2-3: candidates are (0,2) and (1,3), each with 1 common
    neighbor; Jaccard = 1/(d0+d2-1). With max_center_degree=1 every
    wedge center (degree 2) is dropped -> empty. A hub star's leaf
    pairs all appear without the guard."""
    from graph_db_clustering_spark.operators.graph_algos import (
        common_neighbor_link_prediction,
    )

    path = _graph(spark, 4, [(0, 1), (1, 2), (2, 3)])
    got = {
        (r.x, r.y): (r.common, round(r.jaccard, 6))
        for r in common_neighbor_link_prediction(path).collect()
    }
    assert got == {(0, 2): (1, 0.5), (1, 3): (1, 0.5)}
    assert (
        common_neighbor_link_prediction(path, max_center_degree=1).count() == 0
    )
    star = _graph(spark, 5, [(0, i) for i in range(1, 5)])
    leaves = common_neighbor_link_prediction(star).collect()
    assert len(leaves) == 6  # C(4,2) leaf pairs through the hub
    assert all(r.common == 1 and abs(r.jaccard - 1.0) < 1e-12 for r in leaves)
    assert common_neighbor_link_prediction(star, max_center_degree=3).count() == 0


def test_conductance_known_cut(spark):
    """Two triangles joined by one bridge, partitioned by triangle:
    2m = 14, each community vol = 7, cut = 1 -> phi = 1/7. The
    all-in-one partition spans the full volume -> NULL conductance."""
    from graph_db_clustering_spark.operators.graph_algos import conductance

    g = _graph(spark, 6, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)])
    labels = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, community long"
    )
    got = {r.community: r for r in conductance(g, labels).collect()}
    for c in (0, 1):
        assert got[c].vol == 7 and got[c].cut == 1
        assert abs(got[c].conductance - 1 / 7) < 1e-12
    one = spark.createDataFrame([(i, 0) for i in range(6)], "id long, community long")
    r = conductance(g, one).first()
    assert r.cut == 0 and r.conductance is None


def test_square_count_codegree_identity(spark):
    """A plain 4-cycle has exactly 1 square; K4 has 3 (each pair of
    disjoint edges closes one); a path has 0 — computed via the
    co-degree identity the graph_squares entry uses."""
    from graph_db_clustering_spark.operators.graph_algos import _undirected_edges

    def squares(n, edges):
        g = _graph(spark, n, edges)
        und = _undirected_edges(g.edges)
        c = und.select(F.col("b").alias("w"), F.col("a").alias("x"))
        codeg = (
            c.join(c.select("w", F.col("x").alias("y")), "w")
            .filter(F.col("x") < F.col("y"))
            .groupBy("x", "y")
            .agg(F.count("*").alias("cn"))
        )
        r = codeg.agg(
            (F.sum(F.col("cn") * (F.col("cn") - 1) / 2) / 2).alias("s")
        ).first()
        return r.s or 0.0

    assert squares(4, [(0, 1), (1, 2), (2, 3), (3, 0)]) == 1.0
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert squares(4, k4) == 3.0
    assert squares(4, [(0, 1), (1, 2), (2, 3)]) == 0.0


def test_convergence_probes_on_edgeless_graph(spark):
    """r14 focused test: every iterative loop now detects convergence
    from an inline change flag on the update frame (no new-vs-old join).
    An edgeless graph is the flag's all-NULL path — no vertex ever
    receives a message, so the very first probe must read "no change"
    and each algorithm must return its fixpoint immediately (identity
    labels / NULL distances / uniform dangling-only ranks)."""
    from graph_db_clustering_spark.operators.graph_algos import (
        coreness,
        label_propagation,
        weighted_shortest_paths,
    )

    g = _graph(spark, 4, [])
    comp = {r.id: r.component for r in connected_components(g).collect()}
    assert comp == {i: i for i in range(4)}
    lab = {r.id: r.community for r in label_propagation(g).collect()}
    assert lab == {i: i for i in range(4)}
    cores = {r.id: r.coreness for r in coreness(g).collect()}
    assert cores == {i: 0 for i in range(4)}
    src = spark.createDataFrame([(0,)], "id long")
    d = {r.id: r.dist for r in shortest_paths(g, src).collect()}
    assert d == {0: 0, 1: None, 2: None, 3: None}
    wsrc = spark.createDataFrame([(0,)], "id long")
    wg = Graph(
        g.vertices,
        spark.createDataFrame([], "src long, dst long, weight double"),
    )
    wd = {r.id: r.dist for r in weighted_shortest_paths(wg, wsrc).collect()}
    assert wd == {0: 0.0, 1: None, 2: None, 3: None}
    # all-dangling pagerank: every iteration redistributes the whole mass
    # uniformly, so ranks are exactly 1/n and the fused delta+dangling
    # aggregate must stop the loop after one iteration
    ranks = {r.id: r.rank for r in pagerank(g, max_iter=10).collect()}
    for i in range(4):
        assert ranks[i] == pytest.approx(0.25, abs=1e-12)
