"""Property-based tests (hypothesis): batched kernels vs independent scalar
oracles on adversarial random inputs, and connected components vs a pure-
Python union-find on random graphs."""

import string

from hypothesis import given, settings, strategies as st

from entity_matching_spark.functions.similarity import (
    jaro_winkler_batch,
    jaro_winkler_scalar,
    levenshtein_batch,
    token_jaccard_batch,
)

TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " '-éüßø",
    max_size=24,
)


def _lev_oracle(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


class TestKernelProperties:
    @given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=40))
    @settings(max_examples=150, deadline=None)
    def test_jw_batch_matches_scalar(self, pairs):
        a = [x for x, _ in pairs]
        b = [y for _, y in pairs]
        got = jaro_winkler_batch(a, b)
        for (x, y), g in zip(pairs, got):
            assert abs(g - jaro_winkler_scalar(x, y)) < 1e-12, (x, y)

    @given(st.lists(st.tuples(TEXT, TEXT), min_size=1, max_size=30))
    @settings(max_examples=100, deadline=None)
    def test_levenshtein_batch_matches_dp_oracle(self, pairs):
        a = [x for x, _ in pairs]
        b = [y for _, y in pairs]
        got = levenshtein_batch(a, b)
        for (x, y), g in zip(pairs, got):
            assert g == _lev_oracle(x, y), (x, y)

    @given(TEXT, TEXT)
    @settings(max_examples=200, deadline=None)
    def test_jw_symmetry_and_bounds(self, a, b):
        f = jaro_winkler_batch([a, b], [b, a])
        assert abs(f[0] - f[1]) < 1e-12
        assert 0.0 <= f[0] <= 1.0
        if a == b:
            assert f[0] == 1.0

    @given(TEXT, TEXT)
    @settings(max_examples=100, deadline=None)
    def test_token_jaccard_bounds(self, a, b):
        j = token_jaccard_batch([a], [b])[0]
        assert 0.0 <= j <= 1.0
        assert token_jaccard_batch([b], [a])[0] == j


class TestConnectedComponentsOracle:
    def test_random_graph_vs_union_find(self, spark):
        """S6 large-star/small-star vs a pure-Python union-find on a random
        (seeded) graph with isolated chains, stars, and dense blobs."""
        import random

        from entity_matching_spark.operators.cluster import connected_components

        rng = random.Random(12345)
        nodes = [f"n{i:04d}" for i in range(600)]
        edges = [
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(700)
        ] + [(f"c{i:03d}", f"c{i+1:03d}") for i in range(50)]

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        def union(x, y):
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[max(rx, ry)] = min(rx, ry)

        for a, b in edges:
            if a != b:
                union(a, b)
        expected = {
            x: find(x) for x in parent
        }
        # canonicalize: representative = min member of each component
        comp_members: dict[str, list] = {}
        for x, r in expected.items():
            comp_members.setdefault(find(r), []).append(x)
        truth = {}
        for members in comp_members.values():
            m = min(members)
            for x in members:
                truth[x] = m

        df = spark.createDataFrame(
            [(a, b) for a, b in edges if a != b], ["conv_id_a", "conv_id_b"]
        )
        got = {r["conv_id"]: r["cluster_id"] for r in connected_components(df).collect()}
        assert got == truth
