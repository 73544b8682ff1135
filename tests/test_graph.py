"""Connected components + canonical-doc selection (stages/graph.py)."""

import pytest
import ray.data as rd


def _pairs(items):
    return rd.from_items([{"a": a, "b": b} for a, b in items])


@pytest.mark.usefixtures("ray_session")
class TestConnectedComponents:
    def test_transitive_closure(self):
        from vigil_ray.stages.graph import connected_components

        comp = connected_components(_pairs([(1, 2), (2, 3), (10, 11), (3, 1)]))
        got = {r["node"]: r["component"] for r in comp.take_all()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_path_graph_converges_to_one_component(self, monkeypatch):
        """A length-10 chain needs ~5 propagation rounds — exercises the
        DISTRIBUTED iteration loop (gate forced to 0), not just the
        driver union-find fast path."""
        import vigil_ray.stages.graph as graph_mod

        monkeypatch.setattr(graph_mod, "_MAX_DRIVER_CC_PAIRS", 0)
        comp = graph_mod.connected_components(_pairs([(i, i + 1) for i in range(9)]))
        rows = comp.take_all()
        assert len(rows) == 10
        assert {r["component"] for r in rows} == {0}

    def test_fast_path_equals_distributed(self, monkeypatch):
        """The driver union-find fast path and the distributed min-label
        loop must label identically (random-ish graph with chains, a
        clique, and singleton pairs)."""
        import vigil_ray.stages.graph as graph_mod

        edges = (
            [(i, i + 1) for i in range(0, 8)]
            + [(20, 21), (21, 22), (20, 22)]
            + [(30, 31), (40, 41)]
            + [(50, 3)]
        )
        fast = {
            r["node"]: r["component"]
            for r in graph_mod.connected_components(_pairs(edges)).take_all()
        }
        monkeypatch.setattr(graph_mod, "_MAX_DRIVER_CC_PAIRS", 0)
        dist = {
            r["node"]: r["component"]
            for r in graph_mod.connected_components(_pairs(edges)).take_all()
        }
        assert fast == dist

    def test_empty_pairs(self):
        from vigil_ray.stages.graph import connected_components

        empty = _pairs([(1, 2)]).filter(lambda r: False)
        comp = connected_components(empty)
        assert comp.count() == 0

    def test_null_ids_and_mixed_types_fast_path(self):
        """Null pair ids drop (no TypeError in the driver fold) and an
        int32 a_col with an int64 b_col promotes to one int64 output type."""
        import pyarrow as pa
        import ray.data as rd

        from vigil_ray.stages.graph import connected_components

        t = pa.table(
            {
                "a": pa.array([1, 2, None, 10], pa.int32()),
                "b": pa.array([2, 3, 5, None], pa.int64()),
            }
        )
        comp = connected_components(rd.from_arrow(t))
        got = {r["node"]: r["component"] for r in comp.take_all()}
        assert got == {1: 1, 2: 1, 3: 1}
        sch = comp.schema()
        assert sch.names == ["node", "component"]
        assert sch.types == [pa.int64(), pa.int64()]

    def test_max_iters_guard_is_loud(self, monkeypatch):
        import vigil_ray.stages.graph as graph_mod

        monkeypatch.setattr(graph_mod, "_MAX_DRIVER_CC_PAIRS", 0)
        with pytest.raises(RuntimeError, match="did not converge"):
            graph_mod.connected_components(
                _pairs([(i, i + 1) for i in range(9)]), max_iters=2
            )


@pytest.mark.usefixtures("ray_session")
class TestCanonicalDocs:
    def test_keep_best_per_cluster_plus_singletons(self):
        from vigil_ray.stages.graph import canonical_docs, connected_components

        comp = connected_components(_pairs([(1, 2), (2, 3), (10, 11)]))
        docs = rd.from_items(
            [
                {"doc_id": i, "score": float(s)}
                for i, s in [(1, 5), (2, 9), (3, 9), (10, 1), (11, 2), (20, 0), (21, 7)]
            ]
        )
        kept = canonical_docs(docs, comp, id_col="doc_id", score_col="score")
        # cluster {1,2,3}: max score 9 tie → min id 2; {10,11}: keep 11;
        # 20/21 untouched
        assert sorted(r["doc_id"] for r in kept.take_all()) == [2, 11, 20, 21]


@pytest.mark.usefixtures("ray_session")
class TestPagerank:
    def test_matches_single_process_simulator(self):
        import ray.data as rd

        from vigil_ray.stages.graph import pagerank

        n = 60
        nodes = [{"node": i} for i in range(n)]
        edges = []
        for k in range(n):
            edges.append({"src": k, "dst": (3 * k + 1) % n})
            edges.append({"src": k, "dst": (7 * k + 2) % n})
            if k % 5 == 0:  # non-uniform out-degree exercises the deg join
                edges.append({"src": k, "dst": (k + 9) % n})
        out = (
            pagerank(
                rd.from_items(nodes).repartition(5),
                rd.from_items(edges).repartition(7),
                iters=3,
            )
            .to_pandas()
            .sort_values("node")
            .reset_index(drop=True)
        )
        # integer-exact reference simulator (same floors, same damping split)
        total = 10**12
        base = total // n
        tel = (15 * base) // 100
        deg = {}
        for e in edges:
            deg[e["src"]] = deg.get(e["src"], 0) + 1
        r = {i: base for i in range(n)}
        for _ in range(3):
            s = {i: 0 for i in range(n)}
            for e in edges:
                s[e["dst"]] += r[e["src"]] // deg[e["src"]]
            r = {i: tel + (85 * s[i]) // 100 for i in range(n)}
        assert dict(zip(out["node"], out["rank_micro"])) == r
        # damped mass stays below the teleport+damping ceiling
        assert out["rank_micro"].sum() <= total


@pytest.mark.usefixtures("ray_session")
class TestUnionFindProperty:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=25),
                st.integers(min_value=0, max_value=25),
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[
            HealthCheck.too_slow,
            HealthCheck.function_scoped_fixture,
        ],
    )
    def test_fast_path_matches_reachability_closure(self, edges):
        """Union-find fast path vs a naive transitive-closure reference:
        every node labeled with the min id reachable from it (self-loops
        and duplicate edges included in the strategy's range)."""
        from vigil_ray.stages.graph import connected_components

        got = {
            r["node"]: r["component"]
            for r in connected_components(_pairs(edges)).take_all()
        }
        # reference: iterate min-label to fixpoint over the adjacency
        nodes = sorted({x for e in edges for x in e})
        adj = {n: {n} for n in nodes}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        label = {n: n for n in nodes}
        changed = True
        while changed:
            changed = False
            for n in nodes:
                m = min(label[x] for x in adj[n])
                if m < label[n]:
                    label[n] = m
                    changed = True
        assert got == label
