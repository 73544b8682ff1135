"""KMV distinct-count sketch: accuracy, mergeability, exact-below-k."""

import numpy as np
import pytest

from vigil_ray.stages.sketches import kmv_estimate, kmv_hash


class TestKernel:
    def test_exact_below_k(self):
        hs = np.sort(np.array([kmv_hash(i) for i in range(40)]))
        assert kmv_estimate(hs, 64) == 40.0

    def test_accuracy_bound(self):
        # stderr ~ 1/sqrt(k-2) ≈ 12.7% at k=64; assert a loose 3-sigma bound
        for n in (1000, 10000, 50000):
            hs = np.sort(np.array([kmv_hash(i) for i in range(n)]))
            est = kmv_estimate(hs[:64], 64)
            assert abs(est - n) / n < 0.4, (n, est)

    def test_merge_is_k_smallest_of_union(self):
        a = sorted({kmv_hash(i) for i in range(0, 500)})[:64]
        b = sorted({kmv_hash(i) for i in range(250, 750)})[:64]
        merged = sorted(set(a) | set(b))[:64]
        full = sorted({kmv_hash(i) for i in range(0, 750)})[:64]
        # overlapping partials merge to the true global k-smallest only when
        # every global k-smallest hash appears in some partial's top-k —
        # guaranteed because each partial keeps ITS k smallest
        assert merged == full


@pytest.mark.usefixtures("ray_session")
def test_kmv_stage_matches_single_process():
    import ray.data as rd

    from vigil_ray.stages.sketches import kmv_distinct

    items = [{"k": f"key{i % 300}"} for i in range(5000)]
    out = kmv_distinct(rd.from_items(items).repartition(8), "k", k=64).to_pandas()
    hs = np.sort(np.array([kmv_hash(f"key{i}") for i in range(300)]))
    expected = round(kmv_estimate(hs[:64], 64), 6)
    assert out["n_distinct_est"].iloc[0] == expected
    # and the estimate is in the right ballpark of the true 300
    assert abs(expected - 300) / 300 < 0.4


class TestKmvSetOps:
    def test_small_sets_exact_and_inclusion_exclusion(self, ray_session):
        import ray.data as rd

        from vigil_ray.stages.sketches import kmv_two_set

        rows = (
            [{"u": i, "t": "a"} for i in range(30)]
            + [{"u": i, "t": "b"} for i in range(20, 50)]
            + [{"u": 99, "t": "c"}]  # other types ignored
        )
        out = kmv_two_set(
            rd.from_items(rows).repartition(4), "u", "t", "a", "b", k=64
        ).to_pandas()
        # under k distinct → sketches are exact sets
        assert out["est_a"].iloc[0] == 30.0
        assert out["est_b"].iloc[0] == 30.0
        assert out["est_union"].iloc[0] == 50.0
        assert out["est_intersection"].iloc[0] == 10.0


@pytest.mark.usefixtures("ray_session")
def test_kmv_grouped_matches_per_group_simulation():
    import ray.data as rd

    from vigil_ray.stages.sketches import kmv_estimate, kmv_grouped, kmv_hash

    rows = [
        {"g": "small", "uid": i % 10} for i in range(200)
    ] + [
        {"g": "big", "uid": i % 300} for i in range(600)
    ]
    out = (
        kmv_grouped(rd.from_items(rows).repartition(4), "uid", "g", k=64)
        .to_pandas()
        .set_index("g")["n_distinct_est"]
    )
    assert out["small"] == 10.0  # below k: exact
    hs = np.sort(np.array(sorted({kmv_hash(i % 300) for i in range(600)})[:64]))
    assert out["big"] == round(kmv_estimate(hs, 64), 6)


@pytest.mark.usefixtures("ray_session")
class TestCountMin:
    def test_matches_single_process_and_upper_bounds(self):
        import collections

        import ray.data as rd

        from vigil_ray.stages.sketches import cms_hash, cms_point_counts

        depth, width = 4, 64
        vals = [i % 37 for i in range(4000)] + [5] * 500
        true = collections.Counter(vals)
        out = cms_point_counts(
            rd.from_items([{"u": v} for v in vals]).repartition(7),
            "u",
            probe_keys=range(10),
            depth=depth,
            width=width,
        ).to_pandas()
        # single-process reference sketch
        mat = np.zeros((depth, width), dtype=np.int64)
        for v, c in true.items():
            for j in range(depth):
                mat[j, cms_hash(j, v) % width] += c
        for _, row in out.iterrows():
            k = int(row["u"])
            expect = min(int(mat[j, cms_hash(j, k) % width]) for j in range(depth))
            assert int(row["est_count"]) == expect
            # CMS never underestimates
            assert int(row["est_count"]) >= true.get(k, 0)

    def test_merge_is_elementwise_sum(self):
        # two disjoint halves sketched separately must equal the whole:
        # folding is additive, so any block partitioning agrees
        import ray.data as rd

        from vigil_ray.stages.sketches import cms_point_counts

        vals = list(range(300)) * 3
        whole = cms_point_counts(
            rd.from_items([{"u": v} for v in vals]).repartition(2),
            "u",
            probe_keys=range(5),
        ).to_pandas()
        again = cms_point_counts(
            rd.from_items([{"u": v} for v in vals]).repartition(11),
            "u",
            probe_keys=range(5),
        ).to_pandas()
        assert whole.equals(again)


class TestHllKernel:
    def test_parts_bit_layout(self):
        from vigil_ray.stages.sketches import hll_parts

        idx, rho = hll_parts(42)
        assert 0 <= idx < 64 and 1 <= rho <= 59

    def test_estimate_accuracy(self):
        # stderr ~ 1.04/sqrt(64) = 13%; assert a loose 3-sigma bound
        import numpy as np

        from vigil_ray.stages.sketches import hll_estimate, hll_parts

        for n in (100, 2000, 50000):
            regs = np.zeros(64, dtype=np.int64)
            for i in range(n):
                idx, rho = hll_parts(i)
                regs[idx] = max(regs[idx], rho)
            est = hll_estimate(regs)
            assert abs(est - n) / n < 0.4, (n, est)


@pytest.mark.usefixtures("ray_session")
def test_hll_stage_matches_single_process():
    import numpy as np
    import ray.data as rd

    from vigil_ray.stages.sketches import hll_distinct, hll_estimate, hll_parts

    items = [{"k": f"key{i % 700}"} for i in range(6000)]
    out = hll_distinct(rd.from_items(items).repartition(9), "k").to_pandas()
    regs = np.zeros(64, dtype=np.int64)
    for i in range(700):
        idx, rho = hll_parts(f"key{i}")
        regs[idx] = max(regs[idx], rho)
    assert out["n_distinct_est"][0] == round(hll_estimate(regs), 6)
