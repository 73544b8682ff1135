"""Skew-aware join: result equals a plain inner join on skewed data, hot
path actually exercised."""

import pandas as pd
import pytest


@pytest.mark.usefixtures("ray_session")
class TestSkewJoin:
    def _data(self):
        import ray.data as rd

        # one celebrity key (0) carries half the fact rows; keys 900+ have
        # no dimension row (inner-join drops); dim 777 has no fact rows
        fact = [{"k": 0, "x": i} for i in range(500)] + [
            {"k": 1 + (i % 950), "x": i} for i in range(500)
        ]
        dim = [{"dk": j, "label": f"d{j}"} for j in range(900)] + [
            {"dk": 777_000, "label": "unmatched"}
        ]
        return (
            rd.from_items(fact).repartition(7),
            rd.from_items(dim).repartition(3),
            fact,
            dim,
        )

    def test_equals_plain_join(self):
        from vigil_ray.stages.joins import skew_join

        fact_ds, dim_ds, fact, dim = self._data()
        out = (
            skew_join(fact_ds, dim_ds, "k", "dk", top_k=4)
            .to_pandas()
            .sort_values(["k", "x"])
            .reset_index(drop=True)
        )
        labels = {d["dk"]: d["label"] for d in dim}
        expect = pd.DataFrame(
            sorted(
                (
                    {"k": f["k"], "x": f["x"], "label": labels[f["k"]]}
                    for f in fact
                    if f["k"] in labels
                ),
                key=lambda r: (r["k"], r["x"]),
            )
        )
        pd.testing.assert_frame_equal(out, expect, check_dtype=False)
        # the celebrity key must exist and be fully represented
        assert (out["k"] == 0).sum() == 500

    def test_hot_key_missing_from_dimension_drops(self):
        import ray.data as rd

        from vigil_ray.stages.joins import skew_join

        fact = rd.from_items(
            [{"k": 42, "x": i} for i in range(300)]
            + [{"k": 7, "x": i} for i in range(10)]
        ).repartition(4)
        dim = rd.from_items([{"dk": 7, "label": "seven"}]).repartition(2)
        out = skew_join(fact, dim, "k", "dk", top_k=2).to_pandas()
        # key 42 is hot but has no dimension row -> inner join drops it
        assert set(out["k"]) == {7} and len(out) == 10


@pytest.mark.usefixtures("ray_session")
class TestBroadcastJoin:
    def _sides(self):
        import ray.data as rd

        left = rd.from_items(
            [{"k": i % 12, "x": i} for i in range(100)]
        ).repartition(5)
        # keys 0..7 present in the dimension; 8..11 unmatched
        right = rd.from_items(
            [{"rk": j, "label": f"d{j}", "w": j * 10} for j in range(8)]
        ).repartition(3)
        return left, right

    def _expect(self, how):
        left = pd.DataFrame([{"k": i % 12, "x": i} for i in range(100)])
        right = pd.DataFrame(
            [{"rk": j, "label": f"d{j}", "w": j * 10} for j in range(8)]
        )
        return (
            left.merge(
                right,
                left_on="k",
                right_on="rk",
                how="inner" if how == "inner" else "left",
            )
            .drop(columns=["rk"])
            .sort_values(["k", "x"])
            .reset_index(drop=True)
        )

    def test_inner(self):
        from vigil_ray.stages.joins import broadcast_join

        left, right = self._sides()
        out = (
            broadcast_join(left, right, key="k", right_key="rk", how="inner")
            .to_pandas()
            .sort_values(["k", "x"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(out, self._expect("inner"), check_dtype=False)

    def test_left_outer_keeps_unmatched_with_nulls(self):
        from vigil_ray.stages.joins import broadcast_join

        left, right = self._sides()
        out = (
            broadcast_join(left, right, key="k", right_key="rk", how="left_outer")
            .to_pandas()
            .sort_values(["k", "x"])
            .reset_index(drop=True)
        )
        expect = self._expect("left")
        assert len(out) == 100
        assert out.loc[out["k"] >= 8, "label"].isna().all()
        pd.testing.assert_frame_equal(out, expect, check_dtype=False)

    def test_size_gate_falls_back_to_hash_join(self):
        from vigil_ray.stages.joins import broadcast_join

        left, right = self._sides()
        out = (
            broadcast_join(
                left, right, key="k", right_key="rk", how="inner",
                max_broadcast_rows=2,
            )
            .to_pandas()
            .sort_values(["k", "x"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            out[self._expect("inner").columns],
            self._expect("inner"),
            check_dtype=False,
        )

    def test_invalid_how_raises_at_entry(self):
        import ray.data as rd

        from vigil_ray.stages.joins import broadcast_join

        left = rd.from_items([{"k": 1, "x": 0}])
        right = rd.from_items([{"rk": 1, "v": 1}])
        # must raise regardless of which side of the size gate the right
        # side lands — semantics can't depend on |right|
        with pytest.raises(ValueError, match="how"):
            broadcast_join(left, right, key="k", right_key="rk", how="right_outer")
        with pytest.raises(ValueError, match="how"):
            broadcast_join(
                left, right, key="k", right_key="rk", how="full_outer",
                max_broadcast_rows=0,
            )

    def test_null_left_keys(self):
        """Null probe keys follow SQL semantics: dropped on inner, kept with
        null attached values on left_outer — and string keys must not raise
        TypeError inside the searchsorted probe."""
        import ray.data as rd

        from vigil_ray.stages.joins import broadcast_join

        left = rd.from_items(
            [{"k": "a", "x": 1}, {"k": None, "x": 2}, {"k": "z", "x": 3}]
        )
        right = rd.from_items([{"rk": "a", "v": 10}, {"rk": "z", "v": 30}])
        inner = (
            broadcast_join(left, right, key="k", right_key="rk", how="inner")
            .to_pandas()
            .sort_values("x")
        )
        assert inner["x"].tolist() == [1, 3] and inner["v"].tolist() == [10, 30]
        outer = (
            broadcast_join(left, right, key="k", right_key="rk", how="left_outer")
            .to_pandas()
            .sort_values("x")
        )
        assert outer["x"].tolist() == [1, 2, 3]
        assert outer["v"].tolist()[0] == 10 and outer["v"].tolist()[2] == 30
        assert pd.isna(outer["v"].tolist()[1])

    def test_duplicate_right_keys_raise(self):
        import ray.data as rd

        from vigil_ray.stages.joins import broadcast_join

        left = rd.from_items([{"k": 1, "x": 0}])
        right = rd.from_items([{"rk": 1, "v": 1}, {"rk": 1, "v": 2}])
        with pytest.raises(ValueError, match="duplicate"):
            broadcast_join(left, right, key="k", right_key="rk")

    def test_empty_right_side(self):
        import pyarrow as pa
        import ray.data as rd

        from vigil_ray.stages.joins import broadcast_join

        left, _ = self._sides()
        # 0-row but schema-bearing (the realistic aggregate-derived empty);
        # a filter-derived all-empty side loses its schema entirely (the
        # repo-wide Ray 2.49 empty-block gap, stages/blocks.py) and raises
        empty = rd.from_arrow(
            pa.table(
                {
                    "rk": pa.array([], pa.int64()),
                    "label": pa.array([], pa.string()),
                    "w": pa.array([], pa.int64()),
                }
            )
        )
        inner = broadcast_join(left, empty, key="k", right_key="rk").to_pandas()
        assert len(inner) == 0
        outer = broadcast_join(
            left, empty, key="k", right_key="rk", how="left_outer"
        ).to_pandas()
        assert len(outer) == 100 and outer["label"].isna().all()

    def test_schemaless_empty_right_raises(self):
        from vigil_ray.stages.joins import broadcast_join

        left, right = self._sides()
        schemaless = right.filter(lambda r: r["rk"] > 1000)
        with pytest.raises(ValueError, match="no schema-bearing blocks"):
            broadcast_join(left, schemaless, key="k", right_key="rk")


def test_skew_join_string_keys(ray_session):
    import ray.data as rd

    from vigil_ray.stages.joins import skew_join

    # hot string key 'pt' dominates the fact side; dimension is tiny
    left = rd.from_items(
        [{"lang": "pt" if i % 4 else "en", "v": i} for i in range(200)]
    ).repartition(4)
    right = rd.from_items(
        [{"code": "pt", "name": "portuguese"}, {"code": "en", "name": "english"},
         {"code": "es", "name": "spanish"}]
    )
    out = skew_join(left, right, key="lang", right_key="code", top_k=1).to_pandas()
    assert len(out) == 200
    assert set(out["name"]) == {"portuguese", "english"}
    assert (out.loc[out["lang"] == "pt", "name"] == "portuguese").all()
