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
