"""Property tests: the sorted-block window-analytic primitives
(grouped_prefix_scan / grouped_fill_forward / grouped_shift) against their
pandas reference semantics on randomized inputs — random key skew, null
patterns, and block layouts. Complements the constructed-case batteries in
tests/test_corpus.py with generative coverage of boundary interactions."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ds(df, nblocks):
    import ray.data as rd

    return rd.from_pandas(df).repartition(nblocks)


# rows: (key in 0..3 — heavy collisions, value or None); order index appended
rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                       min_value=-1e6, max_value=1e6)),
    ),
    min_size=1,
    max_size=60,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@pytest.mark.usefixtures("ray_session")
class TestWindowPrimitiveProperties:
    @given(rows=rows_strategy, nblocks=st.integers(min_value=1, max_value=7))
    @settings(**_SETTINGS)
    def test_fill_forward_matches_pandas(self, rows, nblocks):
        from vigil_ray.stages.corpus import grouped_fill_forward

        df = pd.DataFrame(
            {"u": [r[0] for r in rows], "t": range(len(rows)), "v": [r[1] for r in rows]}
        )
        out = (
            grouped_fill_forward(_ds(df, nblocks), ["u"], ["t"], "v", out_col="f")
            .to_pandas()
            .sort_values(["u", "t"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["u", "t"]).reset_index(drop=True)
        want["f"] = want.groupby("u")["v"].ffill()
        pd.testing.assert_frame_equal(out[want.columns], want, check_dtype=False)

    @given(
        rows=rows_strategy,
        nblocks=st.integers(min_value=1, max_value=7),
        periods=st.sampled_from([1, -1]),
    )
    @settings(**_SETTINGS)
    def test_shift_matches_pandas(self, rows, nblocks, periods):
        from vigil_ray.stages.corpus import grouped_shift

        df = pd.DataFrame(
            {"u": [r[0] for r in rows], "t": range(len(rows)), "v": [r[1] for r in rows]}
        )
        out = (
            grouped_shift(_ds(df, nblocks), ["u"], ["t"], "v", periods=periods, out_col="s")
            .to_pandas()
            .sort_values(["u", "t"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["u", "t"]).reset_index(drop=True)
        want["s"] = want.groupby("u")["v"].shift(periods)
        pd.testing.assert_frame_equal(out[want.columns], want, check_dtype=False)

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=0, max_value=50),
            ),
            min_size=1,
            max_size=60,
        ),
        nblocks=st.integers(min_value=1, max_value=7),
    )
    @settings(**_SETTINGS)
    def test_prefix_scan_matches_pandas(self, rows, nblocks):
        from vigil_ray.stages.corpus import grouped_prefix_scan

        df = pd.DataFrame(
            {"u": [r[0] for r in rows], "t": range(len(rows)), "c": [r[1] for r in rows]}
        )
        out = (
            grouped_prefix_scan(_ds(df, nblocks), ["u"], ["t"], cost_col="c")
            .to_pandas()
            .sort_values(["u", "t"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["u", "t"]).reset_index(drop=True)
        want["cum_excl"] = want.groupby("u")["c"].cumsum() - want["c"]
        pd.testing.assert_frame_equal(out[want.columns], want, check_dtype=False)
