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


@pytest.mark.usefixtures("ray_session")
class TestMonoidOpProperties:
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),      # user (heavy collisions)
                st.integers(min_value=0, max_value=200),    # minute offset (forces ties)
            ),
            min_size=1,
            max_size=60,
        ),
        nblocks=st.integers(min_value=1, max_value=7),
        gap_minutes=st.sampled_from([1, 5, 30]),
    )
    @settings(**_SETTINGS)
    def test_sessionize_matches_pandas(self, rows, nblocks, gap_minutes):
        from vigil_ray.stages.sessions import sessionize

        base = pd.Timestamp("2026-01-01")
        df = pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": [base + pd.Timedelta(minutes=r[1]) for r in rows],
            }
        )
        out = (
            sessionize(_ds(df, nblocks), gap_minutes=gap_minutes)
            .to_pandas()
            .sort_values("user_id")
            .reset_index(drop=True)
        )
        gap = pd.Timedelta(minutes=gap_minutes)
        recs = []
        for u, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
            d = g["ts"].diff()
            new = d.gt(gap) | d.isna()
            sizes = new.cumsum().value_counts()
            recs.append(
                {
                    "user_id": u,
                    "n_sessions": int(new.sum()),
                    "n_events": len(g),
                    "max_session_events": int(sizes.max()),
                }
            )
        want = pd.DataFrame(recs).sort_values("user_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(out[want.columns], want, check_dtype=False)

    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),   # user
                st.integers(min_value=0, max_value=20),  # ts (forces ties)
                st.sampled_from(["signup", "click", "purchase", "view"]),
            ),
            min_size=1,
            max_size=60,
        ),
        nblocks=st.integers(min_value=1, max_value=7),
    )
    @settings(**_SETTINGS)
    def test_funnel_matches_greedy_reference(self, rows, nblocks):
        from vigil_ray.stages.sessions import funnel_counts

        stages = ("signup", "click", "purchase")
        df = pd.DataFrame(
            {
                "user_id": [r[0] for r in rows],
                "ts": [r[1] for r in rows],
                "event_type": [r[2] for r in rows],
            }
        )
        out = funnel_counts(_ds(df, nblocks), stages)
        got = dict(
            zip(out.column("stage").to_pylist(), out.column("n_users").to_pylist())
        )
        want = {s: 0 for s in stages}
        for _, g in df.groupby("user_id"):
            cutoff = None
            for s in stages:
                ts = [
                    t
                    for t, e in zip(g["ts"], g["event_type"])
                    if e == s and (cutoff is None or t > cutoff)
                ]
                if not ts:
                    break
                cutoff = min(ts)
                want[s] += 1
        assert got == want


@pytest.mark.usefixtures("ray_session")
class TestRollingMedianProperties:
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=3),
                st.integers(min_value=-1000, max_value=1000),
            ),
            min_size=1,
            max_size=60,
        ),
        nblocks=st.integers(min_value=1, max_value=7),
        window=st.integers(min_value=2, max_value=6),
    )
    @settings(**_SETTINGS)
    def test_matches_pandas_rolling_median(self, rows, nblocks, window):
        from vigil_ray.stages.corpus import grouped_rolling_median

        df = pd.DataFrame(
            {
                "k": [r[0] for r in rows],
                "t": range(len(rows)),
                "v": [r[1] for r in rows],
            }
        )
        out = (
            grouped_rolling_median(
                _ds(df, nblocks), ["k"], ["t"], "v", window=window, out_col="m"
            )
            .to_pandas()
            .sort_values(["k", "t"])
            .reset_index(drop=True)
        )
        want = df.sort_values(["k", "t"]).reset_index(drop=True)
        want["m"] = (
            want.groupby("k")["v"]
            .rolling(window, min_periods=1)
            .median()
            .reset_index(level=0, drop=True)
        )
        pd.testing.assert_frame_equal(out[["k", "t", "v", "m"]], want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
class TestWebtextKernelProperties:
    @given(
        scheme=st.sampled_from(["https://", "http://", "HTTP://", ""]),
        www=st.sampled_from(["", "www.", "WWW."]),
        host=st.sampled_from(["example.test", "Sub1.DOM3.test", "a.b.c.test"]),
        path=st.sampled_from(["", "/", "/p/1", "/p/1/", "/UPPER/Case"]),
        query=st.sampled_from(
            ["", "?page=2", "?utm_source=x", "?page=2&utm_a=1", "?utm_a=1&page=2"]
        ),
        frag=st.sampled_from(["", "#f", "#frag/with?marks"]),
    )
    @settings(**_SETTINGS)
    def test_canonicalize_idempotent(self, scheme, www, host, path, query, frag):
        import ray.data as rd

        from vigil_ray.stages.corpus import canonicalize_urls

        url = f"{scheme}{www}{host}{path}{query}{frag}"
        once = (
            canonicalize_urls(rd.from_items([{"url": url}]))
            .to_pandas()["canonical_url"][0]
        )
        twice = (
            canonicalize_urls(rd.from_items([{"url": once}]))
            .to_pandas()["canonical_url"][0]
        )
        assert once == twice, (url, once, twice)

    @given(
        rows=st.lists(
            st.tuples(st.text(alphabet="ab ", max_size=25),
                      st.text(alphabet="ab ", max_size=25)),
            min_size=1,
            max_size=30,
        )
    )
    @settings(**_SETTINGS)
    def test_edit_distance_symmetry_and_identity(self, rows):
        from vigil_ray.stages.dedup import batch_edit_distances

        ta = [r[0] for r in rows]
        tb = [r[1] for r in rows]
        fwd = batch_edit_distances(ta, tb)
        rev = batch_edit_distances(tb, ta)
        assert (fwd == rev).all()
        assert (batch_edit_distances(ta, ta) == 0).all()
