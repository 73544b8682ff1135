"""Gap-based sessionization over the events log (streaming-shaped operator).

Ray Data has no event-time windows (SURVEY.md §2.8): the idiomatic expression
is to treat events as a partitioned log — shuffle by ``user_id``, order by
``ts`` within each group, and run the window logic in ``map_groups`` pandas.
A new session starts when the gap to the previous event exceeds the timeout.

Partitioning assumption: one user's history fits one group (true for any
realistic user; a pathological hot key would need ts-range salting plus a
merge pass — documented, not needed here).
"""

from __future__ import annotations

import pandas as pd


def sessionize(ds, gap_minutes: int = 30):
    """→ (user_id, n_sessions, n_events, max_session_events)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        new_session = g["ts"].diff() > gap
        session_ids = new_session.cumsum()
        sizes = session_ids.groupby(session_ids).size()
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [int(sizes.shape[0])],
                "n_events": [len(g)],
                "max_session_events": [int(sizes.max())],
            }
        )

    return ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
