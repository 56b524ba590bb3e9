"""Skew-salting tests (r3 verdict task 5): a planted hot
(user, bucket) key must complete with EXACT results — hot clicks shard
across salt sub-partitions, hot purchases replicate to the distinct
shard partitions, and the per-purchase Sum merges the partials."""

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _plant_corpus(tmp_path, n_hot_clicks=100_000, seed=7):
    """One user hammers one hour-bucket with clicks (+ purchases inside
    and after the window); 50 normal users with sparse activity."""
    rs = np.random.RandomState(seed)
    base = pd.Timestamp("2025-03-01 12:00:00").value // 1000  # µs

    hot_uid = 1
    hot_ts = base + rs.randint(0, 3_600_000_000, size=n_hot_clicks)
    rows = [pd.DataFrame({
        "user_id": hot_uid,
        "ts": hot_ts,
        "event_type": "click",
    })]
    # purchases: a burst inside the hot hour + stragglers after it
    p_ts = np.concatenate([
        base + rs.randint(0, 3_600_000_000, size=30),
        base + 3_600_000_000 + rs.randint(0, 3_600_000_000, size=20),
    ])
    rows.append(pd.DataFrame({
        "user_id": hot_uid, "ts": p_ts, "event_type": "purchase",
    }))
    for uid in range(2, 52):
        n = int(rs.randint(5, 40))
        rows.append(pd.DataFrame({
            "user_id": uid,
            "ts": base + rs.randint(-7_200_000_000, 7_200_000_000, size=n),
            "event_type": rs.choice(["click", "purchase", "view"], size=n),
        }))
    df = pd.concat(rows, ignore_index=True)
    df["event_id"] = np.arange(len(df), dtype=np.int64)
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = pd.to_datetime(df["ts"], unit="us")
    out = tmp_path / "events.parquet"
    df[["event_id", "user_id", "ts", "event_type"]].to_parquet(out)
    return str(tmp_path), df


def _oracle(df: pd.DataFrame, window_minutes=60) -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    con.register("ev", df[["event_id", "user_id", "ts", "event_type"]])
    return con.execute(f"""
        SELECT p.event_id, COUNT(c.event_id)::BIGINT AS n_prior_clicks
        FROM ev p LEFT JOIN ev c
          ON c.user_id = p.user_id AND c.event_type = 'click'
         AND c.ts >= p.ts - INTERVAL {window_minutes} MINUTE AND c.ts < p.ts
        WHERE p.event_type = 'purchase'
        GROUP BY p.event_id ORDER BY p.event_id
    """).df()


def test_hot_key_salted_exact(tmp_path):
    from ragflow_ray.ops.relational import events_range_join

    sf_dir, df = _plant_corpus(tmp_path, n_hot_clicks=100_000)
    got = events_range_join(sf_dir, hot_key_threshold=5_000, n_salt=8)
    want = _oracle(df)
    want["event_id"] = want["event_id"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))
    # the planted key really was hot (some purchase saw >5k clicks)
    assert got["n_prior_clicks"].max() > 5_000


def test_hot_key_shard_collisions_exact(tmp_path):
    """n_salt == n_partitions forces shard->partition collisions; the
    distinct-partition purchase replication must not double-count."""
    from ragflow_ray.ops.relational import events_range_join

    sf_dir, df = _plant_corpus(tmp_path, n_hot_clicks=20_000, seed=11)
    got = events_range_join(
        sf_dir, hot_key_threshold=1_000, n_salt=8, n_partitions=8)
    want = _oracle(df)
    want["event_id"] = want["event_id"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))


def test_no_hot_keys_path_unchanged(tmp_path):
    """Below threshold the salt stage is skipped entirely and results
    match the oracle (the default-path regression guard)."""
    from ragflow_ray.ops.relational import events_range_join

    sf_dir, df = _plant_corpus(tmp_path, n_hot_clicks=2_000, seed=3)
    got = events_range_join(sf_dir, hot_key_threshold=1_000_000)
    want = _oracle(df)
    want["event_id"] = want["event_id"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True))
