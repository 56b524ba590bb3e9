"""Relational pipelines over the TPC-H-ish testdata tables.

The reference has no distributed relational layer (SURVEY.md §2.7);
these operators demonstrate the engine's wide-operation discipline on
the shared tables — partial aggregation before groupby, broadcast
joins for small dimensions, windowed per-key computation — with exact
DuckDB oracles.

Monetary sums are computed in integer cents (per-element
``floor(x*100 + 0.5)`` before summing) so Ray and DuckDB agree
bit-exactly regardless of floating-point summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..state.skewmon import warn_rows as _skew_warn


def _cents(series: pd.Series, scale: int = 100) -> pd.Series:
    return np.floor(series * scale + 0.5).astype("int64")


def _member(sorted_keys: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``v`` in a sorted int64 key array —
    the broadcast-dimension lookup every filter-join here uses."""
    pos = np.searchsorted(sorted_keys, v)
    hit = pos < len(sorted_keys)
    hit[hit] = sorted_keys[pos[hit]] == v[hit]
    return hit


def pricing_summary(sf_dir: str):
    """TPC-H Q1-style pricing summary over lineitem (shipped on/before
    1998-09-02), partial-aggregated per batch before the tiny final
    groupby."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02")))
        )
        df = t.to_pandas()
        df["sum_qty"] = _cents(df["l_quantity"], 1)
        df["base_price_cents"] = _cents(df["l_extendedprice"])
        df["disc_price_c4"] = _cents(
            df["l_extendedprice"] * (1.0 - df["l_discount"]), 10_000
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("sum_qty", "sum"),
            sum_base_price_cents=("base_price_cents", "sum"),
            sum_disc_price_c4=("disc_price_c4", "sum"),
            count_order=("sum_qty", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # (returnflag × linestatus)-sized partials (≤ 6 rows per block): a
    # narrow combine level + driver groupby instead of the ~0.8 s
    # fixed small-result exchange (the r5 reduce discipline)
    sums = {"sum_qty": ("sum_qty", "sum"),
            "sum_base_price_cents": ("sum_base_price_cents", "sum"),
            "sum_disc_price_c4": ("sum_disc_price_c4", "sum"),
            "count_order": ("count_order", "sum")}

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(**sums)
        for c in sums:
            g[c] = g[c].astype("int64")
        return g

    df = (
        ds.map_batches(partial, batch_format="pyarrow")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(**sums)
        .sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    )
    for c in ("sum_qty", "sum_base_price_cents", "sum_disc_price_c4", "count_order"):
        df[c] = df[c].astype("int64")
    return df


def top_customers(sf_dir: str, k: int = 10):
    """Revenue per customer via a broadcast join of the (small)
    customer table into the orders aggregate; top-k by revenue with a
    deterministic custkey tiebreak."""
    import ray
    import ray.data as rd

    from ..sources.readers import read_parquet_clean
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count, Sum

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    )

    def to_cents(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": batch["o_custkey"],
                "revenue_cents": _cents(batch["o_totalprice"]),
            }
        )

    per_cust = orders.map_batches(to_cents, batch_format="pandas").groupby(
        "o_custkey"
    ).aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Count(alias_name="n_orders"),
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))

    def attach_name(batch: pd.DataFrame) -> pd.DataFrame:
        names = ray.get(ref)
        batch = batch.copy()
        batch["c_name"] = batch["o_custkey"].map(names)
        return batch

    named = per_cust.map_batches(attach_name, batch_format="pandas")
    # the tiebreak is part of the distributed sort, so limit(k) is exact
    # even when many customers tie at the boundary revenue
    df = (
        named.sort(["revenue_cents", "o_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
        .reset_index(drop=True)
    )
    df["revenue_cents"] = df["revenue_cents"].astype("int64")
    df["n_orders"] = df["n_orders"].astype("int64")
    return df[["o_custkey", "c_name", "revenue_cents", "n_orders"]]


def event_type_stats(sf_dir: str):
    """Per event-type counts + micro-scaled value sums over events."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "value", "user_id"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "value_micros": _cents(batch["value"], 1_000_000),
                "user_id": batch["user_id"],
            }
        )
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("user_id", "size"),
            sum_value_micros=("value_micros", "sum"),
            min_user=("user_id", "min"), max_user=("user_id", "max"))
        for c in ("n_events", "sum_value_micros", "min_user", "max_user"):
            g[c] = g[c].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_micros=("sum_value_micros", "sum"),
            min_user=("min_user", "min"), max_user=("max_user", "max"))
        for c in ("n_events", "sum_value_micros", "min_user", "max_user"):
            g[c] = g[c].astype("int64")
        return g

    # event-type-sized partials: a narrow combine level + driver merge
    # instead of the fixed-cost small-result exchange (order-free
    # count/sum/min/max; the combine bounds the driver frame at
    # result-size x (partial rows / 65536) regardless of block count)
    df = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_micros=("sum_value_micros", "sum"),
            min_user=("min_user", "min"), max_user=("max_user", "max"))
        .sort_values("event_type").reset_index(drop=True)
    )
    for c in ("n_events", "sum_value_micros", "min_user", "max_user"):
        df[c] = df[c].astype("int64")
    return df


def nation_customer_counts(sf_dir: str):
    """Customers per nation (name via broadcast of the tiny nation
    dimension), with account-balance cents total."""
    import ray
    import ray.data as rd

    from ..sources.readers import read_parquet_clean
    import pyarrow.parquet as pq

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_nationkey", "c_acctbal"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "c_nationkey": batch["c_nationkey"],
                "acctbal_cents": _cents(batch["c_acctbal"]),
            }
        )
        g = df.groupby("c_nationkey", as_index=False).agg(
            n_customers=("acctbal_cents", "size"),
            sum_acctbal_cents=("acctbal_cents", "sum"))
        for c in ("n_customers", "sum_acctbal_cents"):
            g[c] = g[c].astype("int64")
        return g

    nations = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nation_name = dict(zip(nations["n_nationkey"], nations["n_name"]))

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("c_nationkey", as_index=False).agg(
            n_customers=("n_customers", "sum"),
            sum_acctbal_cents=("sum_acctbal_cents", "sum"))
        for c in ("n_customers", "sum_acctbal_cents"):
            g[c] = g[c].astype("int64")
        return g

    # nation-sized partials (≤ 25 rows per block): a narrow combine
    # level + driver merge instead of the fixed-cost small-result
    # exchange; the name attach happens on the 25-row driver frame
    df = (
        cust.map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("c_nationkey", as_index=False).agg(
            n_customers=("n_customers", "sum"),
            sum_acctbal_cents=("sum_acctbal_cents", "sum"))
        .sort_values("c_nationkey").reset_index(drop=True)
    )
    df["n_name"] = df["c_nationkey"].map(nation_name)
    df["c_nationkey"] = df["c_nationkey"].astype("int64")
    df["n_customers"] = df["n_customers"].astype("int64")
    df["sum_acctbal_cents"] = df["sum_acctbal_cents"].astype("int64")
    return df[["c_nationkey", "n_name", "n_customers", "sum_acctbal_cents"]]


def part_type_stats(sf_dir: str):
    """Parts per type: count, max size, retail-price cents total."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/part.parquet", columns=["p_type", "p_size", "p_retailprice"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "p_type": batch["p_type"],
                "p_size": batch["p_size"].astype("int64"),
                "price_cents": _cents(batch["p_retailprice"]),
            }
        )
        g = df.groupby("p_type", as_index=False).agg(
            n_parts=("p_size", "size"), max_size=("p_size", "max"),
            sum_price_cents=("price_cents", "sum"))
        for c in ("n_parts", "max_size", "sum_price_cents"):
            g[c] = g[c].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("p_type", as_index=False).agg(
            n_parts=("n_parts", "sum"), max_size=("max_size", "max"),
            sum_price_cents=("sum_price_cents", "sum"))
        for c in ("n_parts", "max_size", "sum_price_cents"):
            g[c] = g[c].astype("int64")
        return g

    # type-sized partials: a narrow combine level + driver merge
    # instead of the fixed-cost small-result exchange
    df = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("p_type", as_index=False).agg(
            n_parts=("n_parts", "sum"), max_size=("max_size", "max"),
            sum_price_cents=("sum_price_cents", "sum"))
        .sort_values("p_type").reset_index(drop=True)
    )
    for c in ("n_parts", "max_size", "sum_price_cents"):
        df[c] = df[c].astype("int64")
    return df


def events_hourly(sf_dir: str):
    """Tumbling one-hour window counts per event type — the
    streaming-shaped aggregate expressed as a groupby over truncated
    timestamps."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "hour": batch["ts"].dt.floor("h"),
                "event_type": batch["event_type"],
                "value_micros": _cents(batch["value"], 1_000_000),
            }
        )
        g = df.groupby(["hour", "event_type"], as_index=False).agg(
            n_events=("value_micros", "size"),
            sum_value_micros=("value_micros", "sum"))
        for c in ("n_events", "sum_value_micros"):
            g[c] = g[c].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["hour", "event_type"], as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_micros=("sum_value_micros", "sum"))
        for c in ("n_events", "sum_value_micros"):
            g[c] = g[c].astype("int64")
        return g

    # (window × type)-sized partials: a narrow combine level + driver
    # merge instead of the fixed-cost small-result exchange
    df = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["hour", "event_type"], as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_micros=("sum_value_micros", "sum"))
        .sort_values(["hour", "event_type"]).reset_index(drop=True)
    )
    df["hour"] = df["hour"].astype("datetime64[us]")
    df["n_events"] = df["n_events"].astype("int64")
    df["sum_value_micros"] = df["sum_value_micros"].astype("int64")
    return df


def purchase_attribution(sf_dir: str):
    """As-of join within the events stream: for every purchase, the
    timestamp of the same user's most recent *prior* click —
    ``groupby(user).map_groups`` over ts-sorted groups with
    ``pandas.merge_asof`` (the Ray Data as-of join pattern)."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    import pyarrow as pa

    # declared output schema: every block hashes identically (no
    # per-block pandas metadata), which keeps Ray's block-schema
    # dedup warning-free and guards against schema drift
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("last_click_ts", pa.timestamp("us")),
        ]
    )

    def attribute(group: pd.DataFrame) -> pa.Table:
        purchases = group[group["event_type"] == "purchase"].sort_values("ts")
        clicks = group[group["event_type"] == "click"].sort_values("ts")
        if purchases.empty:
            return schema.empty_table()
        merged = pd.merge_asof(
            purchases[["event_id", "user_id", "ts"]],
            clicks[["ts"]].rename(columns={"ts": "last_click_ts"}),
            left_on="ts",
            right_on="last_click_ts",
            allow_exact_matches=False,
        )
        return pa.Table.from_pandas(
            merged[["event_id", "user_id", "ts", "last_click_ts"]],
            schema=schema, preserve_index=False,
        ).replace_schema_metadata(None)

    df = ds.groupby("user_id").map_groups(attribute, batch_format="pandas").sort(
        "event_id"
    ).to_pandas()
    df["event_id"] = df["event_id"].astype("int64")
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = df["ts"].astype("datetime64[us]")
    df["last_click_ts"] = df["last_click_ts"].astype("datetime64[us]")
    return df


def events_sliding(sf_dir: str, window_minutes: int = 60,
                   hop_minutes: int = 30):
    """Hopping-window event counts (window 1 h, hop 30 min): every
    event lands in ``window/hop`` overlapping windows, so the batch
    transform flat-maps each row to its window starts (vectorized
    integer arithmetic, windows/hop output rows per input row) and a
    single small groupby sums per (window_start, event_type) — the
    streaming-window pattern expressed as expansion + aggregate, no
    per-window state."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    n_win = window_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )
    schema = pa.schema(
        [("window_start_us", pa.int64()), ("event_type", pa.string()),
         ("n_events", pa.int64())]
    )

    def expand(batch: pd.DataFrame):
        us = batch["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        last_start = (us // hop_us) * hop_us   # latest window containing ts
        starts = last_start[:, None] - hop_us * np.arange(n_win)[None, :]
        et = batch["event_type"].to_numpy()
        g = pd.DataFrame(
            {"window_start_us": starts.ravel(),
             "event_type": np.repeat(et, n_win)}
        )
        out = (
            g.groupby(["window_start_us", "event_type"], as_index=False)
            .size().rename(columns={"size": "n_events"})
        )
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["window_start_us", "event_type"], as_index=False).agg(
            n_events=("n_events", "sum"))
        g["n_events"] = g["n_events"].astype("int64")
        return g

    # (window × type)-sized partials: a narrow combine level + driver
    # merge instead of the fixed-cost small-result exchange
    df = (
        ds.map_batches(expand, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["window_start_us", "event_type"], as_index=False)
        .agg(n_events=("n_events", "sum"))
        .sort_values(["window_start_us", "event_type"]).reset_index(drop=True)
    )
    df["window_start_us"] = df["window_start_us"].astype("int64")
    df["n_events"] = df["n_events"].astype("int64")
    return df


_ASOF_SCALE = 10_000_000_000  # orderkeys < 1e10; (date, key) packs into one int64


def events_order_asof(sf_dir: str, broadcast_limit: int = 5_000_000):
    """Two-table as-of join: each event matched to the same customer's
    latest order placed on-or-before the event date (LEFT semantics;
    -1 when the user never ordered by then).

    Ray Data has no native as-of join; size-adaptive plan, branch
    picked from parquet metadata (an O(1) footer read, no data scan):

    * orders ≤ ``broadcast_limit`` rows → the orders side is sorted
      once, ``ray.put`` once, and every events batch runs a
      vectorized ``pandas.merge_asof`` against it — a broadcast join,
      no shuffle at all (dimension-vs-stream is the common shape);
    * bigger orders side → the co-partition pattern: both sides
      projected to a common (key, side, rid, t_days) schema, unioned,
      hash-shuffled ONCE by key, and merged per group with
      ``searchsorted``.

    The (date, orderkey) pair packs into a single int64 so "the
    latest order" has a deterministic total order (ties on date break
    to the highest orderkey) that the DuckDB oracle reproduces with a
    plain MAX.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    orr = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    out_cols = ["event_id", "user_id", "o_orderkey", "o_orderdate_days"]
    n_orders = pq.ParquetFile(f"{sf_dir}/orders.parquet").metadata.num_rows
    if n_orders <= broadcast_limit:
        odf = orr.to_pandas()
        odf["o_days"] = (
            odf["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
        )
        # stable (days, orderkey) order: merge_asof takes the LAST row
        # with on <= left-on inside each by-group, i.e. the packed max
        odf = odf.sort_values(["o_days", "o_orderkey"], kind="stable")
        odf = odf[["o_custkey", "o_orderkey", "o_days"]].reset_index(drop=True)
        oref = ray.put(odf)

        def join(batch: pd.DataFrame) -> pd.DataFrame:
            orders = ray.get(oref)
            left = pd.DataFrame({
                "event_id": batch["event_id"].astype("int64"),
                "user_id": batch["user_id"].astype("int64"),
                "t_days": batch["ts"].to_numpy()
                .astype("datetime64[D]").astype("int64"),
            }).sort_values("t_days", kind="stable")
            m = pd.merge_asof(
                left, orders, left_on="t_days", right_on="o_days",
                left_by="user_id", right_by="o_custkey",
            )
            m["o_orderkey"] = m["o_orderkey"].fillna(-1).astype("int64")
            m["o_orderdate_days"] = m["o_days"].fillna(-1).astype("int64")
            return m[out_cols]

        # output is driver-sized either way — sort the final frame in
        # pandas instead of paying a distributed sort for presentation
        df = (
            ev.map_batches(join, batch_format="pandas").to_pandas()
            .sort_values("event_id").reset_index(drop=True)
        )
        for c in out_cols:
            df[c] = df[c].astype("int64")
        return df

    common = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()),
         ("rid", pa.int64()), ("t_days", pa.int64())]
    )

    def ev_prep(b: pd.DataFrame) -> pa.Table:
        days = b["ts"].to_numpy().astype("datetime64[D]").astype("int64")
        return pa.table(
            {"key": b["user_id"].to_numpy().astype("int64"),
             "side": np.zeros(len(b), np.int8),
             "rid": b["event_id"].to_numpy().astype("int64"),
             "t_days": days},
            schema=common,
        )

    def or_prep(b: pd.DataFrame) -> pa.Table:
        days = b["o_orderdate"].to_numpy().astype("datetime64[D]").astype("int64")
        return pa.table(
            {"key": b["o_custkey"].to_numpy().astype("int64"),
             "side": np.ones(len(b), np.int8),
             "rid": b["o_orderkey"].to_numpy().astype("int64"),
             "t_days": days},
            schema=common,
        )

    uni = ev.map_batches(ev_prep, batch_format="pandas").union(
        orr.map_batches(or_prep, batch_format="pandas")
    )

    out_schema = pa.schema(
        [("event_id", pa.int64()), ("user_id", pa.int64()),
         ("o_orderkey", pa.int64()), ("o_orderdate_days", pa.int64())]
    )

    def asof(group: pd.DataFrame) -> pa.Table:
        evs = group[group["side"] == 0]
        if evs.empty:  # customer with orders but no events
            return out_schema.empty_table()
        ords = group[group["side"] == 1]
        ev_days = evs["t_days"].to_numpy()
        n = len(evs)
        if ords.empty:
            okey = np.full(n, -1, dtype=np.int64)
            odays = np.full(n, -1, dtype=np.int64)
        else:
            enc = np.sort(
                ords["t_days"].to_numpy() * _ASOF_SCALE + ords["rid"].to_numpy()
            )
            idx = np.searchsorted(enc, (ev_days + 1) * _ASOF_SCALE, "left") - 1
            hit = enc[np.maximum(idx, 0)]
            ok = idx >= 0
            okey = np.where(ok, hit % _ASOF_SCALE, -1)
            odays = np.where(ok, hit // _ASOF_SCALE, -1)
        return pa.table(
            {"event_id": evs["rid"].to_numpy(),
             "user_id": evs["key"].to_numpy(),
             "o_orderkey": okey, "o_orderdate_days": odays},
            schema=out_schema,
        )

    df = (
        uni.groupby("key").map_groups(asof, batch_format="pandas")
        .sort("event_id").to_pandas()
    )
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per-user event count and session count with a
    30-minute inactivity gap — ``groupby(user).map_groups`` over
    ts-sorted groups (the Ray Data pattern for windowed state)."""
    import ray.data as rd

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    import pyarrow as pa

    schema = pa.schema(
        [("user_id", pa.int64()), ("n_events", pa.int64()), ("n_sessions", pa.int64())]
    )

    def sessions(group: pd.DataFrame) -> pa.Table:
        ts = group["ts"].sort_values()
        breaks = (ts.diff() > gap).sum() + 1 if len(ts) else 0
        return pa.table(
            {
                "user_id": [int(group["user_id"].iloc[0])],
                "n_events": [len(group)],
                "n_sessions": [int(breaks)],
            },
            schema=schema,
        )

    out = ds.groupby("user_id").map_groups(sessions, batch_format="pandas")
    df = out.sort("user_id").to_pandas()
    for c in ("user_id", "n_events", "n_sessions"):
        df[c] = df[c].astype("int64")
    return df


def regional_revenue(sf_dir: str, region: str = "ASIA",
                     date_lo: str = "1995-01-01", date_hi: str = "1996-01-01",
                     broadcast_limit: int = 5_000_000):
    """TPC-H Q5-style multi-way join: revenue per nation for lineitems
    whose customer and supplier share a nation inside ``region``, over
    orders placed in [date_lo, date_hi).

    Join plan (six tables, ONE potentially-wide exchange):

    * region → nation → customer / supplier are dimension-sized:
      folded into two broadcast maps on the driver (custkey →
      nationkey and suppkey → nationkey, both already restricted to
      the target region) — never a shuffle.
    * orders ⋈ lineitem is the fact-fact edge; size-adaptive on the
      FILTERED orders row count (date window applied at the read):

      - ≤ ``broadcast_limit`` filtered orders → ``ray.put`` one
        orderkey → customer-nation dict and stream lineitem ONCE:
        filter + revenue partial-aggregate per batch, then a 25-row
        final groupby.  No all-to-all at any point.
      - above the limit → both sides project to a common (key, side,
        nation, revenue_c4) schema, union, and co-partition in ONE
        hash exchange on orderkey (`groupby.map_groups`), with the
        same per-batch revenue pre-aggregation applied before the
        exchange so only (orderkey, nation, partial-revenue) rows
        move, never full lineitems.

    Revenue is integer c4 (price × (1-discount) in 1e-4 currency
    units, per-element rounded) so the DuckDB oracle matches
    bit-exactly under any summation order.  Output: (n_name,
    revenue_c4) sorted by revenue desc, nation asc.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    # --- dimension side: region → nation → {customer, supplier} maps
    nat = pq.read_table(
        f"{sf_dir}/nation.parquet",
        columns=["n_nationkey", "n_name", "n_regionkey"],
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    region_keys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat = nat[nat["n_regionkey"].isin(region_keys)]
    nation_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin(nation_name)]
    cust_nation = dict(
        zip(cust["c_custkey"].astype(int), cust["c_nationkey"].astype(int))
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(nation_name)]
    supp_ref = ray.put(
        dict(zip(supp["s_suppkey"].astype(int), supp["s_nationkey"].astype(int)))
    )
    # customer is the LARGEST dimension (150k x SF rows in real TPC-H):
    # ship it through the object store once, never in a task closure
    cust_ref = ray.put(cust_nation)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def orders_prep(t: pa.Table) -> pa.Table:
        t = t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )
        )
        okey = t["o_orderkey"].to_numpy()
        ckey = t["o_custkey"].to_numpy()
        cmap = ray.get(cust_ref)
        cnat = np.array([cmap.get(int(c), -1) for c in ckey],
                        dtype=np.int64)
        keep = cnat >= 0
        return pa.table(
            {"o_orderkey": pa.array(okey[keep]),
             "c_nation": pa.array(cnat[keep])}
        )

    filt_orders = orders.map_batches(
        orders_prep, batch_format="pyarrow"
    ).materialize()
    n_orders = filt_orders.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def _li_partial(b: pd.DataFrame) -> pd.DataFrame:
        """lineitem batch → (l_orderkey, s_nation, revenue_c4) partial
        rows, already restricted to in-region suppliers."""
        smap = ray.get(supp_ref)
        snat = np.array([smap.get(int(s), -1) for s in b["l_suppkey"]],
                        dtype=np.int64)
        keep = snat >= 0
        b = b[keep]
        rev = _cents(b["l_extendedprice"] * (1.0 - b["l_discount"]), 10_000)
        return pd.DataFrame(
            {"l_orderkey": b["l_orderkey"].astype("int64"),
             "s_nation": snat[keep],
             "revenue_c4": rev.to_numpy()}
        ).groupby(["l_orderkey", "s_nation"], as_index=False)["revenue_c4"].sum()

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:  # empty aggregates come back column-less
            return pd.DataFrame(
                {"n_name": pd.Series([], dtype=object),
                 "revenue_c4": pd.Series([], dtype="int64")}
            )
        out = df.groupby("n_nationkey", as_index=False)["revenue_c4"].sum()
        out["n_name"] = out["n_nationkey"].map(nation_name)
        out = out[["n_name", "revenue_c4"]]
        out["revenue_c4"] = out["revenue_c4"].astype("int64")
        return (
            out.sort_values(["revenue_c4", "n_name"], ascending=[False, True])
            .reset_index(drop=True)
        )

    if n_orders == 0:  # inner join with an empty orders side
        return _final(pd.DataFrame())

    if n_orders <= broadcast_limit:
        odf = filt_orders.to_pandas()
        omap_ref = ray.put(
            dict(zip(odf["o_orderkey"].astype(int), odf["c_nation"].astype(int)))
        )

        def li_join(b: pd.DataFrame) -> pd.DataFrame:
            omap = ray.get(omap_ref)
            part = _li_partial(b)
            cnat = np.array(
                [omap.get(int(k), -1) for k in part["l_orderkey"]],
                dtype=np.int64,
            )
            keep = cnat == part["s_nation"].to_numpy()
            part = part[keep]
            return pd.DataFrame(
                {"n_nationkey": part["s_nation"].to_numpy(),
                 "revenue_c4": part["revenue_c4"].to_numpy()}
            ).groupby("n_nationkey", as_index=False)["revenue_c4"].sum()

        # nation-sized partials (≤ 25 rows per block) and _final
        # already re-groups on the driver — the Ray aggregate between
        # them was a redundant ~0.8 s fixed exchange
        partials = lineitem.map_batches(li_join, batch_format="pandas")
        return _final(partials.to_pandas())

    # co-partition branch: one hash exchange on orderkey
    common = pa.schema(
        [("key", pa.int64()), ("side", pa.int8()),
         ("nation", pa.int64()), ("revenue_c4", pa.int64())]
    )

    def or_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {"key": t["o_orderkey"], "side": pa.array(
                np.zeros(t.num_rows, np.int8)),
             "nation": pc.cast(t["c_nation"], pa.int64()),
             "revenue_c4": pa.array(np.zeros(t.num_rows, np.int64))},
            schema=common,
        )

    def li_side(b: pd.DataFrame) -> pa.Table:
        part = _li_partial(b)
        return pa.table(
            {"key": pa.array(part["l_orderkey"].to_numpy()),
             "side": pa.array(np.ones(len(part), np.int8)),
             "nation": pa.array(part["s_nation"].to_numpy()),
             "revenue_c4": pa.array(part["revenue_c4"].to_numpy())},
            schema=common,
        )

    uni = filt_orders.map_batches(or_side, batch_format="pyarrow").union(
        lineitem.map_batches(li_side, batch_format="pandas")
    )

    out_schema = pa.schema(
        [("n_nationkey", pa.int64()), ("revenue_c4", pa.int64())]
    )

    def join_group(group: pd.DataFrame) -> pa.Table:
        ords = group[group["side"] == 0]
        if ords.empty:
            return out_schema.empty_table()
        cnat = int(ords["nation"].iloc[0])
        lis = group[(group["side"] == 1) & (group["nation"] == cnat)]
        if lis.empty:
            return out_schema.empty_table()
        return pa.table(
            {"n_nationkey": [cnat],
             "revenue_c4": [int(lis["revenue_c4"].sum())]},
            schema=out_schema,
        )

    agg = (
        uni.groupby("key").map_groups(join_group, batch_format="pandas")
        .groupby("n_nationkey")
        .aggregate(Sum("revenue_c4", alias_name="revenue_c4"))
    )
    return _final(agg.to_pandas())


def events_range_join(sf_dir: str, window_minutes: int = 60,
                      n_partitions: int = 256,
                      hot_key_threshold: int = 1_000_000,
                      n_salt: int = 16):
    """Range (interval) join inside the events stream: for every
    ``purchase`` event, the number of the same user's ``click`` events
    in the preceding ``window_minutes`` (half-open ``[t-W, t)``) —
    LEFT semantics, so zero-click purchases are reported too.

    Ray Data has no range join; the scale plan is the bucketized
    replicate-the-interval pattern: time is cut into fixed buckets of
    exactly the window width W, each probe row (click) lands in its
    ONE bucket, each interval row (purchase) is replicated to the at
    most TWO buckets its ``[t-W, t)`` window can overlap, both sides
    co-partition in ONE hash exchange, the exact interval predicate
    is applied vectorized, and a tiny per-purchase groupby sums the
    ≤2 bucket partials.  Cost is O(rows) exchange with ≤2×
    replication of the interval side only — no per-pair blowup, no
    all-to-all sort.

    The exchange key is a COARSE hash of (user, time-bucket) into
    ``n_partitions`` groups — grouping by the raw pair would dispatch
    one ``map_groups`` call per (user, bucket) (the per-group tax that
    dominated the first cut); inside each coarse group one lexsort
    lines both sides up and a run-walk applies searchsorted per
    (user, bucket) run.  Partitioning assumption: (user, bucket)
    pairs hash-distribute; a user hammering one bucket is the skew
    case and IS salted: a constant-size per-batch key-count partial +
    tiny groupby finds (user, bucket) keys with more than
    ``hot_key_threshold`` rows, hot CLICKS shard into ``n_salt``
    sub-partitions by event-id hash, hot PURCHASES replicate to the
    DISTINCT sub-partitions those shards hash to (distinct, because
    two shards colliding on one coarse partition would double-count),
    and the existing per-purchase Sum merges the shard partials — the
    hot group shrinks by ~n_salt with exact results.

    Output: ``event_id, n_prior_clicks`` for every purchase, sorted.
    """
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from ..sources.readers import read_parquet_clean

    w_us = window_minutes * 60_000_000

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )

    # ckey packs (user, bucket): user in the high bits, the window
    # bucket (µs//W, < 2^31 for any realistic epoch) in the low 32
    common = pa.schema(
        [("pkey", pa.int64()), ("ckey", pa.int64()), ("side", pa.int8()),
         ("rid", pa.int64()), ("t_us", pa.int64())]
    )

    def _pack(uid: "np.ndarray", bkt: "np.ndarray") -> "np.ndarray":
        if uid.size and (int(uid.max()) >= (1 << 31) or int(uid.min()) < 0):
            # 64-bit (snowflake-style) or negative user ids would wrap
            # the packed key and merge different users' streams — fail
            # loudly; such corpora need a (user, bucket) composite key
            raise ValueError("events_range_join: user_id outside "
                             "[0, 2^31) overflows the packed "
                             "(user, bucket) key")
        if bkt.size and (int(bkt.max()) >= (1 << 32) or int(bkt.min()) < 0):
            # buckets 2^32 apart (tiny windows x far-future timestamps)
            # would silently merge under a mask — assert, don't mask
            raise ValueError("events_range_join: window bucket outside "
                             "[0, 2^32) would collide in the packed key")
        return (uid << np.int64(32)) | bkt

    def prep(b: pd.DataFrame) -> pa.Table:
        t_us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        uid = b["user_id"].to_numpy().astype("int64")
        rid = b["event_id"].to_numpy().astype("int64")
        is_click = (b["event_type"] == "click").to_numpy()
        is_purch = (b["event_type"] == "purchase").to_numpy()

        ck_c = _pack(uid[is_click], t_us[is_click] // w_us)
        # purchase window [t-W, t) overlaps buckets B(t-W) and B(t-1)
        pu, pt = uid[is_purch], t_us[is_purch]
        lo_b = (pt - w_us) // w_us
        hi_b = (pt - 1) // w_us
        two = hi_b != lo_b
        ck_p = np.concatenate([_pack(pu, lo_b), _pack(pu[two], hi_b[two])])
        rid_p = np.concatenate([rid[is_purch], rid[is_purch][two]])
        t_p = np.concatenate([pt, pt[two]])

        ckey = np.concatenate([ck_c, ck_p])
        side = np.concatenate(
            [np.zeros(len(ck_c), np.int8), np.ones(len(ck_p), np.int8)]
        )
        rids = np.concatenate([rid[is_click], rid_p])
        ts = np.concatenate([t_us[is_click], t_p])
        # Fibonacci mix so sequential users spread across partitions
        # (numpy floored %% with a positive divisor is already in
        # [0, n_partitions))
        pkey = ((ckey * np.int64(-7046029254386353131)) >> np.int64(40)) \
            % np.int64(n_partitions)
        return pa.table(
            {"pkey": pa.array(pkey), "ckey": pa.array(ckey),
             "side": pa.array(side), "rid": pa.array(rids),
             "t_us": pa.array(ts)},
            schema=common,
        )

    part_schema = pa.schema([("event_id", pa.int64()),
                             ("n_prior_clicks", pa.int64())])

    _warn = _skew_warn()

    def count_group(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("events_range_join.pkey", len(group), _warn)
        ckey = group["ckey"].to_numpy()
        side = group["side"].to_numpy()
        t = group["t_us"].to_numpy()
        rid = group["rid"].to_numpy()
        order = np.lexsort((t, side, ckey))
        ckey, side, t, rid = ckey[order], side[order], t[order], rid[order]
        # per (user, bucket) run: clicks first (side 0, time-sorted),
        # then purchases — searchsorted within the click slice
        starts = np.flatnonzero(np.r_[True, ckey[1:] != ckey[:-1]])
        ends = np.r_[starts[1:], len(ckey)]
        out_rid, out_n = [], []
        for s, e in zip(starts, ends):
            n_clicks = int(np.searchsorted(side[s:e], 1, "left"))
            p0 = s + n_clicks
            if p0 == e:
                continue  # clicks only
            clicks = t[s:p0]
            pt = t[p0:e]
            n = (np.searchsorted(clicks, pt, "left")
                 - np.searchsorted(clicks, pt - w_us, "left"))
            out_rid.append(rid[p0:e])
            out_n.append(n)
        if not out_rid:
            return part_schema.empty_table()
        return pa.table(
            {"event_id": pa.array(np.concatenate(out_rid)),
             "n_prior_clicks": pa.array(
                 np.concatenate(out_n).astype(np.int64))},
            schema=part_schema,
        )

    import ray

    _MIX = np.int64(-7046029254386353131)

    # materialized once: the narrow prepped table feeds both the
    # hot-key count pass and the join itself (never re-reads/re-preps)
    prepped = ds.map_batches(prep, batch_format="pandas").materialize()

    # hot-key detection: per-batch value_counts (constant-size partial
    # per distinct key per batch) through a narrow combine level; when
    # the combined count (an upper bound on distinct keys) fits, the
    # sum + threshold filter finalize on the driver — only a genuinely
    # corpus-scale key space pays the groupby all-to-all
    cnt_schema = pa.schema([("ckey", pa.int64()), ("n", pa.int64())])

    def key_counts(b: pa.Table) -> pa.Table:
        vc = b["ckey"].combine_chunks().value_counts()
        return pa.table(
            {"ckey": vc.field("values"),
             "n": vc.field("counts").cast(pa.int64())},
            schema=cnt_schema,
        )

    def count_combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("ckey", as_index=False).agg(n=("n", "sum"))
        return pa.table(
            {"ckey": g["ckey"].to_numpy().astype(np.int64),
             "n": g["n"].to_numpy().astype(np.int64)},
            schema=cnt_schema,
        )

    count_partials = (
        prepped.map_batches(key_counts, batch_format="pyarrow")
        .map_batches(count_combine, batch_format="pandas",
                     batch_size=65536)
        .materialize()
    )
    if count_partials.count() <= 2_000_000:
        cdf = (count_partials.to_pandas()
               .groupby("ckey", as_index=False).agg(n=("n", "sum")))
        hot_df = cdf[cdf["n"] > hot_key_threshold]
    else:
        hot_df = (
            count_partials
            .groupby("ckey").aggregate(Sum("n", alias_name="n"))
            .filter(expr=f"n > {hot_key_threshold}")
            .to_pandas()
        )

    if len(hot_df):
        hot_ref = ray.put(np.sort(hot_df["ckey"].to_numpy().astype(np.int64)))
        S = np.int64(n_salt)

        def mix_salt(keys: "np.ndarray", s) -> "np.ndarray":
            # same Fibonacci mix, offset by the shard id (+1 so shard 0
            # never collides with the unsalted pkey of the same key)
            return (((keys * S + s + np.int64(1)) * _MIX)
                    >> np.int64(40)) % np.int64(n_partitions)

        def salt(b: pd.DataFrame) -> pa.Table:
            hot = ray.get(hot_ref)
            ck = b["ckey"].to_numpy().astype(np.int64)
            side = b["side"].to_numpy()
            rid = b["rid"].to_numpy().astype(np.int64)
            t = b["t_us"].to_numpy().astype(np.int64)
            pk = b["pkey"].to_numpy().astype(np.int64).copy()
            m = hot[np.searchsorted(hot, ck).clip(0, len(hot) - 1)] == ck
            mc = m & (side == 0)
            if mc.any():
                pk[mc] = mix_salt(ck[mc], rid[mc] % S)
            mp = m & (side == 1)
            if mp.any():
                # purchase copies go to the DISTINCT shard partitions:
                # row-sort the (n_hot, S) pkey matrix and mask repeats
                # so a shard collision can never count a click twice
                pmat = np.sort(np.stack(
                    [mix_salt(ck[mp], np.int64(s)) for s in range(n_salt)],
                    axis=1), axis=1)
                keep_m = np.ones_like(pmat, dtype=bool)
                keep_m[:, 1:] = pmat[:, 1:] != pmat[:, :-1]
                reps = keep_m.sum(axis=1)
                flat = keep_m.ravel()
                pk = np.concatenate([pk[~mp], pmat.ravel()[flat]])
                ck = np.concatenate([ck[~mp], np.repeat(ck[mp], reps)])
                side = np.concatenate(
                    [side[~mp], np.ones(int(reps.sum()), np.int8)])
                rid = np.concatenate([rid[~mp], np.repeat(rid[mp], reps)])
                t = np.concatenate([t[~mp], np.repeat(t[mp], reps)])
            return pa.table(
                {"pkey": pa.array(pk), "ckey": pa.array(ck),
                 "side": pa.array(side.astype(np.int8)),
                 "rid": pa.array(rid), "t_us": pa.array(t)},
                schema=common,
            )

        prepped = prepped.map_batches(salt, batch_format="pandas")

    out = (
        prepped
        .groupby("pkey")
        .map_groups(count_group, batch_format="pandas")
        .groupby("event_id")
        .aggregate(Sum("n_prior_clicks", alias_name="n_prior_clicks"))
    )
    df = out.sort("event_id").to_pandas()
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def props_extract_stats(sf_dir: str):
    """Semi-structured extraction: parse the ``props`` JSON column
    (``{"k": <int>}``) inside map_batches — vectorized regex extract,
    no per-row json.loads — and aggregate per event type.  The
    schema-on-read pattern for log/event pipelines: the JSON never
    shuffles, only the extracted (event_type, k) pairs feed per-batch
    partials into a 5-row groupby."""
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        # strict integer values only (boundary-anchored), mirroring the
        # oracle's TRY_CAST: a dirty row ('{}', '{"k": 3.5}', bad JSON)
        # becomes NULL and is skipped by the k-aggregates, never a crash;
        # n_events still counts every row
        # ASCII-explicit classes pin Python-re and DuckDB-RE2 \s/\d to
        # the same semantics (the repo-wide _TOKEN_RUN convention)
        k = b["props"].str.extract(
            r'"k"[ \t\n\r\f\v]*:[ \t\n\r\f\v]*(-?[0-9]+)[ \t\n\r\f\v]*[,}]',
            expand=False).astype("float64")
        df = pd.DataFrame({"event_type": b["event_type"], "k": k})
        g = df.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), n_valid=("k", "count"),
            sum_k=("k", "sum"), min_k=("k", "min"), max_k=("k", "max"),
        )
        # a batch whose type has NO valid k must not bias the global
        # Min/Max: neutral sentinels, not 0.  n_valid (count of
        # non-NULL k) is the authoritative all-NULL detector — the
        # sentinel itself is a legal data value (r4 ADVICE)
        g["n_valid"] = g["n_valid"].astype("int64")
        g["sum_k"] = g["sum_k"].fillna(0).astype("int64")
        g["min_k"] = g["min_k"].fillna(float(1 << 62)).astype("int64")
        g["max_k"] = g["max_k"].fillna(float(-(1 << 62))).astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"), n_valid=("n_valid", "sum"),
            sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
            max_k=("max_k", "max"))
        for c in ("n_events", "n_valid", "sum_k", "min_k", "max_k"):
            g[c] = g[c].astype("int64")
        return g

    # event-type-sized partials: a narrow combine level + driver merge
    # instead of the fixed-cost small-result exchange (order-free
    # sum/min/max; the neutral sentinels merge exactly like they did
    # in the exchange)
    df = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("event_type", as_index=False)
        .agg(n_events=("n_events", "sum"), n_valid=("n_valid", "sum"),
             sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
             max_k=("max_k", "max"))
        .sort_values("event_type").reset_index(drop=True)
    )
    # a type with ZERO valid k corpus-wide still carries the neutral
    # sentinels here; the SQL contract for an all-NULL aggregate is
    # NULL — emit NaN (float64: duckdb's .df() converts a BIGINT
    # column containing NULL to float64, so the oracle side widens
    # identically and the value hashes agree) for those rows instead
    # of leaking ±2^62 (r3 ADVICE; dirty detection via the explicit
    # n_valid count, r4 ADVICE)
    dirty = df["n_valid"].to_numpy() == 0
    df = df.drop(columns=["n_valid"])
    df["n_events"] = df["n_events"].astype("int64")
    if dirty.any():
        for c in ("sum_k", "min_k", "max_k"):
            df[c] = df[c].astype("float64")
            df.loc[dirty, c] = float("nan")
    else:
        for c in ("sum_k", "min_k", "max_k"):
            df[c] = df[c].astype("int64")
    return df


def events_hourly_uniques(sf_dir: str, broadcast_limit: int = 2_000_000):
    """Distinct users per tumbling hour — the COUNT(DISTINCT) window
    aggregate, done EXACTLY with two-level aggregation: each batch
    first dedups its own (hour, user) pairs locally (so at most
    |users| rows per hour leave any task, not |events|); then,
    count-gated on the parquet-footer event count, the deduped pair
    stream either collects to a single driver ``nunique`` groupby
    (under ``broadcast_limit``) or co-partitions with ONE groupby on
    the hour key counting uniques per group vectorized.  Group count
    = number of windows (bounded), group size = active users in that
    hour; a hot hour is the skew case and would salt on a user-hash
    prefix.  The raw event stream never shuffles."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    pair_schema = pa.schema([("hour_us", pa.int64()),
                             ("user_id", pa.int64())])

    def local_pairs(b: pd.DataFrame) -> pa.Table:
        d = pd.DataFrame(
            {"hour_us": b["ts"].dt.floor("h").to_numpy()
                 .astype("datetime64[us]").astype("int64"),
             "user_id": b["user_id"].astype("int64")}
        ).drop_duplicates()
        return pa.table(
            {"hour_us": pa.array(d["hour_us"].astype("int64")),
             "user_id": pa.array(d["user_id"].astype("int64"))},
            schema=pair_schema,
        )

    cnt_schema = pa.schema([("hour_us", pa.int64()),
                            ("n_unique_users", pa.int64())])

    def hour_uniques(g: pd.DataFrame) -> pa.Table:
        return pa.table(
            {"hour_us": [int(g["hour_us"].iloc[0])],
             "n_unique_users": [int(g["user_id"].nunique())]},
            schema=cnt_schema,
        )

    pairs = ds.map_batches(local_pairs, batch_format="pandas")

    # count-gate on the parquet-footer event count (pairs ≤ events):
    # under the driver budget the locally-deduped pair stream collects
    # and the per-hour nunique runs as one driver groupby — no
    # exchange; past it the hour-key co-partition below is the scale
    # path (group count = windows, group size = active users/hour)
    import pyarrow.dataset as pads

    n_events = pads.dataset(f"{sf_dir}/events.parquet").count_rows()
    if n_events <= broadcast_limit:
        pdf = pairs.to_pandas().drop_duplicates()
        df = (
            pdf.groupby("hour_us", as_index=False)
            .agg(n_unique_users=("user_id", "nunique"))
            .sort_values("hour_us").reset_index(drop=True)
        )
    else:
        df = (
            pairs.groupby("hour_us")
            .map_groups(hour_uniques, batch_format="pandas")
            .sort("hour_us")
            .to_pandas()
        )
    df["hour"] = df["hour_us"].astype("datetime64[us]")
    df["n_unique_users"] = df["n_unique_users"].astype("int64")
    return df[["hour", "n_unique_users"]]


def _funnel_scan(uid, stp, ts, n_steps: int):
    """Exact chained strictly-after funnel counts over one bucket's
    (user, step, ts) rows — ONE lexsort, then a per-step
    first-occurrence pick: after sorting by (user, step, ts) every
    (user, step) run is ts-ascending, so "min ts strictly after the
    user's running bound" is the FIRST row of the run that clears the
    bound.  Pure numpy segment ops, no per-user Python loop — time is
    O(rows log rows) regardless of users-per-bucket (r4 VERDICT #3).
    Returns int64 depths[n_steps]: users reaching each step in order."""
    import numpy as np

    depths = np.zeros(n_steps, dtype=np.int64)
    if uid.size == 0:
        return depths
    order = np.lexsort((ts, stp, uid))
    uid, stp, ts = uid[order], stp[order], ts[order]
    _, inv = np.unique(uid, return_inverse=True)
    n_u = int(inv[-1]) + 1 if inv.size else 0
    bound = np.full(n_u, np.int64(-(1 << 62)))
    alive = np.ones(n_u, dtype=bool)
    for k in range(n_steps):
        rk = stp == k
        u_k = inv[rk]                   # non-decreasing user slots
        t_k = ts[rk]                    # ascending within each slot
        valid = np.flatnonzero((t_k > bound[u_k]) & alive[u_k])
        if valid.size == 0:
            depths[k:] = 0
            break
        u_v = u_k[valid]
        first = np.ones(u_v.size, dtype=bool)
        first[1:] = u_v[1:] != u_v[:-1]
        hit_users = u_v[first]
        alive = np.zeros(n_u, dtype=bool)
        alive[hit_users] = True
        bound[hit_users] = t_k[valid[first]]
        depths[k] = hit_users.size
    return depths


def user_funnel(sf_dir: str, steps=("view", "click", "purchase"),
                n_buckets: int = 256):
    """Ordered-sequence funnel: how many users progressed through
    ``steps`` IN ORDER (first view, then the first click strictly
    after it, then the first purchase strictly after that) — the
    conversion-funnel pattern an event-analytics pipeline runs.

    Distributed shape: step-0 events reduce inside ``map_batches`` to
    ONE row per (user, batch) carrying the per-batch MIN timestamp
    (the global first step-0 event is the min of batch minima), so
    the step-0 side of the exchange is bounded by distinct users per
    batch.  The per-batch MIN is NOT sufficient for steps beyond the
    first (the first click AFTER the first view isn't the global min
    click), so step k>0 partials keep ALL candidate (user, step, ts)
    rows, deduplicated — the exchange is O(matching later-step
    events), not constant-size.  A single groupby on a coarse
    user-hash bucket co-partitions each user's rows, every bucket
    runs ONE numpy segment scan over its lexsorted rows (no per-user
    Python loop), and the driver sums the tiny per-bucket step
    counts.  Strictly-after semantics match the SQL oracle's chained
    ``ts >`` joins.

    Output: one row, ``n_<step1>, n_<step1>_<step2>, ...`` counts.
    """
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    step_ix = {s: i for i, s in enumerate(steps)}

    part_schema = pa.schema(
        [("bucket", pa.int64()), ("user_id", pa.int64()),
         ("step", pa.int64()), ("ts_us", pa.int64())]
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        m = b["event_type"].isin(steps).to_numpy()
        if not m.any():
            return part_schema.empty_table()
        sub = b[m]
        uid = sub["user_id"].to_numpy().astype("int64")
        stp = sub["event_type"].map(step_ix).to_numpy().astype("int64")
        ts = sub["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        # step 0: only the per-user batch MIN can ever be the funnel
        # entry, so ship one row per user; steps k>0 keep every
        # distinct candidate ts (the chained bound isn't known yet)
        df = pd.DataFrame({"user_id": uid, "step": stp, "ts_us": ts})
        is0 = df["step"].to_numpy() == 0
        if is0.any():
            d0 = (df[is0].groupby("user_id", as_index=False)["ts_us"]
                  .min())
            d0.insert(1, "step", np.int64(0))
            df = pd.concat([d0, df[~is0].drop_duplicates()],
                           ignore_index=True)
        else:
            df = df.drop_duplicates()
        buck = ((df["user_id"].to_numpy()
                 * np.int64(-7046029254386353131)) >> np.int64(40)) \
            % np.int64(n_buckets)
        return pa.table(
            {"bucket": pa.array(buck), "user_id": pa.array(df["user_id"]),
             "step": pa.array(df["step"]), "ts_us": pa.array(df["ts_us"])},
            schema=part_schema,
        )

    cnt_schema = pa.schema(
        [("depth", pa.int64()), ("n_users", pa.int64())]
    )

    _warn = _skew_warn()

    def walk(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("user_funnel.bucket", len(group), _warn)
        depths = _funnel_scan(
            group["user_id"].to_numpy().astype(np.int64),
            group["step"].to_numpy().astype(np.int64),
            group["ts_us"].to_numpy().astype(np.int64),
            len(steps),
        )
        return pa.table(
            {"depth": np.arange(len(steps), dtype=np.int64),
             "n_users": depths},
            schema=cnt_schema,
        )

    # the walk emits len(steps) rows per bucket — ≤ n_buckets × steps
    # total regardless of corpus size, so the depth reduce is a
    # bounded driver finalize, not a second exchange (~0.8 s fixed)
    out = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(walk, batch_format="pandas")
        .to_pandas()
        .groupby("depth", as_index=False)
        .agg(n_users=("n_users", "sum"))
        .sort_values("depth")
    )
    names = []
    for i in range(len(steps)):
        names.append("n_" + "_".join(steps[: i + 1]))
    counts = {n: 0 for n in names}
    for _, r in out.iterrows():
        counts[names[int(r["depth"])]] = int(r["n_users"])
    return pd.DataFrame([counts]).astype("int64")


def cohort_retention(sf_dir: str, n_buckets: int = 256,
                     broadcast_limit: int = 2_000_000):
    """Weekly cohort retention: for each signup-week cohort (a user's
    first-ever event week), how many of its users were active again
    ``week_off`` weeks later — the engagement matrix every
    event-analytics pipeline reports.

    Weeks are Monday-aligned integer indices computed as
    ``(epoch_days + 3) // 7`` (1970-01-01 was a Thursday) on BOTH
    sides, so no date_trunc semantics can diverge between pandas and
    the SQL oracle.

    Distributed shape (the events_hourly_uniques pattern): each batch
    first dedups its own (user, week) pairs locally — at most
    |users|×|weeks| rows leave any task, not |events|.  Under the
    parquet-footer count gate the deduped pair stream collects to one
    driver pass; past it, ONE groupby on a coarse user-hash bucket
    co-partitions each user's pairs (users are disjoint across
    buckets, so per-bucket (cohort, offset) counts are additive) and
    the driver sums the tiny per-bucket matrices — weeks² rows per
    bucket, independent of corpus size.  The raw event stream never
    shuffles."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )

    pair_schema = pa.schema([("bucket", pa.int64()),
                             ("user_id", pa.int64()),
                             ("wk", pa.int64())])

    def local_pairs(b: pd.DataFrame) -> pa.Table:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        wk = (us // np.int64(86_400_000_000) + 3) // 7
        d = pd.DataFrame(
            {"user_id": b["user_id"].to_numpy().astype("int64"), "wk": wk}
        ).drop_duplicates()
        buck = ((d["user_id"].to_numpy()
                 * np.int64(-7046029254386353131)) >> np.int64(40)) \
            % np.int64(n_buckets)
        return pa.table(
            {"bucket": pa.array(buck),
             "user_id": pa.array(d["user_id"].to_numpy()),
             "wk": pa.array(d["wk"].to_numpy())},
            schema=pair_schema,
        )

    def _matrix(d: pd.DataFrame) -> pd.DataFrame:
        """(cohort_week, week_off) counts over distinct (user, wk)
        rows — each user contributes once per pair because its weeks
        are already distinct."""
        cohort = d.groupby("user_id")["wk"].transform("min").to_numpy()
        return (
            pd.DataFrame({"cohort_week": cohort,
                          "week_off": d["wk"].to_numpy() - cohort})
            .groupby(["cohort_week", "week_off"], as_index=False)
            .agg(n_users=("week_off", "size"))
        )

    cnt_schema = pa.schema([("cohort_week", pa.int64()),
                            ("week_off", pa.int64()),
                            ("n_users", pa.int64())])

    _warn = _skew_warn()

    def walk(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("cohort_retention.bucket", len(group), _warn)
        d = group.drop_duplicates(["user_id", "wk"])
        m = _matrix(d)
        return pa.table(
            {"cohort_week": pa.array(m["cohort_week"].to_numpy()),
             "week_off": pa.array(m["week_off"].to_numpy()),
             "n_users": pa.array(m["n_users"].to_numpy())},
            schema=cnt_schema,
        )

    pairs = ds.map_batches(local_pairs, batch_format="pandas")

    import pyarrow.dataset as pads

    n_events = pads.dataset(f"{sf_dir}/events.parquet").count_rows()
    if n_events <= broadcast_limit:
        df = _matrix(pairs.to_pandas().drop_duplicates(
            ["user_id", "wk"]))
    else:
        df = (
            pairs.groupby("bucket")
            .map_groups(walk, batch_format="pandas")
            .to_pandas()
            .groupby(["cohort_week", "week_off"], as_index=False)
            .agg(n_users=("n_users", "sum"))
        )
    df = df.sort_values(["cohort_week", "week_off"]).reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].astype("int64")
    return df


def rolling_active_users(sf_dir: str, window_days: int = 7,
                         n_buckets: int = 64,
                         broadcast_limit: int = 2_000_000):
    """Daily / rolling-window active users (DAU, WAU) plus the
    DAU/WAU stickiness ratio — the engagement dashboard every event
    pipeline feeds.  For each calendar day that has events: distinct
    users that day (``dau``), distinct users across the trailing
    ``window_days`` window (``wau``), and the exact integer ratio
    ``stickiness_x1000 = dau*1000 // wau``.

    Days are epoch-day integers (``ts_us // 86_400_000_000``), the
    same arithmetic as the SQL oracle's DATE_DIFF form.

    Distributed shape: batches dedup their own (user, day) pairs
    locally — at most |users|×|days| rows leave any task.  Under the
    parquet-footer count gate the pair stream collects to one driver
    pass; past it, each pair expands to its ``window_days`` member
    windows (anchor flagged) and ONE groupby on a coarse
    window-day-hash bucket counts distinct users / distinct anchor
    users per window vectorized — group size is bounded by
    users×window_days, and only windows anchored on a day that
    actually has events are emitted.  The raw event stream never
    shuffles."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts"]
    )
    day_us = np.int64(86_400_000_000)

    pair_schema = pa.schema([("day", pa.int64()), ("user_id", pa.int64())])

    def local_pairs(b: pd.DataFrame) -> pa.Table:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        d = pd.DataFrame(
            {"day": us // day_us,
             "user_id": b["user_id"].to_numpy().astype("int64")}
        ).drop_duplicates()
        return pa.table(
            {"day": pa.array(d["day"].to_numpy()),
             "user_id": pa.array(d["user_id"].to_numpy())},
            schema=pair_schema,
        )

    def _finalize(dau_wau: pd.DataFrame) -> pd.DataFrame:
        dau_wau = dau_wau.sort_values("day").reset_index(drop=True)
        out = pd.DataFrame({
            "day": dau_wau["day"].astype("int64"),
            "dau": dau_wau["dau"].astype("int64"),
            "wau": dau_wau["wau"].astype("int64"),
        })
        out["stickiness_x1000"] = (out["dau"] * 1000) // out["wau"]
        return out

    pairs = ds.map_batches(local_pairs, batch_format="pandas")

    import pyarrow.dataset as pads

    n_events = pads.dataset(f"{sf_dir}/events.parquet").count_rows()
    if n_events <= broadcast_limit:
        p = pairs.to_pandas().drop_duplicates()
        days = np.sort(p["day"].unique())
        day_arr = p["day"].to_numpy()
        uid_arr = p["user_id"].to_numpy()
        rows = []
        for d in days:
            in_w = (day_arr > d - window_days) & (day_arr <= d)
            rows.append((int(d),
                         int(pd.unique(uid_arr[day_arr == d]).size),
                         int(pd.unique(uid_arr[in_w]).size)))
        return _finalize(pd.DataFrame(rows,
                                      columns=["day", "dau", "wau"]))

    # scale path: expand each (user, day) pair to its member windows;
    # windows whose anchor day has no events are dropped inside the
    # group (the anchor flag doubles as the present-day witness)
    exp_schema = pa.schema([("bucket", pa.int64()), ("win", pa.int64()),
                            ("user_id", pa.int64()),
                            ("anchor", pa.int64())])

    def expand(b: pd.DataFrame) -> pa.Table:
        day = np.repeat(b["day"].to_numpy(), window_days)
        uid = np.repeat(b["user_id"].to_numpy(), window_days)
        off = np.tile(np.arange(window_days, dtype=np.int64), len(b))
        win = day + off
        anchor = (off == 0).astype("int64")
        buck = ((win * np.int64(-7046029254386353131)) >> np.int64(40)) \
            % np.int64(n_buckets)
        return pa.table(
            {"bucket": pa.array(buck), "win": pa.array(win),
             "user_id": pa.array(uid), "anchor": pa.array(anchor)},
            schema=exp_schema,
        )

    cnt_schema = pa.schema([("day", pa.int64()), ("dau", pa.int64()),
                            ("wau", pa.int64())])

    _warn = _skew_warn()

    def walk(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("rolling_active_users.bucket", len(group), _warn)
        g = (group.groupby(["win", "user_id"], as_index=False)
             .agg(anchor=("anchor", "max")))
        m = g.groupby("win", as_index=False).agg(
            wau=("user_id", "size"), dau=("anchor", "sum"),
            present=("anchor", "max"))
        m = m[m["present"] == 1]
        return pa.table(
            {"day": pa.array(m["win"].to_numpy().astype("int64")),
             "dau": pa.array(m["dau"].to_numpy().astype("int64")),
             "wau": pa.array(m["wau"].to_numpy().astype("int64"))},
            schema=cnt_schema,
        )

    df = (
        pairs.map_batches(expand, batch_format="pandas")
        .groupby("bucket")
        .map_groups(walk, batch_format="pandas")
        .to_pandas()
    )
    return _finalize(df)


def event_spike_days(sf_dir: str):
    """Daily volume anomaly flags per event type — the monitoring query
    a production event pipeline runs to catch bot bursts / instrument
    regressions.  For every (event_type, calendar day) with events:
    the day's count plus ``spike`` = 1 when the count exceeds the
    type's mean daily count by more than two population standard
    deviations.

    The 2σ test is evaluated in EXACT integer arithmetic (no float
    mean/σ):  with ``n`` = the type's active-day count, ``T`` = its
    total events and ``Q`` = sum of squared daily counts,

        cnt > mean + 2σ  ⇔  n·cnt − T > 0  and
                            (n·cnt − T)² > 4·(n·Q − T²)

    which the SQL oracle states verbatim, so Ray and DuckDB agree
    bit-exactly.  The driver finalize compares PYTHON ints (no int64
    squaring overflow even when daily counts reach 3e9+ at full
    scale).

    Distributed shape: per-batch (event_type, day) count partials →
    one narrow combine level → a driver table bounded by
    types × days regardless of event count.  The event stream never
    shuffles."""

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    day_us = np.int64(86_400_000_000)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = (
            pd.DataFrame({"event_type": b["event_type"], "day": us // day_us})
            .groupby(["event_type", "day"], as_index=False)
            .size().rename(columns={"size": "n_events"})
        )
        for c in ("day", "n_events"):
            g[c] = g[c].astype("int64")
        return g

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("n_events", "sum"))
        for c in ("day", "n_events"):
            g[c] = g[c].astype("int64")
        return g

    counts = (
        ds.map_batches(partial, batch_format="pandas")
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False).agg(
            n_events=("n_events", "sum"))
        .sort_values(["event_type", "day"]).reset_index(drop=True)
    )
    spikes = []
    for _etype, g in counts.groupby("event_type", sort=False):
        cnts = [int(x) for x in g["n_events"]]
        n, total = len(cnts), sum(cnts)
        q = sum(c * c for c in cnts)
        var4 = 4 * (n * q - total * total)
        for c in cnts:
            d = n * c - total
            spikes.append(1 if d > 0 and d * d > var4 else 0)
    counts["day"] = counts["day"].astype("int64")
    counts["n_events"] = counts["n_events"].astype("int64")
    counts["spike"] = pd.Series(spikes, dtype="int64")
    return counts[["event_type", "day", "n_events", "spike"]]


def event_gap_quantiles(sf_dir: str, n_buckets: int = 256):
    """Inter-arrival profile of the event stream: per-event-type
    quantiles (p50/p90/p99) of the gap in whole seconds between a
    user's consecutive events, the gap attributed to the LATER event's
    type — the latency statistic behind session-gap tuning and
    bot-burst detection.  Gap semantics match SQL
    ``date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY
    ts, event_id), ts)``: each timestamp truncates to seconds BEFORE
    the difference (boundary crossings, not floor of the delta).
    Quantile definition: smallest gap whose per-type cumulative count
    reaches ``ceil(p * N_type)`` — the integer idiom of
    :func:`~.curation.source_length_quantiles`, mirrored verbatim in
    the oracle.

    Distributed plan: ONE hash exchange on a 256-way coarse user
    bucket (``groupby(bucket).map_groups``, the :func:`user_funnel`
    co-partition — never a per-user group); inside each bucket a
    single (user, ts, event_id) sort + numpy diff masked at user
    boundaries yields the gaps, which collapse to (event_type, gap)
    histogram partials before leaving the task.  The driver table is
    bounded by event_types × distinct gap values, and the final
    quantile scan is a cumulative-sum walk over it."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    hist_schema = pa.schema([("event_type", pa.string()),
                             ("gap", pa.int64()), ("cnt", pa.int64())])

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = (b["user_id"] % n_buckets).astype("int64")
        return b

    def gaps(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["user_id", "ts", "event_id"])
        # truncate each side to seconds, THEN difference (SQL
        # date_diff counts second-boundary crossings)
        ts = g["ts"].astype("int64").to_numpy() // 1_000_000
        uid = g["user_id"].to_numpy()
        same = uid[1:] == uid[:-1]
        gap_s = np.diff(ts)[same]
        et = g["event_type"].to_numpy()[1:][same]
        if not len(gap_s):
            return pa.table({"event_type": pa.array([], pa.string()),
                             "gap": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())},
                            schema=hist_schema)
        h = (pd.DataFrame({"event_type": et, "gap": gap_s})
             .groupby(["event_type", "gap"], as_index=False).size()
             .rename(columns={"size": "cnt"}))
        return pa.table({"event_type": h["event_type"].astype(str).to_numpy(),
                         "gap": h["gap"].to_numpy().astype("int64"),
                         "cnt": h["cnt"].to_numpy().astype("int64")},
                        schema=hist_schema)

    hist = (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("bucket")
            .map_groups(gaps, batch_format="pandas")
            .to_pandas()
            .groupby(["event_type", "gap"], as_index=False)
            .agg(cnt=("cnt", "sum"))
            .sort_values(["event_type", "gap"]).reset_index(drop=True))
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        values = g["gap"].to_numpy()
        cum = np.cumsum(g["cnt"].to_numpy())
        total = int(cum[-1])
        for p in (50, 90, 99):
            rank = (p * total + 99) // 100
            idx = int(np.searchsorted(cum, rank, side="left"))
            rows.append({"event_type": et, "p_x100": p,
                         "gap_s": int(values[min(idx, len(values) - 1)]),
                         "n_gaps": total})
    df = pd.DataFrame(rows)
    if df.empty:
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype="object"),
             "p_x100": pd.Series([], dtype="int64"),
             "gap_s": pd.Series([], dtype="int64"),
             "n_gaps": pd.Series([], dtype="int64")})
    for c in ("p_x100", "gap_s", "n_gaps"):
        df[c] = df[c].astype("int64")
    return df[["event_type", "p_x100", "gap_s", "n_gaps"]]


def event_transition_matrix(sf_dir: str, n_buckets: int = 256):
    """First-order Markov transition matrix over each user's
    time-ordered event types — the sequence-model statistic behind
    next-action prediction and bot detection (a bot's transition mass
    concentrates on one edge): for every consecutive pair in a user's
    (ts, event_id)-ordered stream, count (prev_type, next_type) and
    normalize per row (``p = n / Σ_next n``, rounded to 6 decimals).

    Distributed plan: ONE hash exchange on the 256-way coarse user
    bucket (the :func:`event_gap_quantiles` co-partition); inside each
    bucket a single sort + shifted-compare builds the pairs and
    collapses them to (prev, next) count partials — at most
    |types|² rows leave each task — and the driver finalizes the
    types²-sized matrix."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    pair_schema = pa.schema([("prev_type", pa.string()),
                             ("next_type", pa.string()),
                             ("n", pa.int64())])

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = (b["user_id"] % n_buckets).astype("int64")
        return b

    def pairs(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["user_id", "ts", "event_id"])
        uid = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        if not same.any():
            return pa.table({"prev_type": pa.array([], pa.string()),
                             "next_type": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())},
                            schema=pair_schema)
        h = (pd.DataFrame({"prev_type": et[:-1][same],
                           "next_type": et[1:][same]})
             .groupby(["prev_type", "next_type"], as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.table(
            {"prev_type": h["prev_type"].astype(str).to_numpy(),
             "next_type": h["next_type"].astype(str).to_numpy(),
             "n": h["n"].to_numpy().astype("int64")},
            schema=pair_schema)

    c = (ds.map_batches(bucketize, batch_format="pandas")
         .groupby("bucket")
         .map_groups(pairs, batch_format="pandas")
         .to_pandas()
         .groupby(["prev_type", "next_type"], as_index=False)
         .agg(n=("n", "sum")))
    if c.empty:
        return pd.DataFrame(
            {"prev_type": pd.Series([], dtype="object"),
             "next_type": pd.Series([], dtype="object"),
             "n": pd.Series([], dtype="int64"),
             "p": pd.Series([], dtype="float64")})
    totals = c.groupby("prev_type")["n"].transform("sum")
    c["n"] = c["n"].astype("int64")
    c["p"] = (c["n"] / totals).round(6)
    c = c.sort_values(["prev_type", "next_type"]).reset_index(drop=True)
    return c[["prev_type", "next_type", "n", "p"]]


def session_length_histogram(sf_dir: str, gap_seconds: int = 1800,
                             n_buckets: int = 256):
    """Distribution of session lengths (events per session) across the
    whole stream — the engagement-shape statistic behind bounce-rate
    and session-depth dashboards.  A session breaks when the gap
    between a user's consecutive events exceeds ``gap_seconds``, with
    the :func:`event_gap_quantiles` gap semantics (each timestamp
    truncates to seconds before differencing) and (ts, event_id)
    ordering pinned on both sides.

    Distributed plan: ONE coarse-user-bucket exchange; inside each
    bucket a single sort + vectorized break-scan (run lengths between
    break positions) collapses to (session_len, n_sessions) histogram
    partials — bounded by the longest session, not the event count —
    and the driver sums the histogram."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id"])

    hist_schema = pa.schema([("session_len", pa.int64()),
                             ("n_sessions", pa.int64())])

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["bucket"] = (b["user_id"] % n_buckets).astype("int64")
        return b

    def lengths(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["user_id", "ts", "event_id"])
        ts = g["ts"].astype("int64").to_numpy() // 1_000_000
        uid = g["user_id"].to_numpy()
        if not len(g):
            return pa.table({"session_len": pa.array([], pa.int64()),
                             "n_sessions": pa.array([], pa.int64())},
                            schema=hist_schema)
        # a session starts at every user change or over-gap step
        start = np.empty(len(g), dtype=bool)
        start[0] = True
        start[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > gap_seconds)
        starts = np.flatnonzero(start)
        lens = np.diff(np.append(starts, len(g)))
        vals, cnts = np.unique(lens, return_counts=True)
        return pa.table({"session_len": vals.astype(np.int64),
                         "n_sessions": cnts.astype(np.int64)},
                        schema=hist_schema)

    df = (ds.map_batches(bucketize, batch_format="pandas")
          .groupby("bucket")
          .map_groups(lengths, batch_format="pandas")
          .to_pandas()
          .groupby("session_len", as_index=False)
          .agg(n_sessions=("n_sessions", "sum"))
          .sort_values("session_len").reset_index(drop=True))
    for c in ("session_len", "n_sessions"):
        df[c] = df[c].astype("int64")
    return df[["session_len", "n_sessions"]]


def late_order_priority(sf_dir: str, date_lo: str = "1995-01-01",
                        date_hi: str = "1995-07-01", grace_days: int = 30,
                        broadcast_limit: int = 5_000_000):
    """TPC-H Q4-shaped SEMI-join: per order priority, how many orders
    placed in [date_lo, date_hi) have at least one lineitem shipped
    more than ``grace_days`` after the order date — the late-shipment
    SLA report.  An order counts ONCE however many lineitems are late
    (EXISTS semantics).

    Size-adaptive plan on the FILTERED orders count (the
    :func:`regional_revenue` gate):

    * ≤ ``broadcast_limit`` window orders → the (orderkey, orderdate,
      priority) triple broadcasts once as sorted int64 numpy arrays
      (``ray.put`` + ``np.searchsorted`` lookup); ONE lineitem pass
      emits per-batch DISTINCT late orderkeys — bounded by window
      orders, never lineitem count — and the driver unions them and
      counts by priority.  No shuffle at any point.
    * above the limit → EXISTS reduces to ``max(l_shipdate) >
      o_orderdate + grace`` per order, so lineitems pre-aggregate to
      per-batch (orderkey, max_ship) partials, union with the order
      rows on a common schema, and co-partition in ONE coarse
      orderkey-bucket exchange (the established union+groupby
      replacement for Dataset.join); per-bucket counts by priority
      leave each task."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    grace_us = grace_days * 86_400 * 1_000_000

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))

    win = orders.map_batches(o_filter, batch_format="pyarrow").materialize()
    n_win = win.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])

    def _counts(prio: np.ndarray) -> pd.DataFrame:
        vals, cnts = np.unique(prio, return_counts=True)
        df = pd.DataFrame({"o_orderpriority": vals.astype(str),
                           "n_orders": cnts.astype("int64")})
        return (df.sort_values("o_orderpriority").reset_index(drop=True)
                [["o_orderpriority", "n_orders"]])

    if n_win <= broadcast_limit:
        odf = win.to_pandas().sort_values("o_orderkey")
        okeys = odf["o_orderkey"].to_numpy().astype(np.int64)
        odates = odf["o_orderdate"].astype("int64").to_numpy()
        okeys_ref = ray.put(okeys)
        odates_ref = ray.put(odates)

        late_schema = pa.schema([("okey", pa.int64())])

        def late_partial(b: pd.DataFrame) -> pa.Table:
            ok = ray.get(okeys_ref)
            od = ray.get(odates_ref)
            lk = b["l_orderkey"].to_numpy().astype(np.int64)
            pos = np.searchsorted(ok, lk)
            hit = (pos < len(ok))
            hit[hit] = ok[pos[hit]] == lk[hit]
            ship = b["l_shipdate"].astype("int64").to_numpy()
            late = hit & (ship > od[np.minimum(pos, len(ok) - 1)]
                          + grace_us)
            return pa.table(
                {"okey": np.unique(lk[late]).astype(np.int64)},
                schema=late_schema)

        late = (lineitem.map_batches(late_partial, batch_format="pandas")
                .to_pandas()["okey"].unique())
        pos = np.searchsorted(okeys, np.sort(late))
        prio = odf["o_orderpriority"].to_numpy()[pos]
        return _counts(prio)

    # co-partition branch: common (okey, kind, v, prio) schema
    u_schema = pa.schema([("okey", pa.int64()), ("kind", pa.int64()),
                          ("v", pa.int64()), ("prio", pa.string()),
                          ("bucket", pa.int64())])

    def o_rows(b: pd.DataFrame) -> pa.Table:
        ok = b["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"okey": ok, "kind": np.zeros(len(b), dtype=np.int64),
             "v": b["o_orderdate"].astype("int64").to_numpy(),
             "prio": b["o_orderpriority"].astype(str).to_numpy(),
             "bucket": ok % 1024}, schema=u_schema)

    def l_rows(b: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame(
            {"okey": b["l_orderkey"].to_numpy().astype(np.int64),
             "v": b["l_shipdate"].astype("int64").to_numpy()})
             .groupby("okey", as_index=False).agg(v=("v", "max")))
        ok = g["okey"].to_numpy().astype(np.int64)
        return pa.table(
            {"okey": ok, "kind": np.ones(len(g), dtype=np.int64),
             "v": g["v"].to_numpy().astype(np.int64),
             "prio": np.full(len(g), "", dtype=object),
             "bucket": ok % 1024}, schema=u_schema)

    cnt_schema = pa.schema([("o_orderpriority", pa.string()),
                            ("n_orders", pa.int64())])

    def bucket_count(group: pd.DataFrame) -> pa.Table:
        if not len(group):
            return pa.table({"o_orderpriority": pa.array([], pa.string()),
                             "n_orders": pa.array([], pa.int64())},
                            schema=cnt_schema)
        # inner merge keeps everything int64 — a reindex would widen
        # the microsecond timestamps to float64 past 2^53 exactness
        li = (group[group["kind"] == 1].groupby("okey", as_index=False)
              .agg(ship=("v", "max")))
        m = group[group["kind"] == 0].merge(li, on="okey", how="inner")
        late = m["ship"].to_numpy() > m["v"].to_numpy() + grace_us
        c = _counts(m["prio"].to_numpy()[late])
        return pa.table(
            {"o_orderpriority": c["o_orderpriority"].to_numpy(),
             "n_orders": c["n_orders"].to_numpy().astype("int64")},
            schema=cnt_schema)

    both = (win.map_batches(o_rows, batch_format="pandas")
            .union(lineitem.map_batches(l_rows, batch_format="pandas")))
    df = (both.groupby("bucket").map_groups(bucket_count,
                                            batch_format="pandas")
          .to_pandas()
          .groupby("o_orderpriority", as_index=False)
          .agg(n_orders=("n_orders", "sum"))
          .sort_values("o_orderpriority").reset_index(drop=True))
    df["n_orders"] = df["n_orders"].astype("int64")
    return df[["o_orderpriority", "n_orders"]]


def inactive_customers(sf_dir: str, date_lo: str = "1995-01-01",
                       date_hi: str = "1995-07-01",
                       broadcast_limit: int = 5_000_000):
    """ANTI-join: per nation, how many customers placed NO order in
    [date_lo, date_hi) — the churn/inactivity report (NOT EXISTS
    semantics).

    Size-adaptive plan on the distinct active-customer count: the
    windowed orders scan collapses to per-batch DISTINCT custkey
    partials (bounded by customers, never orders); under
    ``broadcast_limit`` the sorted custkey array broadcasts once and
    ONE customer pass anti-filters with ``np.searchsorted`` and emits
    per-batch (nationkey, n) count partials — no shuffle anywhere.
    Above the limit, both sides union on a common (custkey, kind,
    nationkey) schema into ONE coarse custkey-bucket exchange and the
    per-bucket anti scan emits the same bounded partials.  Nation
    names are dimension-sized and join on the driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])

    key_schema = pa.schema([("custkey", pa.int64())])

    def active_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        return pa.table(
            {"custkey": np.unique(t["o_custkey"].to_numpy())
             .astype(np.int64)}, schema=key_schema)

    def active_combine(b: pd.DataFrame) -> pa.Table:
        return pa.table(
            {"custkey": np.unique(b["custkey"].to_numpy())
             .astype(np.int64)}, schema=key_schema)

    active = (orders.map_batches(active_partial, batch_format="pyarrow")
              .map_batches(active_combine, batch_format="pandas",
                           batch_size=65536)
              .materialize())

    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()

    def _finalize(per_nat: pd.DataFrame) -> pd.DataFrame:
        df = (per_nat.groupby("nationkey", as_index=False)
              .agg(n_inactive=("n", "sum"))
              .merge(nat, left_on="nationkey", right_on="n_nationkey"))
        df = df[df["n_inactive"] > 0]
        df = df.sort_values("n_name").reset_index(drop=True)
        df["n_inactive"] = df["n_inactive"].astype("int64")
        return df[["n_name", "n_inactive"]]

    cnt_schema = pa.schema([("nationkey", pa.int64()), ("n", pa.int64())])

    if active.count() <= broadcast_limit:
        akeys = np.unique(active.to_pandas()["custkey"].to_numpy())
        aref = ray.put(akeys)

        def anti_partial(b: pd.DataFrame) -> pa.Table:
            ak = ray.get(aref)
            ck = b["c_custkey"].to_numpy().astype(np.int64)
            pos = np.searchsorted(ak, ck)
            hit = pos < len(ak)
            hit[hit] = ak[pos[hit]] == ck[hit]
            g = (pd.DataFrame({"nationkey": b["c_nationkey"]
                               .to_numpy()[~hit].astype(np.int64)})
                 .groupby("nationkey", as_index=False).size()
                 .rename(columns={"size": "n"}))
            return pa.table(
                {"nationkey": g["nationkey"].to_numpy().astype(np.int64),
                 "n": g["n"].to_numpy().astype(np.int64)},
                schema=cnt_schema)

        per_nat = (customer.map_batches(anti_partial,
                                        batch_format="pandas")
                   .to_pandas())
        return _finalize(per_nat)

    u_schema = pa.schema([("custkey", pa.int64()), ("kind", pa.int64()),
                          ("nationkey", pa.int64()), ("bucket", pa.int64())])

    def a_rows(b: pd.DataFrame) -> pa.Table:
        ck = b["custkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"custkey": ck, "kind": np.ones(len(b), dtype=np.int64),
             "nationkey": np.full(len(b), -1, dtype=np.int64),
             "bucket": ck % 1024}, schema=u_schema)

    def c_rows(b: pd.DataFrame) -> pa.Table:
        ck = b["c_custkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"custkey": ck, "kind": np.zeros(len(b), dtype=np.int64),
             "nationkey": b["c_nationkey"].to_numpy().astype(np.int64),
             "bucket": ck % 1024}, schema=u_schema)

    def bucket_anti(group: pd.DataFrame) -> pa.Table:
        if not len(group):
            return pa.table({"nationkey": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())},
                            schema=cnt_schema)
        act = set(group.loc[group["kind"] == 1, "custkey"].to_numpy())
        c = group[group["kind"] == 0]
        mask = ~c["custkey"].isin(act)
        g = (pd.DataFrame({"nationkey": c["nationkey"]
                           .to_numpy()[mask.to_numpy()]})
             .groupby("nationkey", as_index=False).size()
             .rename(columns={"size": "n"}))
        return pa.table(
            {"nationkey": g["nationkey"].to_numpy().astype(np.int64),
             "n": g["n"].to_numpy().astype(np.int64)},
            schema=cnt_schema)

    both = (active.map_batches(a_rows, batch_format="pandas")
            .union(customer.map_batches(c_rows, batch_format="pandas")))
    per_nat = (both.groupby("bucket").map_groups(bucket_anti,
                                                 batch_format="pandas")
               .to_pandas())
    return _finalize(per_nat)


def forecast_revenue(sf_dir: str, date_lo: str = "1995-01-01",
                     date_hi: str = "1996-01-01",
                     disc_lo_c4: int = 500, disc_hi_c4: int = 700,
                     max_qty: int = 24):
    """TPC-H Q6-shaped revenue-change forecast: the discount revenue
    ``Σ l_extendedprice · l_discount`` over lineitems shipped in
    [date_lo, date_hi) with a discount in [5%, 7%] and quantity under
    24 — the what-if aggregate of removing small-order discounts.

    Exactness: each factor rounds to its native fixed-point grid
    FIRST (price → cents, discount → 1e-4) so the per-row product is
    an exact int64 in 1e-6 currency units and the sum is
    order-independent — the :func:`pricing_summary` c4 idiom, one
    step wider.  The discount window filters on the SAME rounded
    integer on both sides (a raw float BETWEEN would hinge on
    representation noise).

    Distributed plan: one pruned scan, filter + two-column product
    inside each batch, constant-size (revenue, count) partials — no
    exchange at any point."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    ds = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity",
                 "l_extendedprice"])

    part_schema = pa.schema([("revenue_c6", pa.int64()),
                             ("n_items", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        ship = b["l_shipdate"]
        disc_c4 = np.floor(
            b["l_discount"].to_numpy() * 10_000 + 0.5).astype(np.int64)
        keep = ((ship >= lo) & (ship < hi)).to_numpy()
        keep &= (disc_c4 >= disc_lo_c4) & (disc_c4 <= disc_hi_c4)
        keep &= b["l_quantity"].to_numpy() < max_qty
        price_c2 = np.floor(
            b["l_extendedprice"].to_numpy()[keep] * 100 + 0.5
        ).astype(np.int64)
        rev = int((price_c2 * disc_c4[keep]).sum())
        return pa.table({"revenue_c6": [rev],
                         "n_items": [int(keep.sum())]},
                        schema=part_schema)

    p = (ds.map_batches(partial, batch_format="pandas")
         .to_pandas())
    return pd.DataFrame({
        "revenue_c6": pd.Series([int(p["revenue_c6"].sum())],
                                dtype="int64"),
        "n_items": pd.Series([int(p["n_items"].sum())], dtype="int64"),
    })


def daily_revenue_ma7(sf_dir: str):
    """Daily order revenue with a trailing 7-row moving average — the
    time-series smoothing read a revenue dashboard runs over the order
    stream (``AVG() OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND
    CURRENT ROW)`` over the per-day aggregate).

    Exactness: revenue sums in integer cents (the
    :func:`pricing_summary` idiom); the window is ROWS-based over the
    PRESENT days so both sides window the same sequence; the moving
    average is ONE division of the exact integer window sum —
    ``win_rev_c2 / (100·win_days)`` — rounded to 6, identical on both
    sides.

    Distributed shape: per-batch ``(day → rev_c2, n)`` partials → one
    narrow combine level → a driver table bounded by CALENDAR DAYS
    (never order count) where pandas' C rolling kernel applies the
    window.  The order stream never shuffles."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"]
    )
    day_us = np.int64(86_400_000_000)
    part_schema = pa.schema([("day", pa.int64()), ("rev_c2", pa.int64()),
                             ("n_orders", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        us = b["o_orderdate"].to_numpy().astype(
            "datetime64[us]").astype("int64")
        g = (pd.DataFrame({"day": us // day_us,
                           "rev_c2": _cents(b["o_totalprice"])})
             .groupby("day", as_index=False)
             .agg(rev_c2=("rev_c2", "sum"), n_orders=("rev_c2", "size")))
        return pa.table({"day": g["day"].to_numpy().astype(np.int64),
                         "rev_c2": g["rev_c2"].to_numpy().astype(np.int64),
                         "n_orders": g["n_orders"].to_numpy().astype(
                             np.int64)},
                        schema=part_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("day", as_index=False, sort=False).agg(
            rev_c2=("rev_c2", "sum"), n_orders=("n_orders", "sum"))
        return pa.table({"day": g["day"].to_numpy().astype(np.int64),
                         "rev_c2": g["rev_c2"].to_numpy().astype(np.int64),
                         "n_orders": g["n_orders"].to_numpy().astype(
                             np.int64)},
                        schema=part_schema)

    days = (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby("day", as_index=False)
        .agg(rev_c2=("rev_c2", "sum"), n_orders=("n_orders", "sum"))
        .sort_values("day").reset_index(drop=True)
    )
    win_rev = days["rev_c2"].rolling(7, min_periods=1).sum().astype("int64")
    win_n = days["rev_c2"].rolling(7, min_periods=1).count().astype("int64")
    return pd.DataFrame({
        "day": days["day"].astype("int64"),
        "n_orders": days["n_orders"].astype("int64"),
        "rev_c2": days["rev_c2"].astype("int64"),
        "ma7": (win_rev.to_numpy().astype("float64")
                / (100.0 * win_n.to_numpy())).round(6),
    })


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      date: str = "1995-06-15", k: int = 10,
                      broadcast_limit: int = 5_000_000,
                      n_buckets: int = 256):
    """TPC-H Q3-shaped shipping-priority report: the ``k``
    highest-revenue orders from ``segment`` customers placed before
    ``date`` with lineitems still shipping after it, where revenue is
    ``Σ l_extendedprice·(1−l_discount)`` over the late lineitems.

    Exactness: each factor rounds to its native fixed-point grid first
    (price → cents, discount → 1e-4), so per-lineitem revenue is an
    exact int64 in 1e-6 currency units (the :func:`forecast_revenue`
    grid) and per-order sums are order-independent; ties break on
    orderkey.

    Size-adaptive plan on the qualifying-orders count (the
    :func:`late_order_priority` gate).  The segment's custkey set is
    customer-table-sized and broadcasts in both branches:

    * ≤ ``broadcast_limit`` window orders → their (orderkey,
      orderdate) broadcast as sorted int64 arrays; ONE lineitem pass
      emits per-batch per-order revenue partials for hits only
      (bounded by qualifying orders per batch) → one narrow combine
      level → driver merge + top-k.
    * above the limit → lineitem revenue partials and order rows union
      on a common schema and co-partition in ONE coarse
      orderkey-bucket exchange (the union+groupby replacement for
      ``Dataset.join``); each bucket joins, sums per order, and emits
      only its LOCAL top-k — the driver merges ``n_buckets × k``
      rows."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..sources.readers import read_parquet_clean

    cut = pd.Timestamp(date)

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"])

    def c_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["c_mktsegment"], pa.scalar(segment)))

    ckeys = np.sort(
        cust.map_batches(c_filter, batch_format="pyarrow")
        .to_pandas()["c_custkey"].to_numpy().astype(np.int64))
    ckeys_ref = ray.put(ckeys)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_filter(b: pd.DataFrame) -> pd.DataFrame:
        ck = ray.get(ckeys_ref)
        keep = (b["o_orderdate"] < cut).to_numpy()
        oc = b["o_custkey"].to_numpy().astype(np.int64)
        pos = np.searchsorted(ck, oc)
        hit = pos < len(ck)
        hit[hit] = ck[pos[hit]] == oc[hit]
        keep &= hit
        out = b.loc[keep, ["o_orderkey", "o_orderdate"]].copy()
        out["o_orderkey"] = out["o_orderkey"].astype("int64")
        return out

    win = orders.map_batches(o_filter, batch_format="pandas").materialize()
    n_win = win.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])

    rev_schema = pa.schema([("o_orderkey", pa.int64()),
                            ("rev_c6", pa.int64())])

    def _rev_c6(b: pd.DataFrame, keep: np.ndarray) -> np.ndarray:
        price_c2 = np.floor(
            b["l_extendedprice"].to_numpy()[keep] * 100 + 0.5
        ).astype(np.int64)
        disc_c4 = np.floor(
            b["l_discount"].to_numpy()[keep] * 10_000 + 0.5
        ).astype(np.int64)
        return price_c2 * (10_000 - disc_c4)

    def _finalize(per_order: pd.DataFrame, odate: pd.DataFrame
                  ) -> pd.DataFrame:
        top = (per_order.groupby("o_orderkey", as_index=False)
               .agg(rev_c6=("rev_c6", "sum"))
               .sort_values(["rev_c6", "o_orderkey"],
                            ascending=[False, True])
               .head(k)
               .merge(odate, on="o_orderkey", how="left")
               .reset_index(drop=True))
        top["o_orderkey"] = top["o_orderkey"].astype("int64")
        top["rev_c6"] = top["rev_c6"].astype("int64")
        return top[["o_orderkey", "rev_c6", "o_orderdate"]]

    if n_win <= broadcast_limit:
        odf = win.to_pandas().sort_values("o_orderkey")
        okeys = odf["o_orderkey"].to_numpy().astype(np.int64)
        okeys_ref = ray.put(okeys)

        def l_partial(b: pd.DataFrame) -> pa.Table:
            ok = ray.get(okeys_ref)
            lk = b["l_orderkey"].to_numpy().astype(np.int64)
            pos = np.searchsorted(ok, lk)
            keep = pos < len(ok)
            keep[keep] = ok[pos[keep]] == lk[keep]
            keep &= (b["l_shipdate"] > cut).to_numpy()
            g = (pd.DataFrame({"o_orderkey": lk[keep],
                               "rev_c6": _rev_c6(b, keep)})
                 .groupby("o_orderkey", as_index=False)
                 .agg(rev_c6=("rev_c6", "sum")))
            return pa.table(
                {"o_orderkey": g["o_orderkey"].to_numpy().astype(np.int64),
                 "rev_c6": g["rev_c6"].to_numpy().astype(np.int64)},
                schema=rev_schema)

        def l_combine(b: pd.DataFrame) -> pa.Table:
            g = b.groupby("o_orderkey", as_index=False, sort=False).agg(
                rev_c6=("rev_c6", "sum"))
            return pa.table(
                {"o_orderkey": g["o_orderkey"].to_numpy().astype(np.int64),
                 "rev_c6": g["rev_c6"].to_numpy().astype(np.int64)},
                schema=rev_schema)

        per_order = (
            lineitem.map_batches(l_partial, batch_format="pandas",
                                 batch_size=4096)
            .map_batches(l_combine, batch_format="pandas",
                         batch_size=65536)
            .to_pandas())
        return _finalize(per_order, odf)

    # over-budget branch: union + coarse orderkey-bucket co-partition
    union_schema = pa.schema([
        ("bucket", pa.int64()), ("o_orderkey", pa.int64()),
        ("rev_c6", pa.int64()), ("odate_us", pa.int64()),
        ("is_order", pa.int64())])

    def o_rows(b: pd.DataFrame) -> pa.Table:
        ok = b["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"bucket": ok % n_buckets, "o_orderkey": ok,
             "rev_c6": np.zeros(len(ok), dtype=np.int64),
             "odate_us": b["o_orderdate"].to_numpy().astype(
                 "datetime64[us]").astype("int64"),
             "is_order": np.ones(len(ok), dtype=np.int64)},
            schema=union_schema)

    def l_rows(b: pd.DataFrame) -> pa.Table:
        keep = (b["l_shipdate"] > cut).to_numpy()
        g = (pd.DataFrame(
            {"o_orderkey": b["l_orderkey"].to_numpy().astype(
                np.int64)[keep],
             "rev_c6": _rev_c6(b, keep)})
             .groupby("o_orderkey", as_index=False)
             .agg(rev_c6=("rev_c6", "sum")))
        ok = g["o_orderkey"].to_numpy().astype(np.int64)
        return pa.table(
            {"bucket": ok % n_buckets, "o_orderkey": ok,
             "rev_c6": g["rev_c6"].to_numpy().astype(np.int64),
             "odate_us": np.zeros(len(ok), dtype=np.int64),
             "is_order": np.zeros(len(ok), dtype=np.int64)},
            schema=union_schema)

    both = (win.map_batches(o_rows, batch_format="pandas")
            .union(lineitem.map_batches(l_rows, batch_format="pandas",
                                        batch_size=4096)))

    _warn = _skew_warn()

    def bucket_topk(group: pd.DataFrame) -> pd.DataFrame:
        from ..state.skewmon import observe_group

        observe_group("shipping_priority.bucket", len(group), _warn)
        is_o = group["is_order"].to_numpy() == 1
        okeys = group.loc[is_o, "o_orderkey"]
        odates = group.loc[is_o, "odate_us"]
        rev = group.loc[~is_o, ["o_orderkey", "rev_c6"]]
        per = (rev[rev["o_orderkey"].isin(set(okeys))]
               .groupby("o_orderkey", as_index=False)
               .agg(rev_c6=("rev_c6", "sum"))
               .sort_values(["rev_c6", "o_orderkey"],
                            ascending=[False, True]).head(k))
        per = per.merge(
            pd.DataFrame({"o_orderkey": okeys.to_numpy(),
                          "odate_us": odates.to_numpy()}),
            on="o_orderkey", how="left")
        out = pd.DataFrame({
            "o_orderkey": per["o_orderkey"].astype("int64"),
            "rev_c6": per["rev_c6"].astype("int64"),
            "odate_us": per["odate_us"].astype("int64")})
        return out

    cand = (both.groupby("bucket")
            .map_groups(bucket_topk, batch_format="pandas")
            .to_pandas())
    cand = (cand.sort_values(["rev_c6", "o_orderkey"],
                             ascending=[False, True]).head(k)
            .reset_index(drop=True))
    cand["o_orderdate"] = cand["odate_us"].astype("datetime64[us]")
    cand["o_orderkey"] = cand["o_orderkey"].astype("int64")
    cand["rev_c6"] = cand["rev_c6"].astype("int64")
    return cand[["o_orderkey", "rev_c6", "o_orderdate"]]


def event_trend(sf_dir: str):
    """Per-event-type volume trend: the exact ordinary-least-squares
    slope of daily event count against the epoch day, as INTEGER
    numerator / denominator

        ``slope_num = n·Σ(day·cnt) − Σday·Σcnt``
        ``slope_den = n·Σ(day²)   − (Σday)²``

    over the type's active days (slope = num/den events/day) — the
    drift monitor a pipeline runs to catch a decaying or runaway
    event stream.  Integer moments make the comparison float-free
    (the :func:`event_spike_days` arithmetic, first-order); the one
    emitted float is ``slope`` = round(num/den, 9), a single division
    on both sides.

    Distributed shape: per-batch (event_type, day) count partials →
    one narrow combine level → a driver table bounded by
    types × days; the moment sums run in PYTHON ints (no int64
    overflow cliff at 1e9-count days).  The event stream never
    shuffles."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "ts"]
    )
    day_us = np.int64(86_400_000_000)
    part_schema = pa.schema([("event_type", pa.string()),
                             ("day", pa.int64()), ("n_events", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        us = b["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        g = (pd.DataFrame({"event_type": b["event_type"],
                           "day": us // day_us})
             .groupby(["event_type", "day"], as_index=False)
             .size().rename(columns={"size": "n_events"}))
        return pa.table(
            {"event_type": g["event_type"].astype(str),
             "day": g["day"].to_numpy().astype(np.int64),
             "n_events": g["n_events"].to_numpy().astype(np.int64)},
            schema=part_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby(["event_type", "day"], as_index=False).agg(
            n_events=("n_events", "sum"))
        return pa.table(
            {"event_type": g["event_type"].astype(str),
             "day": g["day"].to_numpy().astype(np.int64),
             "n_events": g["n_events"].to_numpy().astype(np.int64)},
            schema=part_schema)

    counts = (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .to_pandas()
        .groupby(["event_type", "day"], as_index=False).agg(
            n_events=("n_events", "sum"))
    )
    rows = []
    for etype, g in counts.groupby("event_type"):
        days = [int(x) for x in g["day"]]
        cnts = [int(x) for x in g["n_events"]]
        n = len(days)
        sx, sy = sum(days), sum(cnts)
        sxy = sum(d * c for d, c in zip(days, cnts))
        sxx = sum(d * d for d in days)
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        rows.append((str(etype), n, sy, num, den,
                     round(num / den, 9) if den else 0.0))
    out = pd.DataFrame(
        rows, columns=["event_type", "n_days", "n_events",
                       "slope_num", "slope_den", "slope"]
    ).sort_values("event_type").reset_index(drop=True)
    for c in ("n_days", "n_events", "slope_num", "slope_den"):
        out[c] = out[c].astype("int64")
    return out


def top_supplier(sf_dir: str, date_lo: str = "1996-01-01",
                 date_hi: str = "1996-04-01",
                 driver_limit: int = 2_000_000):
    """TPC-H Q15-shaped top supplier: total discounted revenue per
    supplier over lineitems shipped in [date_lo, date_hi), returning
    every supplier that attains the maximum (ties included, the Q15
    view semantics).

    Exactness: revenue is integer c4 (price × (1−discount) in 1e-4
    units, per-element rounded — the :func:`regional_revenue` grid)
    so the max and its ties are exact under any summation order.

    Distributed shape: one pruned lineitem scan → per-batch
    (suppkey → rev_c4) partials → one narrow combine level → a
    driver table bounded by the SUPPLIER table (10k × SF rows, never
    lineitem count); above ``driver_limit`` distinct suppliers the
    final fold runs as a distributed Sum aggregate instead.  The
    supplier dimension joins on the driver."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    part_schema = pa.schema([("s_suppkey", pa.int64()),
                             ("rev_c4", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        keep = (b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)
        b = b[keep.to_numpy()]
        g = (pd.DataFrame({
                "s_suppkey": b["l_suppkey"].to_numpy(np.int64),
                "rev_c4": _cents(
                    b["l_extendedprice"] * (1.0 - b["l_discount"]),
                    10_000).to_numpy()})
             .groupby("s_suppkey", as_index=False)["rev_c4"].sum())
        return pa.table({"s_suppkey": g["s_suppkey"].to_numpy(np.int64),
                         "rev_c4": g["rev_c4"].to_numpy(np.int64)},
                        schema=part_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("s_suppkey", as_index=False, sort=False)[
            "rev_c4"].sum()
        return pa.table({"s_suppkey": g["s_suppkey"].to_numpy(np.int64),
                         "rev_c4": g["rev_c4"].to_numpy(np.int64)},
                        schema=part_schema)

    partials = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
        .map_batches(partial, batch_format="pandas", batch_size=4096)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .materialize())
    if partials.count() <= driver_limit:
        rev = (partials.to_pandas()
               .groupby("s_suppkey", as_index=False)["rev_c4"].sum())
    else:  # supplier cardinality beyond the driver budget
        from ray.data.aggregate import Sum

        rev = (partials.groupby("s_suppkey")
               .aggregate(Sum("rev_c4", alias_name="rev_c4"))
               .to_pandas())
    empty = pd.DataFrame({
        "s_suppkey": pd.Series([], dtype="int64"),
        "s_name": pd.Series([], dtype=object),
        "total_rev_c4": pd.Series([], dtype="int64")})
    if rev.empty:
        return empty
    top = rev[rev["rev_c4"] == rev["rev_c4"].max()]
    names = pq.read_table(f"{sf_dir}/supplier.parquet",
                          columns=["s_suppkey", "s_name"]).to_pandas()
    out = top.merge(names, on="s_suppkey")
    out = out.rename(columns={"rev_c4": "total_rev_c4"})
    out = out.sort_values("s_suppkey").reset_index(drop=True)
    out["s_suppkey"] = out["s_suppkey"].astype("int64")
    out["total_rev_c4"] = out["total_rev_c4"].astype("int64")
    return out[["s_suppkey", "s_name", "total_rev_c4"]]


def returned_item_revenue(sf_dir: str, date_lo: str = "1995-07-01",
                          date_hi: str = "1995-10-01", k: int = 20,
                          broadcast_limit: int = 5_000_000,
                          n_buckets: int = 256):
    """TPC-H Q10-shaped returned-item report: the ``k`` customers who
    lost the most revenue to returned items (``l_returnflag = 'R'``)
    on orders placed in [date_lo, date_hi), with name and nation.

    Revenue is integer c4 (the :func:`regional_revenue` grid); ties
    break on ``c_custkey`` ascending so top-``k`` is deterministic.

    Join plan: orders is filtered AT THE READ to the quarter and,
    when the filtered side fits ``broadcast_limit``, ships ONCE as an
    orderkey → custkey dict (``ray.put``) — lineitem then streams in
    a single pass emitting (custkey, rev_c4) partials, one narrow
    combine level, and a driver top-k over the customer-bounded
    table.  Above the limit both facts project to a common schema and
    co-partition in ONE hash exchange on orderkey (the
    :func:`regional_revenue` union idiom) with per-batch revenue
    pre-aggregation so only (orderkey, rev_c4) partial rows move.
    customer and nation are dimension-sized driver reads."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        return t.select(["o_orderkey", "o_custkey"])

    filt = orders.map_batches(o_prep, batch_format="pyarrow").materialize()
    n_orders = filt.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                 "l_discount"])

    def li_rev(b: pd.DataFrame) -> pd.DataFrame:
        """returned lineitems → per-orderkey revenue partials"""
        b = b[(b["l_returnflag"] == "R").to_numpy()]
        return (pd.DataFrame({
                    "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                    "rev_c4": _cents(
                        b["l_extendedprice"] * (1.0 - b["l_discount"]),
                        10_000).to_numpy()})
                .groupby("l_orderkey", as_index=False)["rev_c4"].sum())

    def finalize(cust_rev: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "c_custkey": pd.Series([], dtype="int64"),
            "c_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "revenue_c4": pd.Series([], dtype="int64")})
        if cust_rev.empty:
            return empty
        g = cust_rev.groupby("c_custkey", as_index=False)["rev_c4"].sum()
        g = (g.sort_values(["rev_c4", "c_custkey"],
                           ascending=[False, True]).head(k))
        cust = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_nationkey"]).to_pandas()
        nat = pq.read_table(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name"]).to_pandas()
        out = g.merge(cust, on="c_custkey").merge(
            nat, left_on="c_nationkey", right_on="n_nationkey")
        out = out.rename(columns={"rev_c4": "revenue_c4"})
        out = out.sort_values(["revenue_c4", "c_custkey"],
                              ascending=[False, True]).reset_index(drop=True)
        out["c_custkey"] = out["c_custkey"].astype("int64")
        out["revenue_c4"] = out["revenue_c4"].astype("int64")
        return out[["c_custkey", "c_name", "n_name", "revenue_c4"]]

    if n_orders == 0:
        return finalize(pd.DataFrame())

    if n_orders <= broadcast_limit:
        odf = filt.to_pandas()
        omap_ref = ray.put(dict(zip(odf["o_orderkey"].astype(int),
                                    odf["o_custkey"].astype(int))))

        def li_cust(b: pd.DataFrame) -> pd.DataFrame:
            omap = ray.get(omap_ref)
            part = li_rev(b)
            ck = np.fromiter(
                (omap.get(int(x), -1) for x in part["l_orderkey"]),
                dtype=np.int64, count=len(part))
            part = part[ck >= 0]
            return (pd.DataFrame({"c_custkey": ck[ck >= 0],
                                  "rev_c4": part["rev_c4"].to_numpy()})
                    .groupby("c_custkey", as_index=False)["rev_c4"].sum())

        cust_rev = (lineitem.map_batches(li_cust, batch_format="pandas")
                    .to_pandas())
        return finalize(cust_rev)

    # co-partition branch: one hash exchange on orderkey
    common = pa.schema([("key", pa.int64()), ("side", pa.int8()),
                        ("val", pa.int64())])

    def o_side(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["o_orderkey"],
                         "side": pa.array(np.zeros(t.num_rows, np.int8)),
                         "val": pc.cast(t["o_custkey"], pa.int64())},
                        schema=common)

    def l_side(b: pd.DataFrame) -> pa.Table:
        part = li_rev(b)
        return pa.table({"key": pa.array(part["l_orderkey"].to_numpy()),
                         "side": pa.array(np.ones(len(part), np.int8)),
                         "val": pa.array(part["rev_c4"].to_numpy())},
                        schema=common)

    out_schema = pa.schema([("c_custkey", pa.int64()),
                            ("rev_c4", pa.int64())])

    def join_group(group: pd.DataFrame) -> pa.Table:
        ords = group[group["side"] == 0]
        lis = group[group["side"] == 1]
        if ords.empty or lis.empty:
            return out_schema.empty_table()
        return pa.table({"c_custkey": [int(ords["val"].iloc[0])],
                         "rev_c4": [int(lis["val"].sum())]},
                        schema=out_schema)

    from ray.data.aggregate import Sum

    uni = (filt.map_batches(o_side, batch_format="pyarrow")
           .union(lineitem.map_batches(l_side, batch_format="pandas")))
    agg = (uni.groupby("key").map_groups(join_group, batch_format="pandas")
           .groupby("c_custkey")
           .aggregate(Sum("rev_c4", alias_name="rev_c4")))
    return finalize(agg.to_pandas())


def small_qty_revenue(sf_dir: str, brand: str = "Brand#4"):
    """TPC-H Q17-shaped small-quantity revenue probe: total extended
    price (and its /7 "average yearly" reading) of ``brand`` lineitems
    whose quantity is below 20% of that PART's average quantity — the
    correlated-aggregate shape (an inner per-part AVG feeding the
    outer filter) that a one-pass engine cannot express.

    Exactness: ``l_quantity`` is integer-valued, so the correlated
    predicate ``qty < 0.2·(sum/n)`` folds to the exact integer test
    ``5·qty·n < sum`` — no float threshold on either side; prices sum
    in integer cents and ``avg_yearly`` is ONE division rounded to 6.

    Distributed shape: the pruned lineitem read (4 columns, brand
    partkeys broadcast as a set) is materialized ONCE and shared by
    both passes — pass 1 reduces to per-part (Σqty, n) partials
    (bounded by the brand's PART rows, never lineitem count), pass 2
    broadcasts that small table as sorted numpy arrays and filters +
    sums in one stream.  No shuffle at any point."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand"]).to_pandas()
    brand_keys = np.sort(
        pk.loc[pk["p_brand"] == brand, "p_partkey"].to_numpy(np.int64))
    keys_ref = ray.put(brand_keys)

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"])

    filt_schema = pa.schema([("l_partkey", pa.int64()),
                             ("qty", pa.int64()),
                             ("price_c2", pa.int64())])

    def keep_brand(b: pd.DataFrame) -> pa.Table:
        keys = ray.get(keys_ref)
        pkey = b["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, pkey)
        pos[pos >= len(keys)] = 0
        hit = len(keys) > 0
        keep = (keys[pos] == pkey) if hit else np.zeros(len(pkey), bool)
        b = b[keep]
        return pa.table(
            {"l_partkey": b["l_partkey"].to_numpy(np.int64),
             "qty": np.floor(b["l_quantity"].to_numpy() + 0.5).astype(
                 np.int64),
             "price_c2": _cents(b["l_extendedprice"]).to_numpy()},
            schema=filt_schema)

    brand_li = li.map_batches(
        keep_brand, batch_format="pandas", batch_size=8192).materialize()

    stat_schema = pa.schema([("l_partkey", pa.int64()),
                             ("sum_qty", pa.int64()), ("n", pa.int64())])

    def qty_partial(b: pd.DataFrame) -> pa.Table:
        g = (b.groupby("l_partkey", as_index=False)
             .agg(sum_qty=("qty", "sum"), n=("qty", "size")))
        return pa.table({"l_partkey": g["l_partkey"].to_numpy(np.int64),
                         "sum_qty": g["sum_qty"].to_numpy(np.int64),
                         "n": g["n"].to_numpy(np.int64)},
                        schema=stat_schema)

    stats = (brand_li.map_batches(qty_partial, batch_format="pandas",
                                  batch_size=65536)
             .to_pandas())
    zero = pd.DataFrame({
        "total_price_c2": pd.Series([0], dtype="int64"),
        "n_items": pd.Series([0], dtype="int64"),
        "avg_yearly": pd.Series([0.0], dtype="float64")})
    if stats.empty:  # no lineitem carries the brand's parts
        return zero
    stats = (stats.groupby("l_partkey", as_index=False)
             .agg(sum_qty=("sum_qty", "sum"), n=("n", "sum")))
    skeys = stats["l_partkey"].to_numpy(np.int64)
    order = np.argsort(skeys)
    stat_ref = ray.put((skeys[order],
                        stats["sum_qty"].to_numpy(np.int64)[order],
                        stats["n"].to_numpy(np.int64)[order]))

    out_schema = pa.schema([("price_c2", pa.int64()),
                            ("n_items", pa.int64())])

    def below_avg(b: pd.DataFrame) -> pa.Table:
        keys, sq, nn = ray.get(stat_ref)
        pkey = b["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, pkey)  # every pkey is present
        qty = b["qty"].to_numpy(np.int64)
        keep = 5 * qty * nn[pos] < sq[pos]
        return pa.table(
            {"price_c2": [int(b["price_c2"].to_numpy()[keep].sum())],
             "n_items": [int(keep.sum())]}, schema=out_schema)

    p = brand_li.map_batches(below_avg, batch_format="pandas",
                             batch_size=65536).to_pandas()
    if p.empty:
        return zero
    total_c2 = int(p["price_c2"].sum())
    return pd.DataFrame({
        "total_price_c2": pd.Series([total_c2], dtype="int64"),
        "n_items": pd.Series([int(p["n_items"].sum())], dtype="int64"),
        "avg_yearly": pd.Series([round(total_c2 / 700.0, 6)],
                                dtype="float64")})


def market_share(sf_dir: str, region: str = "ASIA",
                 nation: str = "NATION_2", p_type: str = "PROMO",
                 date_lo: str = "1995-01-01", date_hi: str = "1997-01-01",
                 broadcast_limit: int = 5_000_000):
    """TPC-H Q8-shaped market share: per order-year, the fraction of
    ``p_type``-part revenue in ``region``'s market supplied by
    ``nation`` — the two-sided dimension probe (customer side fixes
    the market, supplier side fixes the share) layered on the
    orders ⋈ lineitem fact edge.

    Exactness: revenue is integer c4 per element; ``mkt_share`` is
    ONE double division of two exact int64 sums, rounded to 6 —
    identical on both sides.

    Join plan (the :func:`regional_revenue` discipline):

    * part → ``p_type`` partkeys, customer → in-region custkeys,
      supplier → suppkey ∈ ``nation`` flag: three dimension
      broadcasts (``ray.put`` sorted numpy / sets), never a shuffle;
    * orders filters to the window + region at the read and, under
      ``broadcast_limit``, ships as an orderkey → year dict while
      lineitem streams ONCE emitting (year, is_nation, rev_c4)
      partials — constant-size per batch;
    * above the limit the two facts union on a common schema and
      co-partition in ONE hash exchange on orderkey, with the same
      per-batch pre-aggregation so only (orderkey, year|rev) rows
      move."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    region_keys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    region_nations = set(
        nat.loc[nat["n_regionkey"].isin(region_keys), "n_nationkey"])
    nation_keys = set(nat.loc[nat["n_name"] == nation, "n_nationkey"])

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    mkt_cust = set(
        cust.loc[cust["c_nationkey"].isin(region_nations), "c_custkey"]
        .astype(int))
    cust_ref = ray.put(mkt_cust)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    nat_supp_ref = ray.put(set(
        supp.loc[supp["s_nationkey"].isin(nation_keys), "s_suppkey"]
        .astype(int)))

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_type"]).to_pandas()
    type_keys = np.sort(
        pk.loc[pk["p_type"] == p_type, "p_partkey"].to_numpy(np.int64))
    part_ref = ray.put(type_keys)

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))
        ck = t["o_custkey"].to_numpy()
        cs = ray.get(cust_ref)
        keep = np.fromiter((int(c) in cs for c in ck), dtype=bool,
                           count=len(ck))
        year = pc.year(t["o_orderdate"]).to_numpy().astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"].to_numpy()[keep],
                         "o_year": year[keep]})

    filt = orders.map_batches(o_prep, batch_format="pyarrow").materialize()
    n_orders = filt.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    def li_part(b: pd.DataFrame) -> pd.DataFrame:
        """type-filtered lineitems → (l_orderkey, is_nat, rev_c4)
        per-orderkey partials"""
        keys = ray.get(part_ref)
        pkey = b["l_partkey"].to_numpy(np.int64)
        if len(keys):
            pos = np.searchsorted(keys, pkey)
            pos[pos >= len(keys)] = 0
            keep = keys[pos] == pkey
        else:
            keep = np.zeros(len(pkey), bool)
        b = b[keep]
        ns = ray.get(nat_supp_ref)
        is_nat = np.fromiter(
            (int(s) in ns for s in b["l_suppkey"]), dtype=np.int64,
            count=len(b))
        return (pd.DataFrame({
                    "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                    "is_nat": is_nat,
                    "rev_c4": _cents(
                        b["l_extendedprice"] * (1.0 - b["l_discount"]),
                        10_000).to_numpy()})
                .groupby(["l_orderkey", "is_nat"], as_index=False)[
                    "rev_c4"].sum())

    def finalize(parts: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "o_year": pd.Series([], dtype="int64"),
            "total_c4": pd.Series([], dtype="int64"),
            "nation_c4": pd.Series([], dtype="int64"),
            "mkt_share": pd.Series([], dtype="float64")})
        if parts.empty:
            return empty
        g = parts.groupby("o_year").agg(
            total_c4=("rev_c4", "sum"),
            nation_c4=("nat_c4", "sum")).reset_index()
        g = g.sort_values("o_year").reset_index(drop=True)
        for c in ("o_year", "total_c4", "nation_c4"):
            g[c] = g[c].astype("int64")
        g["mkt_share"] = (g["nation_c4"].to_numpy().astype("float64")
                          / g["total_c4"].to_numpy()).round(6)
        return g[["o_year", "total_c4", "nation_c4", "mkt_share"]]

    if n_orders == 0:
        return finalize(pd.DataFrame())

    if n_orders <= broadcast_limit:
        odf = filt.to_pandas()
        omap_ref = ray.put(dict(zip(odf["o_orderkey"].astype(int),
                                    odf["o_year"].astype(int))))

        def li_year(b: pd.DataFrame) -> pd.DataFrame:
            omap = ray.get(omap_ref)
            part = li_part(b)
            yr = np.fromiter(
                (omap.get(int(x), -1) for x in part["l_orderkey"]),
                dtype=np.int64, count=len(part))
            part = part[yr >= 0]
            rev = part["rev_c4"].to_numpy()
            return (pd.DataFrame({
                        "o_year": yr[yr >= 0],
                        "rev_c4": rev,
                        "nat_c4": rev * part["is_nat"].to_numpy()})
                    .groupby("o_year", as_index=False)[
                        ["rev_c4", "nat_c4"]].sum())

        parts = (lineitem.map_batches(li_year, batch_format="pandas")
                 .to_pandas())
        return finalize(parts)

    # co-partition branch: one hash exchange on orderkey
    common = pa.schema([("key", pa.int64()), ("side", pa.int8()),
                        ("a", pa.int64()), ("b", pa.int64())])

    def o_side(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["o_orderkey"],
                         "side": pa.array(np.zeros(t.num_rows, np.int8)),
                         "a": pc.cast(t["o_year"], pa.int64()),
                         "b": pa.array(np.zeros(t.num_rows, np.int64))},
                        schema=common)

    def l_side(b: pd.DataFrame) -> pa.Table:
        part = li_part(b)
        rev = part["rev_c4"].to_numpy(np.int64)
        return pa.table({"key": pa.array(part["l_orderkey"].to_numpy()),
                         "side": pa.array(np.ones(len(part), np.int8)),
                         "a": pa.array(rev),
                         "b": pa.array(rev * part["is_nat"].to_numpy())},
                        schema=common)

    grp_schema = pa.schema([("o_year", pa.int64()), ("rev_c4", pa.int64()),
                            ("nat_c4", pa.int64())])

    def join_group(group: pd.DataFrame) -> pa.Table:
        ords = group[group["side"] == 0]
        lis = group[group["side"] == 1]
        if ords.empty or lis.empty:
            return grp_schema.empty_table()
        return pa.table({"o_year": [int(ords["a"].iloc[0])],
                         "rev_c4": [int(lis["a"].sum())],
                         "nat_c4": [int(lis["b"].sum())]},
                        schema=grp_schema)

    uni = (filt.map_batches(o_side, batch_format="pyarrow")
           .union(lineitem.map_batches(l_side, batch_format="pandas")))
    parts = (uni.groupby("key")
             .map_groups(join_group, batch_format="pandas")
             .to_pandas())
    return finalize(parts)


def customer_rfm(sf_dir: str, driver_limit: int = 2_000_000):
    """RFM segmentation over the order stream: per ordering customer,
    recency (epoch day of the latest order), frequency (order count)
    and monetary (total cents), each ranked into quartiles — the
    classic marketing cut a warehouse materializes as a customer
    dimension.

    Exactness: all three metrics are exact integers; ranks are
    ``row_number`` with a ``c_custkey`` tie-break (never a float
    percentile), and the quartile is the closed-form integer
    ``1 + ((rank − 1) · 4) // n`` — identical arithmetic in SQL, so
    quartile edges cannot drift.  ``rfm_code = 100·r + 10·f + m``.

    Distributed shape: per-batch (custkey → max-day, count, Σcents)
    partials → one narrow combine level → a driver table bounded by
    the CUSTOMER dimension (150k × SF rows, never order count);
    above ``driver_limit`` the fold runs as distributed
    Max/Sum/Count aggregates first.  Ranking is three argsorts over
    the customer-bounded table."""
    import numpy as np
    import pyarrow as pa

    from ..sources.readers import read_parquet_clean

    day_us = np.int64(86_400_000_000)
    part_schema = pa.schema([("c_custkey", pa.int64()),
                             ("last_day", pa.int64()),
                             ("n_orders", pa.int64()),
                             ("total_c2", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        us = b["o_orderdate"].to_numpy().astype(
            "datetime64[us]").astype("int64")
        g = (pd.DataFrame({"c_custkey": b["o_custkey"].to_numpy(np.int64),
                           "day": us // day_us,
                           "c2": _cents(b["o_totalprice"])})
             .groupby("c_custkey", as_index=False)
             .agg(last_day=("day", "max"), n_orders=("day", "size"),
                  total_c2=("c2", "sum")))
        return pa.table({c: g[c].to_numpy(np.int64)
                         for c in part_schema.names}, schema=part_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = (b.groupby("c_custkey", as_index=False, sort=False)
             .agg(last_day=("last_day", "max"),
                  n_orders=("n_orders", "sum"),
                  total_c2=("total_c2", "sum")))
        return pa.table({c: g[c].to_numpy(np.int64)
                         for c in part_schema.names}, schema=part_schema)

    partials = (
        read_parquet_clean(f"{sf_dir}/orders.parquet",
                           columns=["o_custkey", "o_orderdate",
                                    "o_totalprice"])
        .map_batches(partial, batch_format="pandas", batch_size=4096)
        .map_batches(combine, batch_format="pandas", batch_size=65536)
        .materialize())
    if partials.count() <= driver_limit:
        s = (partials.to_pandas()
             .groupby("c_custkey", as_index=False)
             .agg(last_day=("last_day", "max"),
                  n_orders=("n_orders", "sum"),
                  total_c2=("total_c2", "sum")))
    else:
        from ray.data.aggregate import Max, Sum

        s = (partials.groupby("c_custkey")
             .aggregate(Max("last_day", alias_name="last_day"),
                        Sum("n_orders", alias_name="n_orders"),
                        Sum("total_c2", alias_name="total_c2"))
             .to_pandas())
    if s.empty:
        cols = ["c_custkey", "last_day", "n_orders", "total_c2",
                "r_q", "f_q", "m_q", "rfm_code"]
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in cols})
    s = s.sort_values("c_custkey").reset_index(drop=True)
    n = len(s)
    ck = s["c_custkey"].to_numpy(np.int64)

    def quartile(metric: np.ndarray) -> np.ndarray:
        # row_number over (metric DESC, custkey ASC) via lexsort
        order = np.lexsort((ck, -metric))
        rank = np.empty(n, dtype=np.int64)
        rank[order] = np.arange(1, n + 1)
        return 1 + ((rank - 1) * 4) // n

    s["r_q"] = quartile(s["last_day"].to_numpy(np.int64))
    s["f_q"] = quartile(s["n_orders"].to_numpy(np.int64))
    s["m_q"] = quartile(s["total_c2"].to_numpy(np.int64))
    s["rfm_code"] = 100 * s["r_q"] + 10 * s["f_q"] + s["m_q"]
    for c in s.columns:
        s[c] = s[c].astype("int64")
    return s[["c_custkey", "last_day", "n_orders", "total_c2",
              "r_q", "f_q", "m_q", "rfm_code"]]


def late_events(sf_dir: str, bucket: int = 65536,
                broadcast_limit: int = 2_000_000):
    """Out-of-order-arrival audit over the event stream: per event
    type, how many events carry a timestamp EARLIER than some
    already-ingested event of the same type (ingest order =
    ``event_id``) — the watermark-quality read a streaming pipeline
    takes before trusting event-time windows.

    The interesting distributed part is a global RUNNING MAX in
    ``event_id`` order (Ray Data has no scan operator) — the
    :func:`curation.pack_sequences` prefix discipline applied to a
    max semigroup:

    1. one streaming pass reduces per-(bucket, type) ts-maxima
       (bucket = ``event_id // bucket`` — ordered, skew-free ranges);
    2. the driver exclusive-prefix-maxes the bucket maxima per type
       (driver table is buckets × types, never event count) and
       broadcasts the offsets;
    3. one bounded ``groupby(bucket)`` pass sorts each bucket by
       event_id, takes the shifted cummax per type, folds in the
       broadcast prefix, and emits per-type (n, late) partials.

    Under ``broadcast_limit`` events the whole scan is one driver
    pass (the count-gated fast path).  ``late_frac`` is ONE division
    rounded to 6; timestamps compare as int64 microseconds on both
    sides."""
    import numpy as np
    import pyarrow as pa
    import ray

    from ..sources.readers import read_parquet_clean

    NEG = np.int64(-(2 ** 62))

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].to_numpy(np.int64),
            "event_type": b["event_type"].astype(str),
            "ts": b["ts"].to_numpy().astype("datetime64[us]")
                 .astype("int64"),
        })

    ev = (read_parquet_clean(f"{sf_dir}/events.parquet",
                             columns=["event_id", "event_type", "ts"])
          .map_batches(prep, batch_format="pandas", batch_size=65536)
          .materialize())

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("event_type").reset_index(drop=True)
        for c in ("n_events", "n_late"):
            g[c] = g[c].astype("int64")
        g["late_frac"] = (g["n_late"].to_numpy().astype("float64")
                          / g["n_events"].to_numpy()).round(6)
        return g[["event_type", "n_events", "n_late", "late_frac"]]

    def scan_frame(df: pd.DataFrame,
                   prefix: dict | None = None) -> pd.DataFrame:
        """sorted-scan late counts per type; ``prefix`` maps type →
        max ts of all STRICTLY EARLIER buckets."""
        df = df.sort_values("event_id")
        out_t, out_n, out_l = [], [], []
        for t, d in df.groupby("event_type", sort=False):
            ts = d["ts"].to_numpy()
            prev = np.concatenate(
                [[NEG], np.maximum.accumulate(ts)[:-1]])
            if prefix is not None:
                prev = np.maximum(prev, prefix.get(t, NEG))
            out_t.append(t)
            out_n.append(len(ts))
            out_l.append(int((ts < prev).sum()))
        return pd.DataFrame({"event_type": out_t, "n_events": out_n,
                             "n_late": out_l})

    if ev.count() <= broadcast_limit:
        df = ev.to_pandas()
        if df.empty:
            return finalize(pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype="int64"),
                "n_late": pd.Series([], dtype="int64")}))
        return finalize(scan_frame(df))

    # distributed path: bucket maxima → driver prefix-max → bucketed
    # scan with broadcast offsets
    def bmax(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.assign(bucket=b["event_id"] // bucket)
             .groupby(["bucket", "event_type"], as_index=False)
             .agg(mx=("ts", "max")))
        return g

    bm = (ev.map_batches(bmax, batch_format="pandas", batch_size=65536)
          .to_pandas()
          .groupby(["bucket", "event_type"], as_index=False)
          .agg(mx=("mx", "max"))
          .sort_values(["event_type", "bucket"]))
    # exclusive prefix-max per type over ordered buckets
    prefixes: dict[int, dict[str, int]] = {}
    for t, d in bm.groupby("event_type", sort=False):
        run = NEG
        for bkt, mx in zip(d["bucket"], d["mx"]):
            prefixes.setdefault(int(bkt), {})[t] = int(run)
            run = max(run, int(mx))
    pref_ref = ray.put(prefixes)

    part_schema = pa.schema([("event_type", pa.string()),
                             ("n_events", pa.int64()),
                             ("n_late", pa.int64())])

    def with_bucket(t: pa.Table) -> pa.Table:
        eid = t["event_id"].to_numpy()
        return t.append_column(
            "bucket", pa.array(eid // bucket, type=pa.int64()))

    def bucket_scan(g: pd.DataFrame) -> pa.Table:
        pref = ray.get(pref_ref).get(int(g["bucket"].iloc[0]), {})
        out = scan_frame(g, prefix=pref)
        return pa.table({"event_type": out["event_type"].tolist(),
                         "n_events": out["n_events"].to_numpy(np.int64),
                         "n_late": out["n_late"].to_numpy(np.int64)},
                        schema=part_schema)

    df = (ev.map_batches(with_bucket, batch_format="pyarrow")
          .groupby("bucket").map_groups(bucket_scan, batch_format="pandas")
          .to_pandas()
          .groupby("event_type", as_index=False)
          .agg(n_events=("n_events", "sum"), n_late=("n_late", "sum")))
    return finalize(df)


def _attach_order_attr(filt_orders, li_partials, n_orders: int,
                       broadcast_limit: int, n_buckets: int = 256,
                       tag: str = "order_attach"):
    """Attach ONE int64 orders attribute to per-orderkey lineitem
    partial rows — the orders ⋈ lineitem fact edge shared by the
    Q7/Q9-shaped reports (:func:`volume_shipping`,
    :func:`nation_part_revenue`).

    ``filt_orders`` holds (key, attr) int64 rows, already filtered and
    materialized (``n_orders`` is its count); ``li_partials`` holds
    (key, a, b) int64 rows, pre-aggregated per batch so only
    constant-size partials move.  Returns a Dataset of (attr, a, b)
    rows with INNER-join semantics (partials whose key has no order
    row drop).

    ≤ ``broadcast_limit`` orders → the map ships ONCE (``ray.put``
    sorted numpy + ``np.searchsorted``); no shuffle at any point.
    Above it, both sides project to a common schema, union, and
    co-partition in ONE coarse orderkey-bucket exchange (the
    established ``Dataset.join`` replacement); per-bucket joins are
    vectorized searchsorted walks that report group sizes to the skew
    ledger."""
    import numpy as np
    import pyarrow as pa
    import ray

    out_schema = pa.schema([("attr", pa.int64()), ("a", pa.int64()),
                            ("b", pa.int64())])

    if n_orders <= broadcast_limit:
        odf = filt_orders.to_pandas()
        okeys = odf["key"].to_numpy(np.int64) if len(odf) else \
            np.empty(0, np.int64)
        order = np.argsort(okeys)
        map_ref = ray.put((okeys[order],
                           odf["attr"].to_numpy(np.int64)[order]
                           if len(odf) else np.empty(0, np.int64)))

        def attach(b: pd.DataFrame) -> pa.Table:
            keys, attrs = ray.get(map_ref)
            k = b["key"].to_numpy(np.int64)
            if len(keys) == 0 or len(k) == 0:
                return out_schema.empty_table()
            pos = np.searchsorted(keys, k)
            pos[pos >= len(keys)] = 0
            hit = keys[pos] == k
            return pa.table({"attr": attrs[pos[hit]],
                             "a": b["a"].to_numpy(np.int64)[hit],
                             "b": b["b"].to_numpy(np.int64)[hit]},
                            schema=out_schema)

        return li_partials.map_batches(attach, batch_format="pandas",
                                       batch_size=65536)

    common = pa.schema([("bucket", pa.int64()), ("key", pa.int64()),
                        ("side", pa.int8()), ("a", pa.int64()),
                        ("b", pa.int64())])
    MIX = np.int64(-7046029254386353131)

    def _bucket(k: np.ndarray) -> np.ndarray:
        return ((k * MIX) >> np.int64(40)) % np.int64(n_buckets)

    def o_side(b: pd.DataFrame) -> pa.Table:
        k = b["key"].to_numpy(np.int64)
        return pa.table({"bucket": _bucket(k), "key": k,
                         "side": np.zeros(len(k), np.int8),
                         "a": b["attr"].to_numpy(np.int64),
                         "b": np.zeros(len(k), np.int64)}, schema=common)

    def l_side(b: pd.DataFrame) -> pa.Table:
        k = b["key"].to_numpy(np.int64)
        return pa.table({"bucket": _bucket(k), "key": k,
                         "side": np.ones(len(k), np.int8),
                         "a": b["a"].to_numpy(np.int64),
                         "b": b["b"].to_numpy(np.int64)}, schema=common)

    _warn = _skew_warn()

    def join_bucket(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group(f"{tag}.bucket", len(group), _warn)
        side = group["side"].to_numpy()
        ords = group[side == 0]
        lis = group[side == 1]
        if ords.empty or lis.empty:
            return out_schema.empty_table()
        okeys = ords["key"].to_numpy(np.int64)
        order = np.argsort(okeys)
        okeys = okeys[order]
        attrs = ords["a"].to_numpy(np.int64)[order]
        k = lis["key"].to_numpy(np.int64)
        pos = np.searchsorted(okeys, k)
        pos[pos >= len(okeys)] = 0
        hit = okeys[pos] == k
        return pa.table({"attr": attrs[pos[hit]],
                         "a": lis["a"].to_numpy(np.int64)[hit],
                         "b": lis["b"].to_numpy(np.int64)[hit]},
                        schema=out_schema)

    uni = (filt_orders.map_batches(o_side, batch_format="pandas")
           .union(li_partials.map_batches(l_side, batch_format="pandas")))
    return uni.groupby("bucket").map_groups(join_bucket,
                                            batch_format="pandas")


def volume_shipping(sf_dir: str, nation1: str = "NATION_1",
                    nation2: str = "NATION_3",
                    date_lo: str = "1995-01-01",
                    date_hi: str = "1997-01-01",
                    broadcast_limit: int = 5_000_000):
    """TPC-H Q7-shaped volume shipping: discounted revenue flowing
    between two nations per ship-year — supplier in one nation,
    customer in the other, BOTH directions reported.

    Exactness: revenue is integer c4 per element (the
    :func:`regional_revenue` grid), so per-(pair, year) sums are exact
    under any order.

    Distributed shape: supplier and customer are dimension broadcasts
    (suppkey/custkey → nation code); orders filters to the two
    customer nations at the read and the orderkey → customer-code map
    attaches to per-batch lineitem partials via
    :func:`_attach_order_attr` (count-gated broadcast, union
    co-partition fallback).  The lineitem side pre-aggregates to
    (orderkey, supp_code·10⁴ + ship_year) partials so only
    constant-size rows ever move; the final fold is pairs × years —
    driver-bounded regardless of corpus size."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    code_of = {}  # nationkey -> 1 (nation1) / 2 (nation2)
    for key, name in zip(nat["n_nationkey"], nat["n_name"]):
        if name == nation1:
            code_of[int(key)] = 1
        elif name == nation2:
            code_of[int(key)] = 2
    names = {1: nation1, 2: nation2}

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    scode = supp["s_nationkey"].map(
        lambda k: code_of.get(int(k), 0)).to_numpy(np.int64)
    skeys = supp["s_suppkey"].to_numpy(np.int64)
    keep = scode > 0
    order = np.argsort(skeys[keep])
    supp_ref = ray.put((skeys[keep][order], scode[keep][order]))

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    ccode = cust["c_nationkey"].map(
        lambda k: code_of.get(int(k), 0)).to_numpy(np.int64)
    ckeys = cust["c_custkey"].to_numpy(np.int64)
    keep = ccode > 0
    order = np.argsort(ckeys[keep])
    cust_ref = ray.put((ckeys[keep][order], ccode[keep][order]))

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])

    okv_schema = pa.schema([("key", pa.int64()), ("attr", pa.int64())])

    def o_prep(b: pd.DataFrame) -> pa.Table:
        keys, codes = ray.get(cust_ref)
        ck = b["o_custkey"].to_numpy(np.int64)
        if len(keys) == 0:
            return okv_schema.empty_table()
        pos = np.searchsorted(keys, ck)
        pos[pos >= len(keys)] = 0
        hit = keys[pos] == ck
        return pa.table(
            {"key": b["o_orderkey"].to_numpy(np.int64)[hit],
             "attr": codes[pos[hit]]}, schema=okv_schema)

    filt = orders.map_batches(o_prep, batch_format="pandas",
                              batch_size=8192).materialize()
    n_orders = filt.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"])

    part_schema = pa.schema([("key", pa.int64()), ("a", pa.int64()),
                             ("b", pa.int64())])

    def li_partial(b: pd.DataFrame) -> pa.Table:
        m = ((b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)).to_numpy()
        b = b[m]
        keys, codes = ray.get(supp_ref)
        sk = b["l_suppkey"].to_numpy(np.int64)
        if len(keys) == 0 or len(sk) == 0:
            return part_schema.empty_table()
        pos = np.searchsorted(keys, sk)
        pos[pos >= len(keys)] = 0
        hit = keys[pos] == sk
        b = b[hit]
        packed = (codes[pos[hit]] * 10_000
                  + b["l_shipdate"].dt.year.to_numpy(np.int64))
        g = (pd.DataFrame({
                "key": b["l_orderkey"].to_numpy(np.int64),
                "a": packed,
                "b": _cents(b["l_extendedprice"] * (1.0 - b["l_discount"]),
                            10_000).to_numpy()})
             .groupby(["key", "a"], as_index=False)["b"].sum())
        return pa.table({"key": g["key"].to_numpy(np.int64),
                         "a": g["a"].to_numpy(np.int64),
                         "b": g["b"].to_numpy(np.int64)},
                        schema=part_schema)

    partials = lineitem.map_batches(li_partial, batch_format="pandas",
                                    batch_size=8192)
    joined = _attach_order_attr(filt, partials, n_orders, broadcast_limit,
                                tag="volume_shipping")

    fold_schema = pa.schema([("supp_code", pa.int64()),
                             ("cust_code", pa.int64()),
                             ("l_year", pa.int64()),
                             ("revenue_c4", pa.int64())])

    def fold(b: pd.DataFrame) -> pa.Table:
        sc = b["a"].to_numpy(np.int64) // 10_000
        yr = b["a"].to_numpy(np.int64) % 10_000
        cc = b["attr"].to_numpy(np.int64)
        keep = sc != cc  # cross-nation flows only
        g = (pd.DataFrame({"supp_code": sc[keep], "cust_code": cc[keep],
                           "l_year": yr[keep],
                           "revenue_c4": b["b"].to_numpy(np.int64)[keep]})
             .groupby(["supp_code", "cust_code", "l_year"],
                      as_index=False)["revenue_c4"].sum())
        return pa.table({c: g[c].to_numpy(np.int64) for c in
                         ("supp_code", "cust_code", "l_year",
                          "revenue_c4")}, schema=fold_schema)

    df = joined.map_batches(fold, batch_format="pandas",
                            batch_size=65536).to_pandas()
    empty = pd.DataFrame({
        "supp_nation": pd.Series([], dtype=object),
        "cust_nation": pd.Series([], dtype=object),
        "l_year": pd.Series([], dtype="int64"),
        "revenue_c4": pd.Series([], dtype="int64")})
    if df.empty:
        return empty
    g = (df.groupby(["supp_code", "cust_code", "l_year"], as_index=False)
         ["revenue_c4"].sum())
    g["supp_nation"] = g["supp_code"].map(names)
    g["cust_nation"] = g["cust_code"].map(names)
    g = g.sort_values(["supp_nation", "cust_nation", "l_year"]
                      ).reset_index(drop=True)
    g["l_year"] = g["l_year"].astype("int64")
    g["revenue_c4"] = g["revenue_c4"].astype("int64")
    return g[["supp_nation", "cust_nation", "l_year", "revenue_c4"]]


def nation_part_revenue(sf_dir: str, token: str = "red",
                        broadcast_limit: int = 5_000_000):
    """TPC-H Q9-shaped product-line revenue: discounted revenue from
    parts whose name contains ``token``, grouped by the SUPPLIER's
    nation and the order year (the profit report without the
    partsupp supply-cost leg — that table is not in this corpus).

    Distributed shape: part (token partkeys) and supplier
    (suppkey → nationkey) are dimension broadcasts; the order year
    attaches to per-batch (orderkey, nationkey) lineitem partials via
    :func:`_attach_order_attr` — orders here are UNFILTERED, so at
    scale the union co-partition branch is the expected path and the
    count gate only short-circuits small corpora.  The final fold is
    nations × years, driver-bounded."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_name"]).to_pandas()
    tok_keys = np.sort(pk.loc[
        pk["p_name"].str.contains(token, regex=False),
        "p_partkey"].to_numpy(np.int64))
    part_ref = ray.put(tok_keys)

    supp = pq.read_table(f"{sf_dir}/supplier.parquet",
                         columns=["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = supp["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(skeys)
    supp_ref = ray.put((skeys[order],
                        supp["s_nationkey"].to_numpy(np.int64)[order]))

    orders = read_parquet_clean(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_orderdate"])

    okv_schema = pa.schema([("key", pa.int64()), ("attr", pa.int64())])

    def o_prep(b: pd.DataFrame) -> pa.Table:
        return pa.table(
            {"key": b["o_orderkey"].to_numpy(np.int64),
             "attr": b["o_orderdate"].dt.year.to_numpy(np.int64)},
            schema=okv_schema)

    filt = orders.map_batches(o_prep, batch_format="pandas",
                              batch_size=8192).materialize()
    n_orders = filt.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"])

    part_schema = pa.schema([("key", pa.int64()), ("a", pa.int64()),
                             ("b", pa.int64())])

    def li_partial(b: pd.DataFrame) -> pa.Table:
        keys = ray.get(part_ref)
        pkey = b["l_partkey"].to_numpy(np.int64)
        if len(keys) == 0 or len(pkey) == 0:
            return part_schema.empty_table()
        pos = np.searchsorted(keys, pkey)
        pos[pos >= len(keys)] = 0
        b = b[keys[pos] == pkey]
        skeys, snat = ray.get(supp_ref)
        sk = b["l_suppkey"].to_numpy(np.int64)
        spos = np.searchsorted(skeys, sk)
        spos[spos >= len(skeys)] = 0
        g = (pd.DataFrame({
                "key": b["l_orderkey"].to_numpy(np.int64),
                "a": snat[spos],
                "b": _cents(b["l_extendedprice"] * (1.0 - b["l_discount"]),
                            10_000).to_numpy()})
             .groupby(["key", "a"], as_index=False)["b"].sum())
        return pa.table({"key": g["key"].to_numpy(np.int64),
                         "a": g["a"].to_numpy(np.int64),
                         "b": g["b"].to_numpy(np.int64)},
                        schema=part_schema)

    partials = lineitem.map_batches(li_partial, batch_format="pandas",
                                    batch_size=8192)
    joined = _attach_order_attr(filt, partials, n_orders, broadcast_limit,
                                tag="nation_part_revenue")

    fold_schema = pa.schema([("n_nationkey", pa.int64()),
                             ("o_year", pa.int64()),
                             ("revenue_c4", pa.int64())])

    def fold(b: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({"n_nationkey": b["a"].to_numpy(np.int64),
                           "o_year": b["attr"].to_numpy(np.int64),
                           "revenue_c4": b["b"].to_numpy(np.int64)})
             .groupby(["n_nationkey", "o_year"], as_index=False)
             ["revenue_c4"].sum())
        return pa.table({c: g[c].to_numpy(np.int64) for c in
                         ("n_nationkey", "o_year", "revenue_c4")},
                        schema=fold_schema)

    df = joined.map_batches(fold, batch_format="pandas",
                            batch_size=65536).to_pandas()
    empty = pd.DataFrame({
        "n_name": pd.Series([], dtype=object),
        "o_year": pd.Series([], dtype="int64"),
        "revenue_c4": pd.Series([], dtype="int64")})
    if df.empty:
        return empty
    g = (df.groupby(["n_nationkey", "o_year"], as_index=False)
         ["revenue_c4"].sum())
    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    nat["n_nationkey"] = nat["n_nationkey"].astype("int64")
    g = g.merge(nat, on="n_nationkey")
    g = g.sort_values(["n_name", "o_year"]).reset_index(drop=True)
    g["o_year"] = g["o_year"].astype("int64")
    g["revenue_c4"] = g["revenue_c4"].astype("int64")
    return g[["n_name", "o_year", "revenue_c4"]]


def promo_revenue_share(sf_dir: str, p_type: str = "PROMO",
                        date_lo: str = "1996-01-01",
                        date_hi: str = "1997-01-01"):
    """TPC-H Q14-shaped promotion effect: per ship-month in the
    window, the share of discounted revenue carried by ``p_type``
    parts — 100 · promo / total, ONE double division of two exact
    int64 c4 sums rounded to 6.

    Distributed shape: the promo partkey set is a dimension broadcast
    (``ray.put`` sorted numpy + searchsorted — never a shuffle); the
    pruned lineitem scan reduces per batch to (ship_month, promo_c4,
    total_c4) partials, a months-bounded table the driver folds.  No
    exchange of any kind."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)

    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_type"]).to_pandas()
    promo_keys = np.sort(
        pk.loc[pk["p_type"] == p_type, "p_partkey"].to_numpy(np.int64))
    promo_ref = ray.put(promo_keys)

    part_schema = pa.schema([("ship_month", pa.int64()),
                             ("promo_c4", pa.int64()),
                             ("total_c4", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        m = ((b["l_shipdate"] >= lo) & (b["l_shipdate"] < hi)).to_numpy()
        b = b[m]
        if b.empty:
            return part_schema.empty_table()
        keys = ray.get(promo_ref)
        pkey = b["l_partkey"].to_numpy(np.int64)
        if len(keys):
            pos = np.searchsorted(keys, pkey)
            pos[pos >= len(keys)] = 0
            is_promo = (keys[pos] == pkey).astype(np.int64)
        else:
            is_promo = np.zeros(len(pkey), np.int64)
        rev = _cents(b["l_extendedprice"] * (1.0 - b["l_discount"]),
                     10_000).to_numpy()
        month = (b["l_shipdate"].dt.year.to_numpy(np.int64) * 100
                 + b["l_shipdate"].dt.month.to_numpy(np.int64))
        g = (pd.DataFrame({"ship_month": month,
                           "promo_c4": rev * is_promo, "total_c4": rev})
             .groupby("ship_month", as_index=False).sum())
        return pa.table({c: g[c].to_numpy(np.int64) for c in
                         ("ship_month", "promo_c4", "total_c4")},
                        schema=part_schema)

    df = (read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
          .map_batches(partial, batch_format="pandas", batch_size=8192)
          .to_pandas())
    empty = pd.DataFrame({
        "ship_month": pd.Series([], dtype="int64"),
        "promo_c4": pd.Series([], dtype="int64"),
        "total_c4": pd.Series([], dtype="int64"),
        "promo_share": pd.Series([], dtype="float64")})
    if df.empty:
        return empty
    g = df.groupby("ship_month", as_index=False).sum()
    g = g.sort_values("ship_month").reset_index(drop=True)
    for c in ("ship_month", "promo_c4", "total_c4"):
        g[c] = g[c].astype("int64")
    g["promo_share"] = (100.0 * g["promo_c4"].to_numpy()
                        / g["total_c4"].to_numpy()).round(6)
    return g[["ship_month", "promo_c4", "total_c4", "promo_share"]]


def customer_order_distribution(sf_dir: str,
                                driver_limit: int = 2_000_000):
    """TPC-H Q13-shaped order-count distribution: how many customers
    placed exactly ``c_count`` orders, INCLUDING the zero bucket (the
    LEFT-join semantics — customers with no orders).

    Distributed shape: the orders scan reduces per batch to
    (custkey, n) partials and one narrow combine level; the
    customer-bounded table folds on the driver under ``driver_limit``
    and as a distributed Sum groupby + per-batch histogram partials
    above it.  The zero bucket is pure arithmetic: total customers
    (parquet footer count, no scan) minus customers seen in orders."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.dataset as pads

    from ..sources.readers import read_parquet_clean

    part_schema = pa.schema([("c_custkey", pa.int64()),
                             ("n", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (b.groupby("o_custkey", as_index=False)
             .agg(n=("o_custkey", "size")))
        return pa.table({"c_custkey": g["o_custkey"].to_numpy(np.int64),
                         "n": g["n"].to_numpy(np.int64)},
                        schema=part_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("c_custkey", as_index=False, sort=False)["n"].sum()
        return pa.table({"c_custkey": g["c_custkey"].to_numpy(np.int64),
                         "n": g["n"].to_numpy(np.int64)},
                        schema=part_schema)

    partials = (read_parquet_clean(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey"])
                .map_batches(partial, batch_format="pandas",
                             batch_size=65536)
                .map_batches(combine, batch_format="pandas",
                             batch_size=65536)
                .materialize())

    n_custs_total = pads.dataset(
        f"{sf_dir}/customer.parquet").count_rows()

    if partials.count() <= driver_limit:
        per_cust = (partials.to_pandas()
                    .groupby("c_custkey", as_index=False)["n"].sum())
        hist = (per_cust.groupby("n", as_index=False)
                .agg(custdist=("n", "size"))
                .rename(columns={"n": "c_count"}))
        n_with_orders = len(per_cust)
    else:  # customer cardinality beyond the driver budget
        from ray.data.aggregate import Count, Sum

        agg = (partials.groupby("c_custkey")
               .aggregate(Sum("n", alias_name="c_count")))

        hist_schema = pa.schema([("c_count", pa.int64()),
                                 ("custdist", pa.int64())])

        def hist_partial(b: pd.DataFrame) -> pa.Table:
            g = (b.groupby("c_count", as_index=False)
                 .agg(custdist=("c_count", "size")))
            return pa.table(
                {"c_count": g["c_count"].to_numpy(np.int64),
                 "custdist": g["custdist"].to_numpy(np.int64)},
                schema=hist_schema)

        hist = (agg.map_batches(hist_partial, batch_format="pandas",
                                batch_size=65536)
                .to_pandas()
                .groupby("c_count", as_index=False)["custdist"].sum())
        n_with_orders = int(hist["custdist"].sum())

    n_zero = n_custs_total - n_with_orders
    if n_zero > 0:
        hist = pd.concat([hist, pd.DataFrame(
            {"c_count": [0], "custdist": [n_zero]})], ignore_index=True)
    hist = (hist.sort_values(["custdist", "c_count"],
                             ascending=[False, False])
            .reset_index(drop=True))
    hist["c_count"] = hist["c_count"].astype("int64")
    hist["custdist"] = hist["custdist"].astype("int64")
    return hist[["c_count", "custdist"]]


def large_volume_customers(sf_dir: str, qty_threshold: int = 250,
                           k: int = 100,
                           driver_limit: int = 2_000_000):
    """TPC-H Q18-shaped large-volume customers: the orders whose
    total lineitem quantity exceeds ``qty_threshold``, with customer
    name, order date, and total price — top ``k`` by total price
    (ties break on orderkey ascending).

    Exactness: quantities are integer-valued, so per-order sums and
    the threshold test are exact int64; ``o_totalprice`` reports as
    integer cents.

    Distributed shape: lineitem reduces per batch to (orderkey, qty)
    partials + one combine level (order-bounded, never lineitem
    count); the per-order fold runs on the driver under
    ``driver_limit`` and as a distributed Sum groupby with the
    threshold filter applied per batch above it.  The surviving "hot"
    orderkeys — rare by construction — broadcast back once and ONE
    pruned orders pass fetches their rows; customer is a
    dimension-sized driver read."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    part_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("qty", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame({
                "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                "qty": np.floor(b["l_quantity"].to_numpy() + 0.5)
                       .astype(np.int64)})
             .groupby("l_orderkey", as_index=False)["qty"].sum())
        return pa.table({"l_orderkey": g["l_orderkey"].to_numpy(np.int64),
                         "qty": g["qty"].to_numpy(np.int64)},
                        schema=part_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("l_orderkey", as_index=False, sort=False)[
            "qty"].sum()
        return pa.table({"l_orderkey": g["l_orderkey"].to_numpy(np.int64),
                         "qty": g["qty"].to_numpy(np.int64)},
                        schema=part_schema)

    partials = (read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                                   columns=["l_orderkey", "l_quantity"])
                .map_batches(partial, batch_format="pandas",
                             batch_size=8192)
                .map_batches(combine, batch_format="pandas",
                             batch_size=65536)
                .materialize())

    if partials.count() <= driver_limit:
        sums = (partials.to_pandas()
                .groupby("l_orderkey", as_index=False)["qty"].sum())
        big = sums[sums["qty"] > qty_threshold]
    else:  # order cardinality beyond the driver budget
        from ray.data.aggregate import Sum

        agg = (partials.groupby("l_orderkey")
               .aggregate(Sum("qty", alias_name="qty")))

        def over(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            return t.filter(pc.greater(t["qty"],
                                       pa.scalar(qty_threshold)))

        big = agg.map_batches(over, batch_format="pyarrow").to_pandas()

    empty = pd.DataFrame({
        "c_custkey": pd.Series([], dtype="int64"),
        "c_name": pd.Series([], dtype=object),
        "o_orderkey": pd.Series([], dtype="int64"),
        "o_orderdate": pd.Series([], dtype="datetime64[us]"),
        "o_totalprice_c2": pd.Series([], dtype="int64"),
        "sum_qty": pd.Series([], dtype="int64")})
    if big.empty:
        return empty

    hot = np.sort(big["l_orderkey"].to_numpy(np.int64))
    hot_ref = ray.put(hot)

    fetch_schema = pa.schema([("o_orderkey", pa.int64()),
                              ("o_custkey", pa.int64()),
                              ("o_orderdate", pa.timestamp("us")),
                              ("o_totalprice_c2", pa.int64())])

    def fetch(b: pd.DataFrame) -> pa.Table:
        keys = ray.get(hot_ref)
        ok = b["o_orderkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, ok)
        pos[pos >= len(keys)] = 0
        b = b[keys[pos] == ok]
        return pa.table(
            {"o_orderkey": b["o_orderkey"].to_numpy(np.int64),
             "o_custkey": b["o_custkey"].to_numpy(np.int64),
             "o_orderdate": pa.array(
                 b["o_orderdate"].to_numpy().astype("datetime64[us]")),
             "o_totalprice_c2": _cents(b["o_totalprice"]).to_numpy()},
            schema=fetch_schema)

    odf = (read_parquet_clean(
              f"{sf_dir}/orders.parquet",
              columns=["o_orderkey", "o_custkey", "o_orderdate",
                       "o_totalprice"])
           .map_batches(fetch, batch_format="pandas", batch_size=8192)
           .to_pandas())
    if odf.empty:
        return empty
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_name"]).to_pandas()
    cust["c_custkey"] = cust["c_custkey"].astype("int64")
    out = (odf.merge(big.rename(columns={"l_orderkey": "o_orderkey",
                                         "qty": "sum_qty"}),
                     on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey"))
    out = (out.sort_values(["o_totalprice_c2", "o_orderkey"],
                           ascending=[False, True])
           .head(k).reset_index(drop=True))
    for c in ("c_custkey", "o_orderkey", "o_totalprice_c2", "sum_qty"):
        out[c] = out[c].astype("int64")
    out["o_orderdate"] = out["o_orderdate"].astype("datetime64[us]")
    return out[["c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice_c2", "sum_qty"]]


# the Q19 disjunction: (brand, max size, qty lo, qty hi) conjunctions
_Q19_TERMS = (("Brand#12", 5, 1, 11),
              ("Brand#23", 10, 10, 20),
              ("Brand#7", 15, 20, 30))


def disjunctive_revenue(sf_dir: str, terms=_Q19_TERMS):
    """TPC-H Q19-shaped disjunctive predicate probe: total discounted
    revenue (and item count) of lineitems matching ANY of the
    brand × size-range × quantity-range conjunctions in ``terms`` —
    the OR-of-ANDs shape that defeats naive predicate pushdown.

    Distributed shape: part ships ONCE as (sorted partkey, brand id,
    size) numpy columns; each lineitem batch evaluates the whole
    disjunction vectorized and emits a single (rev_c4, n) row — no
    shuffle, driver folds a partials-count-bounded table."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    brand_id = {b: i + 1 for i, (b, _, _, _) in enumerate(terms)}
    pk = pq.read_table(f"{sf_dir}/part.parquet",
                       columns=["p_partkey", "p_brand", "p_size"]
                       ).to_pandas()
    keys = pk["p_partkey"].to_numpy(np.int64)
    order = np.argsort(keys)
    bid = pk["p_brand"].map(lambda b: brand_id.get(b, 0)).to_numpy(
        np.int64)[order]
    size = pk["p_size"].to_numpy(np.int64)[order]
    part_ref = ray.put((keys[order], bid, size))

    out_schema = pa.schema([("revenue_c4", pa.int64()),
                            ("n_items", pa.int64())])

    def probe(b: pd.DataFrame) -> pa.Table:
        keys, bid, size = ray.get(part_ref)
        pkey = b["l_partkey"].to_numpy(np.int64)
        pos = np.searchsorted(keys, pkey)  # FK: every partkey present
        qty = np.floor(b["l_quantity"].to_numpy() + 0.5).astype(np.int64)
        keep = np.zeros(len(pkey), bool)
        for i, (_, max_size, qlo, qhi) in enumerate(terms):
            keep |= ((bid[pos] == i + 1) & (size[pos] >= 1)
                     & (size[pos] <= max_size)
                     & (qty >= qlo) & (qty <= qhi))
        rev = _cents(b["l_extendedprice"][keep]
                     * (1.0 - b["l_discount"][keep]), 10_000).to_numpy()
        return pa.table({"revenue_c4": [int(rev.sum())],
                         "n_items": [int(keep.sum())]},
                        schema=out_schema)

    df = (read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"])
          .map_batches(probe, batch_format="pandas", batch_size=8192)
          .to_pandas())
    return pd.DataFrame({
        "revenue_c4": pd.Series([int(df["revenue_c4"].sum())],
                                dtype="int64"),
        "n_items": pd.Series([int(df["n_items"].sum())], dtype="int64")})


def min_cost_supplier(sf_dir: str, region: str = "ASIA",
                      size_multiple: int = 5, k: int = 100):
    """TPC-H Q2-shaped minimum-cost supplier: for every part whose
    size is a multiple of ``size_multiple``, the cheapest unit price
    (``floor(l_extendedprice·100 / l_quantity + 0.5)``, an exact
    double→int grid both engines compute identically) offered by a
    supplier in ``region``, with the lowest-keyed supplier breaking
    unit-price ties — the correlated-MIN subquery shape, top-``k`` by
    supplier account balance then partkey.

    Distributed shape: supplier→nation→region and the eligible-part
    attrs are dimension broadcasts (sorted numpy + ``searchsorted``);
    the pruned lineitem scan reduces per batch to per-part LEXICOGRAPHIC
    minima — ``unit_c2·2^21 + suppkey`` packs (min unit, then min
    suppkey) into ONE int64 ``min`` that combines associatively, so
    the argmin survives partial aggregation without a second pass —
    then a narrow combine level and a parts-bounded driver merge.
    The fact table never shuffles.  The 2^21 pack bounds suppkey at
    ~2M; a fleet-scale supplier table would widen the pack to a
    two-int64 struct min (runtime-guarded here)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    PACK = np.int64(1) << 21

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    sup = pq.read_table(f"{sf_dir}/supplier.parquet").to_pandas()
    nkeys = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    nkeys = nkeys.loc[nkeys["r_name"] == region, "n_nationkey"]
    sup = sup[sup["s_nationkey"].isin(set(nkeys.tolist()))]
    if len(sup) and int(sup["s_suppkey"].max()) >= int(PACK):
        raise ValueError("suppkey exceeds the 2^21 argmin pack; widen "
                         "to a struct min for this catalog size")
    skeys = np.sort(sup["s_suppkey"].to_numpy(np.int64))

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"]).to_pandas()
    part = part[part["p_size"] % size_multiple == 0]
    pkeys = np.sort(part["p_partkey"].to_numpy(np.int64))

    skeys_ref, pkeys_ref = ray.put(skeys), ray.put(pkeys)

    min_schema = pa.schema([("p_partkey", pa.int64()),
                            ("packed", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        sk, pk = ray.get(skeys_ref), ray.get(pkeys_ref)
        lp = b["l_partkey"].to_numpy(np.int64)
        ls = b["l_suppkey"].to_numpy(np.int64)
        keep = _member(pk, lp) & _member(sk, ls)
        if not keep.any():
            return min_schema.empty_table()
        unit_c2 = np.floor(
            b["l_extendedprice"].to_numpy()[keep] * 100
            / b["l_quantity"].to_numpy()[keep] + 0.5).astype(np.int64)
        g = (pd.DataFrame({"p_partkey": lp[keep],
                           "packed": unit_c2 * PACK + ls[keep]})
             .groupby("p_partkey", as_index=False).agg(
                 packed=("packed", "min")))
        return pa.table({"p_partkey": g["p_partkey"].to_numpy(np.int64),
                         "packed": g["packed"].to_numpy(np.int64)},
                        schema=min_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("p_partkey", as_index=False).agg(
            packed=("packed", "min"))
        return pa.table({"p_partkey": g["p_partkey"].to_numpy(np.int64),
                         "packed": g["packed"].to_numpy(np.int64)},
                        schema=min_schema)

    df = (read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity",
                     "l_extendedprice"])
          .map_batches(partial, batch_format="pandas", batch_size=8192)
          .map_batches(combine, batch_format="pandas", batch_size=65536)
          .to_pandas())
    cols = ["p_partkey", "p_brand", "min_unit_c2", "s_suppkey",
            "s_name", "s_acctbal_c2"]
    if df.empty:
        return pd.DataFrame({
            "p_partkey": pd.Series([], dtype="int64"),
            "p_brand": pd.Series([], dtype="object"),
            "min_unit_c2": pd.Series([], dtype="int64"),
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "s_acctbal_c2": pd.Series([], dtype="int64")})
    g = df.groupby("p_partkey", as_index=False).agg(
        packed=("packed", "min"))
    g["min_unit_c2"] = (g["packed"] // PACK).astype("int64")
    g["s_suppkey"] = (g["packed"] % PACK).astype("int64")
    sup = sup.copy()
    sup["s_acctbal_c2"] = _cents(sup["s_acctbal"])
    out = (g.merge(part[["p_partkey", "p_brand"]], on="p_partkey")
           .merge(sup[["s_suppkey", "s_name", "s_acctbal_c2"]],
                  on="s_suppkey")
           .sort_values(["s_acctbal_c2", "p_partkey"],
                        ascending=[False, True])
           .head(k).reset_index(drop=True))
    for c in ("p_partkey", "min_unit_c2", "s_suppkey", "s_acctbal_c2"):
        out[c] = out[c].astype("int64")
    return out[cols]


def part_value_share(sf_dir: str, nation: str = "NATION_3",
                     share_den: int = 1000):
    """TPC-H Q11-shaped value concentration: per part, the discounted
    revenue (exact c6 grid) contributed by suppliers of ``nation``,
    keeping the parts whose value exceeds 1/``share_den`` of the
    nation's total — the HAVING-over-scalar-subquery shape, with the
    threshold compare kept in integers (``value_c6 · share_den >
    total_c6``) so no float division can flip a boundary row.

    Distributed shape: the nation's suppkey set broadcasts (sorted
    numpy); the lineitem scan reduces per batch to per-part c6 sums →
    narrow combine → parts-bounded driver merge where the scalar total
    and the HAVING filter are a vectorized compare.  No exchange."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = set(nat.loc[nat["n_name"] == nation, "n_nationkey"].tolist())
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    skeys = np.sort(
        sup.loc[sup["s_nationkey"].isin(nk), "s_suppkey"]
        .to_numpy(np.int64))
    skeys_ref = ray.put(skeys)

    val_schema = pa.schema([("p_partkey", pa.int64()),
                            ("value_c6", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        sk = ray.get(skeys_ref)
        keep = _member(sk, b["l_suppkey"].to_numpy(np.int64))
        if not keep.any():
            return val_schema.empty_table()
        price_c2 = np.floor(
            b["l_extendedprice"].to_numpy()[keep] * 100 + 0.5
        ).astype(np.int64)
        disc_c4 = np.floor(
            b["l_discount"].to_numpy()[keep] * 10_000 + 0.5
        ).astype(np.int64)
        g = (pd.DataFrame(
                {"p_partkey": b["l_partkey"].to_numpy(np.int64)[keep],
                 "value_c6": price_c2 * (10_000 - disc_c4)})
             .groupby("p_partkey", as_index=False).agg(
                 value_c6=("value_c6", "sum")))
        return pa.table({"p_partkey": g["p_partkey"].to_numpy(np.int64),
                         "value_c6": g["value_c6"].to_numpy(np.int64)},
                        schema=val_schema)

    def combine(b: pd.DataFrame) -> pa.Table:
        g = b.groupby("p_partkey", as_index=False).agg(
            value_c6=("value_c6", "sum"))
        return pa.table({"p_partkey": g["p_partkey"].to_numpy(np.int64),
                         "value_c6": g["value_c6"].to_numpy(np.int64)},
                        schema=val_schema)

    df = (read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice",
                     "l_discount"])
          .map_batches(partial, batch_format="pandas", batch_size=8192)
          .map_batches(combine, batch_format="pandas", batch_size=65536)
          .to_pandas())
    if df.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "value_c6": pd.Series([], dtype="int64")})
    g = df.groupby("p_partkey", as_index=False).agg(
        value_c6=("value_c6", "sum"))
    total = int(g["value_c6"].sum())
    g = g[g["value_c6"].to_numpy() * share_den > total]
    g = (g.sort_values(["value_c6", "p_partkey"],
                       ascending=[False, True]).reset_index(drop=True))
    for c in ("p_partkey", "value_c6"):
        g[c] = g[c].astype("int64")
    return g[["p_partkey", "value_c6"]]


def delay_bucket_priority(sf_dir: str, date_lo: str = "1996-01-01",
                          date_hi: str = "1997-01-01",
                          bucket_days: int = 30, max_bucket: int = 3,
                          broadcast_limit: int = 2_000_000):
    """TPC-H Q12-shaped shipping-delay audit: lineitems of orders
    placed in [date_lo, date_hi) bucket by shipping delay
    (``min(delay_days // bucket_days, max_bucket)``, the ship-mode
    stand-in — this corpus carries no ``l_shipmode``), and each bucket
    counts critical (1-URGENT / 2-HIGH) vs non-critical order
    priorities — Q12's CASE-sum pair.

    Size-adaptive on the windowed orders count (the
    :func:`late_order_priority` gate):

    * ≤ ``broadcast_limit`` → (orderkey, orderdate_us, is_critical)
      broadcast as sorted numpy; ONE lineitem pass emits per-batch
      (bucket, high, low) count partials — a ≤``max_bucket``+1-row
      table the driver folds.  No exchange.
    * above → order rows and per-batch lineitem rows union on a
      common schema into ONE coarse orderkey-bucket exchange; each
      bucket joins vectorized and emits the same bounded partials."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..sources.readers import read_parquet_clean

    lo, hi = pd.Timestamp(date_lo), pd.Timestamp(date_hi)
    day_us = np.int64(86_400_000_000)
    crit = ("1-URGENT", "2-HIGH")

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"])

    def o_filter(t: pa.Table) -> pa.Table:
        return t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi))))

    win = orders.map_batches(o_filter, batch_format="pyarrow").materialize()
    n_win = win.count()

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"])

    cnt_schema = pa.schema([("delay_bucket", pa.int64()),
                            ("n_critical", pa.int64()),
                            ("n_other", pa.int64())])

    def _bucket_counts(delay_us: np.ndarray, is_crit: np.ndarray
                       ) -> pa.Table:
        bucket = np.minimum(delay_us // (bucket_days * day_us),
                            max_bucket)
        bucket = np.maximum(bucket, 0)
        g = (pd.DataFrame({"delay_bucket": bucket,
                           "n_critical": is_crit.astype(np.int64),
                           "n_other": (~is_crit).astype(np.int64)})
             .groupby("delay_bucket", as_index=False).sum())
        return pa.table(
            {"delay_bucket": g["delay_bucket"].to_numpy(np.int64),
             "n_critical": g["n_critical"].to_numpy(np.int64),
             "n_other": g["n_other"].to_numpy(np.int64)},
            schema=cnt_schema)

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "delay_bucket": pd.Series([], dtype="int64"),
                "n_critical": pd.Series([], dtype="int64"),
                "n_other": pd.Series([], dtype="int64")})
        g = (df.groupby("delay_bucket", as_index=False).sum()
             .sort_values("delay_bucket").reset_index(drop=True))
        for c in ("delay_bucket", "n_critical", "n_other"):
            g[c] = g[c].astype("int64")
        return g[["delay_bucket", "n_critical", "n_other"]]

    if n_win <= broadcast_limit:
        odf = win.to_pandas().sort_values("o_orderkey")
        okeys = odf["o_orderkey"].to_numpy(np.int64)
        odates = odf["o_orderdate"].astype("int64").to_numpy()
        ocrit = odf["o_orderpriority"].isin(crit).to_numpy()
        refs = ray.put((okeys, odates, ocrit))

        def l_partial(b: pd.DataFrame) -> pa.Table:
            ok, od, oc = ray.get(refs)
            lk = b["l_orderkey"].to_numpy(np.int64)
            hit = _member(ok, lk)
            if not hit.any():
                return cnt_schema.empty_table()
            pos = np.searchsorted(ok, lk)[hit]
            ship = b["l_shipdate"].astype("int64").to_numpy()[hit]
            return _bucket_counts(ship - od[pos], oc[pos])

        df = (lineitem.map_batches(l_partial, batch_format="pandas",
                                   batch_size=8192)
              .to_pandas())
        return _finalize(df)

    u_schema = pa.schema([("okey", pa.int64()), ("kind", pa.int64()),
                          ("v", pa.int64()), ("is_crit", pa.int64()),
                          ("bucket", pa.int64())])

    def o_rows(b: pd.DataFrame) -> pa.Table:
        ok = b["o_orderkey"].to_numpy(np.int64)
        return pa.table(
            {"okey": ok, "kind": np.zeros(len(b), dtype=np.int64),
             "v": b["o_orderdate"].astype("int64").to_numpy(),
             "is_crit": b["o_orderpriority"].isin(crit)
             .to_numpy().astype(np.int64),
             "bucket": ok % 1024}, schema=u_schema)

    def l_rows(b: pd.DataFrame) -> pa.Table:
        lk = b["l_orderkey"].to_numpy(np.int64)
        return pa.table(
            {"okey": lk, "kind": np.ones(len(b), dtype=np.int64),
             "v": b["l_shipdate"].astype("int64").to_numpy(),
             "is_crit": np.zeros(len(b), dtype=np.int64),
             "bucket": lk % 1024}, schema=u_schema)

    _warn = _skew_warn()

    def bucket_join(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("delay_bucket_priority.bucket", len(group), _warn)
        o = (group.loc[group["kind"] == 0, ["okey", "v", "is_crit"]]
             .rename(columns={"v": "odate"}))
        li = (group.loc[group["kind"] == 1, ["okey", "v"]]
              .rename(columns={"v": "ship"}))
        m = li.merge(o, on="okey", how="inner")
        if m.empty:
            return cnt_schema.empty_table()
        return _bucket_counts(
            m["ship"].to_numpy() - m["odate"].to_numpy(),
            m["is_crit"].to_numpy() == 1)

    both = (win.map_batches(o_rows, batch_format="pandas")
            .union(lineitem.map_batches(l_rows, batch_format="pandas",
                                        batch_size=8192)))
    df = (both.groupby("bucket").map_groups(bucket_join,
                                            batch_format="pandas")
          .to_pandas())
    return _finalize(df)


def supplier_count_by_part(sf_dir: str, min_acctbal: float = 600.0,
                           excl_brand: str = "Brand#5",
                           excl_type: str = "PROMO",
                           driver_limit: int = 2_000_000,
                           n_buckets: int = 1024):
    """TPC-H Q16-shaped supplier diversity: per (p_brand, p_type,
    p_size), how many DISTINCT suppliers shipped that part class —
    excluding one brand, one type, and suppliers below
    ``min_acctbal`` (the complaints-filter stand-in).

    Distributed shape: the supplier/part filters broadcast (sorted
    numpy); the lineitem scan collapses per batch to DISTINCT
    (partkey, suppkey) pairs — bounded by the catalog cross-section,
    never lineitem count.  Under ``driver_limit`` deduped pairs the
    driver maps partkey→attrs and counts distinct suppliers per
    class; above it ONE coarse partkey-bucket exchange dedups
    pair-exactly first (every copy of a partkey co-locates), buckets
    map attrs locally, and the driver dedups the (class, suppkey)
    remainder — bounded by classes × suppliers, a second fleet-scale
    exchange documented as the scale path."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ..sources.readers import read_parquet_clean

    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_acctbal"]).to_pandas()
    skeys = np.sort(
        sup.loc[sup["s_acctbal"] >= min_acctbal, "s_suppkey"]
        .to_numpy(np.int64))

    part = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"]).to_pandas()
    part = part[(part["p_brand"] != excl_brand)
                & (part["p_type"] != excl_type)]
    pkeys = np.sort(part["p_partkey"].to_numpy(np.int64))
    refs = ray.put((skeys, pkeys))

    pair_schema = pa.schema([("p_partkey", pa.int64()),
                             ("s_suppkey", pa.int64())])

    def pairs_partial(b: pd.DataFrame) -> pa.Table:
        sk, pk = ray.get(refs)
        lp = b["l_partkey"].to_numpy(np.int64)
        ls = b["l_suppkey"].to_numpy(np.int64)
        keep = _member(pk, lp) & _member(sk, ls)
        d = (pd.DataFrame({"p_partkey": lp[keep],
                           "s_suppkey": ls[keep]})
             .drop_duplicates())
        return pa.table({"p_partkey": d["p_partkey"].to_numpy(np.int64),
                         "s_suppkey": d["s_suppkey"].to_numpy(np.int64)},
                        schema=pair_schema)

    pairs = (read_parquet_clean(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_suppkey"])
             .map_batches(pairs_partial, batch_format="pandas",
                          batch_size=8192)
             .materialize())

    attrs = part.set_index("p_partkey")[["p_brand", "p_type", "p_size"]]

    def _finalize(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop_duplicates()
        g = (d.groupby(["p_brand", "p_type", "p_size"], as_index=False)
             .agg(supplier_cnt=("s_suppkey", "nunique")))
        g = (g.sort_values(
                ["supplier_cnt", "p_brand", "p_type", "p_size"],
                ascending=[False, True, True, True])
             .reset_index(drop=True))
        g["p_size"] = g["p_size"].astype("int64")
        g["supplier_cnt"] = g["supplier_cnt"].astype("int64")
        return g[["p_brand", "p_type", "p_size", "supplier_cnt"]]

    if pairs.count() <= driver_limit:
        d = pairs.to_pandas().drop_duplicates()
        d = d.join(attrs, on="p_partkey")
        return _finalize(d[["p_brand", "p_type", "p_size", "s_suppkey"]])

    bucket_schema = pa.schema([("bucket", pa.int64()),
                               ("p_partkey", pa.int64()),
                               ("s_suppkey", pa.int64())])

    def with_bucket(t: pa.Table) -> pa.Table:
        pk = t["p_partkey"].to_numpy()
        return pa.table({"bucket": pk % n_buckets,
                         "p_partkey": pk,
                         "s_suppkey": t["s_suppkey"].to_numpy()},
                        schema=bucket_schema)

    attrs_ref = ray.put(attrs)
    cls_schema = pa.schema([("p_brand", pa.string()),
                            ("p_type", pa.string()),
                            ("p_size", pa.int64()),
                            ("s_suppkey", pa.int64())])
    _warn = _skew_warn()

    def bucket_classes(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("supplier_count_by_part.bucket", len(group), _warn)
        a = ray.get(attrs_ref)
        d = (group[["p_partkey", "s_suppkey"]].drop_duplicates()
             .join(a, on="p_partkey"))
        d = d[["p_brand", "p_type", "p_size", "s_suppkey"]].drop_duplicates()
        return pa.table({"p_brand": d["p_brand"].astype(str),
                         "p_type": d["p_type"].astype(str),
                         "p_size": d["p_size"].to_numpy(np.int64),
                         "s_suppkey": d["s_suppkey"].to_numpy(np.int64)},
                        schema=cls_schema)

    d = (pairs.map_batches(with_bucket, batch_format="pyarrow")
         .groupby("bucket").map_groups(bucket_classes,
                                       batch_format="pandas")
         .to_pandas())
    return _finalize(d)


def dominant_part_suppliers(sf_dir: str, nation: str = "NATION_19",
                            avg_multiple: int = 2,
                            n_buckets: int = 1024):
    """TPC-H Q20-shaped dominant-supplier probe: suppliers of
    ``nation`` who shipped MORE THAN ``avg_multiple``× the
    per-supplier average quantity of some part
    (``qty(s,p)·n_suppliers(p) > avg_multiple·qty(·,p)``, integers on
    the rounded-qty grid — a share threshold would dilute as the
    supplier catalog grows with scale; the above-average form is
    SF-stable) — Q20's excess-availability EXISTS restated over
    shipped volume — with how many parts each dominates.

    Distributed shape: per-batch (partkey, suppkey) qty partials →
    ONE coarse partkey-bucket exchange co-locating every row of a
    part, so each bucket computes part totals AND the dominance flags
    vectorized and emits per-supplier dominated-part count partials;
    the driver folds a suppliers-bounded table and broadcasts nothing
    but the nation's supplier dimension."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.readers import read_parquet_clean

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nk = set(nat.loc[nat["n_name"] == nation, "n_nationkey"].tolist())
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name", "s_nationkey"]
                        ).to_pandas()
    sup = sup[sup["s_nationkey"].isin(nk)]

    qty_schema = pa.schema([("bucket", pa.int64()),
                            ("p_partkey", pa.int64()),
                            ("s_suppkey", pa.int64()),
                            ("qty", pa.int64())])

    def partial(b: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame(
                {"p_partkey": b["l_partkey"].to_numpy(np.int64),
                 "s_suppkey": b["l_suppkey"].to_numpy(np.int64),
                 "qty": np.floor(b["l_quantity"].to_numpy() + 0.5)
                 .astype(np.int64)})
             .groupby(["p_partkey", "s_suppkey"], as_index=False)
             .agg(qty=("qty", "sum")))
        pk = g["p_partkey"].to_numpy(np.int64)
        return pa.table({"bucket": pk % n_buckets, "p_partkey": pk,
                         "s_suppkey": g["s_suppkey"].to_numpy(np.int64),
                         "qty": g["qty"].to_numpy(np.int64)},
                        schema=qty_schema)

    dom_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("n_parts_dominated", pa.int64())])
    _warn = _skew_warn()

    def bucket_dominance(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("dominant_part_suppliers.bucket", len(group), _warn)
        g = (group.groupby(["p_partkey", "s_suppkey"], as_index=False)
             .agg(qty=("qty", "sum")))
        tot = g.groupby("p_partkey")["qty"].transform("sum")
        ns = g.groupby("p_partkey")["qty"].transform("size")
        dom = g[g["qty"].to_numpy() * ns.to_numpy()
                > avg_multiple * tot.to_numpy()]
        c = (dom.groupby("s_suppkey", as_index=False).size()
             .rename(columns={"size": "n_parts_dominated"}))
        return pa.table(
            {"s_suppkey": c["s_suppkey"].to_numpy(np.int64),
             "n_parts_dominated":
                 c["n_parts_dominated"].to_numpy(np.int64)},
            schema=dom_schema)

    df = (read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"])
          .map_batches(partial, batch_format="pandas", batch_size=8192)
          .groupby("bucket").map_groups(bucket_dominance,
                                        batch_format="pandas")
          .to_pandas())
    if df.empty:
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "n_parts_dominated": pd.Series([], dtype="int64")})
    g = (df.groupby("s_suppkey", as_index=False)
         .agg(n_parts_dominated=("n_parts_dominated", "sum"))
         .merge(sup[["s_suppkey", "s_name"]], on="s_suppkey")
         .sort_values("s_suppkey").reset_index(drop=True))
    for c in ("s_suppkey", "n_parts_dominated"):
        g[c] = g[c].astype("int64")
    return g[["s_suppkey", "s_name", "n_parts_dominated"]]


def sole_late_suppliers(sf_dir: str, grace_days: int = 45,
                        status: str = "F", n_buckets: int = 1024,
                        k: int = 100):
    """TPC-H Q21-shaped waiting-supplier report: over finished
    (``o_orderstatus = status``) multi-supplier orders, count per
    supplier the orders where that supplier was the ONLY one whose
    lineitem shipped more than ``grace_days`` after the order date —
    Q21's EXISTS-other-supplier / NOT-EXISTS-other-late-supplier
    pair, restated on the ship-date grid (this corpus carries no
    commit/receipt dates).  Top-``k`` by count then suppkey.

    Distributed shape: order rows and per-batch locally-deduped
    (orderkey, suppkey, max_ship) lineitem partials union on a
    common schema into ONE coarse orderkey-bucket exchange (every
    row of an order co-locates); each bucket computes per-order
    distinct-supplier and late-supplier counts vectorized and emits
    per-supplier count partials — suppliers-bounded — which the
    driver folds and joins to the supplier dimension."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..sources.readers import read_parquet_clean

    grace_us = np.int64(grace_days) * 86_400 * 1_000_000
    sup = pq.read_table(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_name"]).to_pandas()

    u_schema = pa.schema([("okey", pa.int64()), ("kind", pa.int64()),
                          ("skey", pa.int64()), ("v", pa.int64()),
                          ("bucket", pa.int64())])

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderstatus"])

    def o_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["o_orderstatus"], pa.scalar(status)))
        ok = t["o_orderkey"].to_numpy()
        return pa.table(
            {"okey": ok, "kind": np.zeros(len(ok), dtype=np.int64),
             "skey": np.zeros(len(ok), dtype=np.int64),
             "v": t["o_orderdate"].cast(pa.int64()).to_numpy(),
             "bucket": ok % n_buckets}, schema=u_schema)

    def l_rows(b: pd.DataFrame) -> pa.Table:
        g = (pd.DataFrame(
                {"okey": b["l_orderkey"].to_numpy(np.int64),
                 "skey": b["l_suppkey"].to_numpy(np.int64),
                 "v": b["l_shipdate"].astype("int64").to_numpy()})
             .groupby(["okey", "skey"], as_index=False)
             .agg(v=("v", "max")))
        ok = g["okey"].to_numpy(np.int64)
        return pa.table(
            {"okey": ok, "kind": np.ones(len(g), dtype=np.int64),
             "skey": g["skey"].to_numpy(np.int64),
             "v": g["v"].to_numpy(np.int64),
             "bucket": ok % n_buckets}, schema=u_schema)

    cnt_schema = pa.schema([("s_suppkey", pa.int64()),
                            ("numwait", pa.int64())])
    _warn = _skew_warn()

    def bucket_waits(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("sole_late_suppliers.bucket", len(group), _warn)
        o = group[group["kind"] == 0][["okey", "v"]]
        li = (group[group["kind"] == 1]
              .groupby(["okey", "skey"], as_index=False)
              .agg(v=("v", "max")))
        m = li.merge(o, on="okey", how="inner",
                     suffixes=("_ship", "_odate"))
        if m.empty:
            return cnt_schema.empty_table()
        m["late"] = (m["v_ship"].to_numpy()
                     > m["v_odate"].to_numpy() + grace_us)
        per = m.groupby("okey").agg(
            n_supp=("skey", "size"), n_late=("late", "sum"))
        target = per[(per["n_supp"] >= 2) & (per["n_late"] == 1)]
        if target.empty:
            return cnt_schema.empty_table()
        hits = m[m["late"] & m["okey"].isin(target.index)]
        c = (hits.groupby("skey", as_index=False).size()
             .rename(columns={"size": "numwait"}))
        return pa.table({"s_suppkey": c["skey"].to_numpy(np.int64),
                         "numwait": c["numwait"].to_numpy(np.int64)},
                        schema=cnt_schema)

    lineitem = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    both = (orders.map_batches(o_rows, batch_format="pyarrow")
            .union(lineitem.map_batches(l_rows, batch_format="pandas",
                                        batch_size=8192)))
    df = (both.groupby("bucket").map_groups(bucket_waits,
                                            batch_format="pandas")
          .to_pandas())
    if df.empty:
        return pd.DataFrame({
            "s_suppkey": pd.Series([], dtype="int64"),
            "s_name": pd.Series([], dtype="object"),
            "numwait": pd.Series([], dtype="int64")})
    g = (df.groupby("s_suppkey", as_index=False)
         .agg(numwait=("numwait", "sum"))
         .merge(sup, on="s_suppkey")
         .sort_values(["numwait", "s_suppkey"],
                      ascending=[False, True])
         .head(k).reset_index(drop=True))
    for c in ("s_suppkey", "numwait"):
        g[c] = g[c].astype("int64")
    return g[["s_suppkey", "s_name", "numwait"]]



def idle_customer_balance(sf_dir: str,
                          segments: tuple = ("BUILDING", "MACHINERY",
                                             "FURNITURE"),
                          date_lo: str = "1999-01-01",
                          broadcast_limit: int = 5_000_000):
    """TPC-H Q22-shaped idle-capital report: per market segment (the
    phone-prefix stand-in), count the customers whose balance exceeds
    the positive-balance average of the segment set AND who placed no
    order since ``date_lo`` (Q22's seven-years-idle clause — this
    synthetic order stream touches every customer, so "no orders
    ever" would be vacuous), with the idle capital total — Q22's
    scalar subquery + NOT EXISTS.  The above-average compare stays in
    integers (``acctbal_c2 · n > sum_c2``) so no float division can
    flip a boundary customer.

    Distributed shape: the scalar (n, sum_c2) folds from per-batch
    customer partials; the orders scan collapses to per-batch
    DISTINCT custkeys (customers-bounded).  Under ``broadcast_limit``
    the sorted active-custkey array broadcasts and ONE customer pass
    anti-filters with ``searchsorted``, emitting per-segment (n,
    sum_c2) partials; above it both sides union into ONE coarse
    custkey-bucket exchange (the :func:`inactive_customers` shape)
    and each bucket emits the same bounded partials."""
    import pyarrow as pa
    import ray

    from ..sources.readers import read_parquet_clean

    segset = set(segments)
    customer = read_parquet_clean(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment", "c_acctbal"])

    avg_schema = pa.schema([("n", pa.int64()), ("sum_c2", pa.int64())])

    def avg_partial(b: pd.DataFrame) -> pa.Table:
        m = (b["c_mktsegment"].isin(segset)
             & (b["c_acctbal"] > 0.0)).to_numpy()
        c2 = _cents(b["c_acctbal"][m])
        return pa.table({"n": [int(m.sum())], "sum_c2": [int(c2.sum())]},
                        schema=avg_schema)

    a = customer.map_batches(avg_partial, batch_format="pandas").to_pandas()
    n_pos, sum_c2 = int(a["n"].sum()), int(a["sum_c2"].sum())

    cut = pd.Timestamp(date_lo)
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"])
    key_schema = pa.schema([("custkey", pa.int64())])

    def active_partial(b: pd.DataFrame) -> pa.Table:
        b = b[b["o_orderdate"] >= cut]
        return pa.table(
            {"custkey": np.unique(b["o_custkey"].to_numpy(np.int64))},
            schema=key_schema)

    def active_combine(b: pd.DataFrame) -> pa.Table:
        return pa.table(
            {"custkey": np.unique(b["custkey"].to_numpy(np.int64))},
            schema=key_schema)

    active = (orders.map_batches(active_partial, batch_format="pandas")
              .map_batches(active_combine, batch_format="pandas",
                           batch_size=65536)
              .materialize())

    seg_schema = pa.schema([("c_mktsegment", pa.string()),
                            ("n_custs", pa.int64()),
                            ("total_acctbal_c2", pa.int64())])

    def _idle_partial(b: pd.DataFrame, active_keys: np.ndarray
                      ) -> pa.Table:
        ck = b["c_custkey"].to_numpy(np.int64)
        hit = _member(active_keys, ck)
        c2 = _cents(b["c_acctbal"]).to_numpy()
        keep = (b["c_mktsegment"].isin(segset).to_numpy()
                & ~hit & (c2 * n_pos > sum_c2))
        g = (pd.DataFrame({"c_mktsegment": b["c_mktsegment"]
                           .to_numpy()[keep],
                           "c2": c2[keep]})
             .groupby("c_mktsegment", as_index=False)
             .agg(n_custs=("c2", "size"),
                  total_acctbal_c2=("c2", "sum")))
        return pa.table(
            {"c_mktsegment": g["c_mktsegment"].astype(str),
             "n_custs": g["n_custs"].to_numpy(np.int64),
             "total_acctbal_c2":
                 g["total_acctbal_c2"].to_numpy(np.int64)},
            schema=seg_schema)

    def _finalize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "c_mktsegment": pd.Series([], dtype="object"),
                "n_custs": pd.Series([], dtype="int64"),
                "total_acctbal_c2": pd.Series([], dtype="int64")})
        g = (df.groupby("c_mktsegment", as_index=False)
             .agg(n_custs=("n_custs", "sum"),
                  total_acctbal_c2=("total_acctbal_c2", "sum"))
             .sort_values("c_mktsegment").reset_index(drop=True))
        for c in ("n_custs", "total_acctbal_c2"):
            g[c] = g[c].astype("int64")
        return g[["c_mktsegment", "n_custs", "total_acctbal_c2"]]

    if active.count() <= broadcast_limit:
        akeys = np.unique(active.to_pandas()["custkey"].to_numpy())
        aref = ray.put(akeys)

        def anti_partial(b: pd.DataFrame) -> pa.Table:
            return _idle_partial(b, ray.get(aref))

        df = (customer.map_batches(anti_partial, batch_format="pandas")
              .to_pandas())
        return _finalize(df)

    u_schema = pa.schema([("custkey", pa.int64()), ("kind", pa.int64()),
                          ("seg", pa.string()), ("c2", pa.int64()),
                          ("bucket", pa.int64())])

    def a_rows(b: pd.DataFrame) -> pa.Table:
        ck = b["custkey"].to_numpy(np.int64)
        return pa.table(
            {"custkey": ck, "kind": np.ones(len(b), dtype=np.int64),
             "seg": np.full(len(b), "", dtype=object),
             "c2": np.zeros(len(b), dtype=np.int64),
             "bucket": ck % 1024}, schema=u_schema)

    def c_rows(b: pd.DataFrame) -> pa.Table:
        ck = b["c_custkey"].to_numpy(np.int64)
        return pa.table(
            {"custkey": ck, "kind": np.zeros(len(b), dtype=np.int64),
             "seg": b["c_mktsegment"].astype(str).to_numpy(),
             "c2": _cents(b["c_acctbal"]).to_numpy(),
             "bucket": ck % 1024}, schema=u_schema)

    _warn = _skew_warn()

    def bucket_idle(group: pd.DataFrame) -> pa.Table:
        from ..state.skewmon import observe_group

        observe_group("idle_customer_balance.bucket", len(group), _warn)
        act = set(group.loc[group["kind"] == 1, "custkey"].to_numpy())
        c = group[group["kind"] == 0]
        c2 = c["c2"].to_numpy()
        keep = (c["seg"].isin(segset).to_numpy()
                & ~c["custkey"].isin(act).to_numpy()
                & (c2 * n_pos > sum_c2))
        g = (pd.DataFrame({"c_mktsegment": c["seg"].to_numpy()[keep],
                           "c2": c2[keep]})
             .groupby("c_mktsegment", as_index=False)
             .agg(n_custs=("c2", "size"),
                  total_acctbal_c2=("c2", "sum")))
        return pa.table(
            {"c_mktsegment": g["c_mktsegment"].astype(str),
             "n_custs": g["n_custs"].to_numpy(np.int64),
             "total_acctbal_c2":
                 g["total_acctbal_c2"].to_numpy(np.int64)},
            schema=seg_schema)

    both = (active.map_batches(a_rows, batch_format="pandas")
            .union(customer.map_batches(c_rows, batch_format="pandas")))
    df = (both.groupby("bucket").map_groups(bucket_idle,
                                            batch_format="pandas")
          .to_pandas())
    return _finalize(df)
