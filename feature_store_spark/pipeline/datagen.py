"""Deterministic synthetic image+caption table generator.

Produces the authoritative engine input per BASELINE.json ``input_hint``:
``images(image_id string, bytes binary, w int32, h int32, fmt string,
caption string, phash int64, event_time timestamp)`` plus an
``observations(image_id, obs_time)`` spine, per FIXTURES.md §A.

Seeded (default 42), no wall-clock dependence, no external data.  Entity
distribution is Zipf-skewed so hot-entity salting is exercised; event series
have irregular gaps (> session threshold) and exact-timestamp ties to probe
as-of inclusivity.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from feature_store_spark.functions.images import decode_image, encode_image, phash64

EPOCH = dt.datetime(2024, 1, 1)
SESSION_GAP_MIN = 30  # minutes; datagen plants gaps well above/below this

_VOCAB = (
    "sunset harbor mountain forest river skyline bridge market temple garden "
    "bicycle lantern festival monsoon valley pagoda island delta boat street"
).split()


def _caption(rng: np.random.Generator) -> str:
    n = int(rng.integers(3, 8))
    return " ".join(_VOCAB[i] for i in rng.integers(0, len(_VOCAB), n))


def generate_images(
    n_rows: int = 2000,
    n_entities: int = 50,
    seed: int = 42,
    with_bytes: bool = True,
    skew: float = 1.2,
) -> pd.DataFrame:
    """Deterministic images table. Zipf-skewed entities, tied timestamps.

    ``with_bytes=False`` generates the numeric/caption columns only (bytes
    column filled with None) for fast large-scale bench data where decode
    throughput is measured separately.
    """
    rng = np.random.default_rng(seed)
    # Zipf-ish entity draw: top entities own a disproportionate row share.
    weights = 1.0 / np.arange(1, n_entities + 1) ** skew
    weights /= weights.sum()
    ent_idx = rng.choice(n_entities, size=n_rows, p=weights)
    entity_ids = np.array([f"img_{i:06d}" for i in range(n_entities)])

    # Per-entity monotone event series with irregular gaps; ~5% exact ties.
    gaps_min = rng.choice(
        [1, 5, 17, 45, 120, 1440], size=n_rows, p=[0.3, 0.25, 0.2, 0.1, 0.1, 0.05]
    ).astype(np.int64)
    tie_mask = rng.random(n_rows) < 0.05
    gaps_min[tie_mask] = 0
    order = np.argsort(ent_idx, kind="stable")
    ent_sorted = ent_idx[order]
    gaps_sorted = gaps_min[order]
    boundaries = np.flatnonzero(np.diff(ent_sorted)) + 1
    # per-entity cumulative gap series, offset by a deterministic phase
    phase = rng.integers(0, 10_000, size=n_entities)
    ts_min = np.zeros(n_rows, dtype=np.int64)
    prev = 0
    for b in np.concatenate([boundaries, [n_rows]]):
        g = gaps_sorted[prev:b].copy()
        g[0] = int(phase[ent_sorted[prev]])
        ts_min[prev:b] = np.cumsum(g)
        prev = b
    event_time = np.array(
        [EPOCH + dt.timedelta(minutes=int(m)) for m in ts_min], dtype=object
    )

    rows = []
    for i in range(n_rows):
        row_rng = np.random.default_rng([seed, int(order[i])])
        w = int(row_rng.integers(8, 33))
        h = int(row_rng.integers(8, 33))
        fmt = "png" if row_rng.random() < 0.5 else "jpeg"
        caption = _caption(row_rng)
        if with_bytes:
            px = row_rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            data = encode_image(px, fmt)
            # phash describes the STORED image: hash the decode roundtrip so
            # lossy-format rows carry the hash an engine recompute reproduces
            ph = phash64(decode_image(data))
        else:
            data = None
            ph = int(row_rng.integers(-(2**62), 2**62))
        rows.append(
            {
                "image_id": entity_ids[ent_sorted[i]],
                "bytes": data,
                "w": np.int32(w),
                "h": np.int32(h),
                "fmt": fmt,
                "caption": caption,
                "phash": np.int64(ph),
                "event_time": event_time[i],
            }
        )
    df = pd.DataFrame(rows)
    df["event_time"] = pd.to_datetime(df["event_time"])
    return df.sort_values(["image_id", "event_time"], kind="stable").reset_index(
        drop=True
    )


def write_parquet(df: pd.DataFrame, path: str) -> None:
    """Write pandas → parquet with microsecond timestamps (Spark-readable;
    pandas defaults to TIMESTAMP(NANOS) which Spark rejects)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(df, preserve_index=False)
    fields = [
        pa.field(f.name, pa.timestamp("us")) if pa.types.is_timestamp(f.type) else f
        for f in table.schema
    ]
    pq.write_table(table.cast(pa.schema(fields)), path)


def generate_observations(
    images: pd.DataFrame, n_obs: int = 500, seed: int = 43, n_cold: int = 5
) -> pd.DataFrame:
    """Observation spine per FIXTURES.md §A2: between-event times, exact-tie
    times, before-first times, and cold-start entities with no history."""
    rng = np.random.default_rng(seed)
    ents = images["image_id"].unique()
    rows = []
    tmin = images["event_time"].min()
    tmax = images["event_time"].max()
    span_min = max(1, int((tmax - tmin).total_seconds() // 60))
    for _ in range(n_obs):
        e = ents[rng.integers(0, len(ents))]
        kind = rng.random()
        if kind < 0.1:
            # exactly equal to one of the entity's event times (inclusive check)
            ts_pool = images.loc[images["image_id"] == e, "event_time"]
            t = ts_pool.iloc[int(rng.integers(0, len(ts_pool)))]
        elif kind < 0.15:
            t = tmin - pd.Timedelta(minutes=int(rng.integers(1, 500)))  # leading null
        else:
            t = tmin + pd.Timedelta(minutes=int(rng.integers(0, span_min + 2000)))
        rows.append({"image_id": e, "obs_time": t})
    for i in range(n_cold):
        rows.append(
            {
                "image_id": f"cold_{i:03d}",
                "obs_time": tmin + pd.Timedelta(minutes=int(rng.integers(0, span_min))),
            }
        )
    df = pd.DataFrame(rows)
    df["obs_time"] = pd.to_datetime(df["obs_time"])
    return df.sort_values(["image_id", "obs_time"], kind="stable").reset_index(
        drop=True
    )
