"""Multimodal column plumbing (images/audio/video as opaque binary).

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — see ``_decode_image_real``), but the Ray-side
plumbing is real and tested: schema handling for ``binary`` payload
columns with typed metadata, actor-pool ``map_batches`` stages with
small batch sizes (large rows!), and deterministic fake decoders so
the pipeline shape can be exercised end to end.

At scale: binary payloads dominate block size — callers should lower
``batch_size`` (e.g. 32-128) and/or raise
``DataContext.target_max_block_size`` so blocks aren't split absurdly
small; payloads stay in Arrow buffers (zero-copy) and never transit
pandas object dtype.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),
    ("mime", pa.string()),
    ("width", pa.int32()),          # typed metadata (nullable)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _decode_image_real(payload: bytes):  # pragma: no cover - env lacks libs
    """Real decoder entry point — intentionally unimplemented here.

    In a full deployment this would use PIL / libvips inside the actor
    (imported in ``__init__``); this container ships neither."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips, not present in this "
        "environment; use DeterministicFakeDecoder for plumbing tests")


class FeatureExtractor:
    """Actor-pool stage: payload bytes → fixed-size feature vector.

    ``fake=True`` (default here) derives a deterministic 16-dim
    feature from the payload digest — the real path would run a model
    loaded once in ``__init__``."""

    def __init__(self, dim: int = 16, fake: bool = True):
        if not fake:
            _decode_image_real(b"")  # fail fast: real models unavailable
        self.dim = dim

    def _features(self, payload: bytes) -> np.ndarray:
        """Deterministic fake feature: dim j =
        ``int(md5(hex(payload) + ':' + j)[:8], 16) % 1000 / 1000`` —
        chosen so the DuckDB oracle can recompute it in SQL
        (``('0x' || substr(md5(lower(hex(payload)) || ':' || j), 1, 8)
        )::BIGINT % 1000 / 1000.0``)."""
        hexp = (payload or b"").hex()
        return np.array(
            [int(hashlib.md5(f"{hexp}:{j}".encode()).hexdigest()[:8], 16)
             % 1000 / 1000.0 for j in range(self.dim)], dtype=np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p.as_py() if p is not None else b"")
                 for p in batch.column("payload")]
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())))


class FrameSampler:
    """Actor-pool stage: 'video' payload → n evenly-spaced fake frame
    digests (stands in for ffmpeg frame sampling; keeps the
    explode-by-frame output layout real)."""

    def __init__(self, n_frames: int = 4):
        self.n = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, digests = [], [], []
        for mid, kind, p in zip(batch.column("media_id").to_pylist(),
                                batch.column("kind").to_pylist(),
                                batch.column("payload")):
            if kind != "video":
                continue
            payload = p.as_py() if p is not None else b""
            hexp = payload.hex()
            for f in range(self.n):
                ids.append(mid)
                frame_idx.append(f)
                # hex-domain digest so the DuckDB oracle reproduces it:
                # md5(lower(hex(payload)) || ':' || frame_idx)
                digests.append(hashlib.md5(
                    f"{hexp}:{f}".encode()).hexdigest())
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_idx": pa.array(frame_idx, pa.int32()),
                         "frame_digest": pa.array(digests, pa.string())})


def synth_media_table(n: int, seed: int = 21,
                      plant_variants: bool = False) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests.

    The default preserves the original public contract (base rows
    only); the chunk-neardup oracle and its test opt in explicitly.

    ``plant_variants=True`` appends a RE-ENCODED SIBLING (media_id +
    2·10**6 — clear of the exact-dedup oracle's +10**6 union ids) for every video with ``media_id % 6 == 2``: same payload
    except the last 24 bytes are replaced with an md5-derived tail —
    the sibling therefore shares every full leading content chunk
    with its original, the planted ground truth the chunk-hash
    near-dup operator must recover. The tail derives from the
    payload digest (not the RNG), so the base rows are byte-identical
    with and without planting."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {k.name: [] for k in MEDIA_SCHEMA}
    variants = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(64 + int(rng.randint(0, 192)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.randint(16, 512)) if kind == "image" else None)
        rows["height"].append(int(rng.randint(16, 512)) if kind == "image" else None)
        rows["duration_ms"].append(int(rng.randint(1000, 60000))
                                   if kind != "image" else None)
        if plant_variants and kind == "video" and i % 6 == 2:
            tail = hashlib.md5(payload).digest() \
                + hashlib.md5(payload + b"x").digest()[:8]
            variants.append((i + 2 * 10**6, payload[:-24] + tail,
                             rows["duration_ms"][-1]))
    for mid, payload, dur in variants:
        rows["media_id"].append(mid)
        rows["kind"].append("video")
        rows["payload"].append(payload)
        rows["mime"].append("video/mp4")
        rows["width"].append(None)
        rows["height"].append(None)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def chunk_neardup(media, chunk_bytes: int = 32, min_shared: int = 2,
                  max_df: int = 16, n_buckets: int = 32):
    """Chunk-hash NEAR-dup over binary media content — the
    content-defined-storage dedup technique at fixed chunk width:
    payloads split into full ``chunk_bytes`` chunks, each chunk keyed
    by ``md5(chunk_hex)``; media pairs sharing ≥ ``min_shared``
    DISTINCT chunk digests are near-duplicates (a truncated or
    re-encoded-tail copy shares every leading chunk). Returns a
    STREAMING Dataset of (media_a, media_b, n_shared) rows,
    media_a < media_b, unordered — collection/ordering stays the
    caller's decision (the pair set of a heavily duplicated corpus
    is unbounded).

    Scale shape: per-batch flat-map emits (chunk-digest-hash,
    media_id) int64 rows — payload BYTES never leave the scan; the
    digest-bucket groupby builds the bounded inverted index (a digest
    held by more than ``max_df`` media is a STOP KEY and emits
    nothing — random content never collides, so stop keys only guard
    pathological inputs); per-digest pair expansion rides a pair-key
    exchange where the ≥ min_shared filter and the distinct count
    resolve. Mirrors the ER blocking operator's shape
    (stages/graph.copredicate_pairs)."""
    import pandas as pd

    B = np.int64(n_buckets)

    def _chunk_rows(t: pa.Table) -> "pd.DataFrame":
        ids, hs = [], []
        for mid, p in zip(t.column("media_id").to_pylist(),
                          t.column("payload")):
            payload = p.as_py() if p is not None else b""
            hexp = payload.hex()
            w = chunk_bytes * 2
            for c in range(len(hexp) // w):
                ids.append(mid)
                hs.append(int(hashlib.md5(
                    hexp[c * w:(c + 1) * w].encode())
                    .hexdigest()[:15], 16))
        out = pd.DataFrame({
            "h": pd.Series(hs, dtype="int64"),
            "mid": pd.Series(ids, dtype="int64")}).drop_duplicates()
        out["hb"] = out["h"] % B
        return out

    def _pairs(group: "pd.DataFrame") -> "pd.DataFrame":
        g = group.drop_duplicates(["h", "mid"])
        sizes = g.groupby("h")["mid"].transform("size")
        g = g[sizes <= max_df]
        if not len(g):
            return pd.DataFrame({
                "a": pd.Series([], dtype="int64"),
                "b": pd.Series([], dtype="int64"),
                "pb": pd.Series([], dtype="int64")})
        m = g.merge(g, on="h")
        m = m[m["mid_x"] < m["mid_y"]]
        out = pd.DataFrame({"a": m["mid_x"].astype("int64"),
                            "b": m["mid_y"].astype("int64")})
        out["pb"] = ((out["a"] * np.int64(1000003) + out["b"])
                     % B).astype("int64")
        return out

    def _count(group: "pd.DataFrame") -> "pd.DataFrame":
        out = (group.groupby(["a", "b"], as_index=False)
               .agg(n_shared=("a", "size")))
        out = out[out["n_shared"] >= min_shared]
        return out.astype({"a": "int64", "b": "int64",
                           "n_shared": "int64"})

    def _project(df: pd.DataFrame) -> pd.DataFrame:
        if "a" not in df.columns:  # schema-less empty block
            return pd.DataFrame({
                "media_a": pd.Series([], dtype="int64"),
                "media_b": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "media_a": df["a"].astype("int64"),
            "media_b": df["b"].astype("int64"),
            "n_shared": df["n_shared"].astype("int64")})

    # returns a STREAMING Dataset like the sibling media operators —
    # the pair set of a heavily duplicated corpus is result-sized but
    # unbounded, so collection stays the caller's decision (the old
    # tail pulled and pandas-sorted every pair on the driver)
    return (media.map_batches(_chunk_rows, batch_format="pyarrow",
                              batch_size=64)
            .groupby("hb").map_groups(_pairs, batch_format="pandas")
            .groupby("pb").map_groups(_count, batch_format="pandas")
            .map_batches(_project, batch_format="pandas"))


def media_exact_dedup(media, n_buckets: int = 32):
    """EXACT binary-content dedup over a media Dataset: one row per
    distinct payload with the minimum ``media_id`` (the keeper) and
    the duplicate count. Returns (ph, keep_id, n_dups).

    The content key is ``md5(lower(hex(payload)))`` — hex because
    DuckDB has no md5(BLOB) overload; lowercase to match Python's
    ``bytes.hex()``, the convention the other media oracles share. Scale shape mirrors
    docs_exact_dedup: the per-batch combiner collapses to one row per
    distinct content hash BEFORE the exchange, so payload bytes never
    shuffle — only (hash, min-id, count) rows ride the hash-bucket
    groupby, and the group-local merge is the global answer.
    """
    import pandas as pd
    import ray.data as rd

    def _partial(t: pa.Table) -> pa.Table:
        ids = t.column("media_id").cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        # NULL payloads group under a NULL key, matching the oracle's
        # md5(lower(hex(NULL))) = NULL (dropna=False keeps the group)
        ph = [None if p is None
              else hashlib.md5(p.hex().encode()).hexdigest()
              for p in t.column("payload").to_pylist()]
        g = (pd.DataFrame({"ph": ph, "media_id": ids})
             .groupby("ph", as_index=False, dropna=False)
             .agg(keep_id=("media_id", "min"),
                  n_dups=("media_id", "size")))
        g["pb"] = (pd.util.hash_pandas_object(g["ph"], index=False)
                   % n_buckets).astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("ph", as_index=False, dropna=False)
               .agg(keep_id=("keep_id", "min"),
                    n_dups=("n_dups", "sum")))
        return out.astype({"keep_id": "int64", "n_dups": "int64"})

    return (media.map_batches(_partial, batch_format="pyarrow")
            .groupby("pb").map_groups(_merge, batch_format="pandas"))
