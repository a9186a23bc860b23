"""Multimodal (image/audio/video) column operators for training-data pipelines.

Media are opaque ``binary`` columns plus a typed metadata struct — the
storage-and-shuffle design that works at 100 TB (bytes stay columnar in
parquet/Arrow, metadata prunes without touching payloads):

    media(media_id long, kind string, content binary,
          meta struct<width int, height int, channels int,
                      sample_rate int, duration_ms int, codec string>)

Every operator is ``mapInPandas`` over Arrow batches — the payload never
crosses a Python row boundary one cell at a time. REAL here: schemas,
batch shapes, partitioning, vectorized numpy kernels (resize, histogram
features, frame-offset arithmetic). STUBBED here: actual codec work.
``decode_image`` tries Pillow and, when the library is absent (this
container has none), falls back to a clearly-marked deterministic fake
that reinterprets the raw bytes as a row-major grayscale image of the
metadata's dimensions — so the plumbing is testable end-to-end and swaps
to a real codec by replacing ONE function.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "width int, height int, channels int, sample_rate int, duration_ms int, codec string"
)
MEDIA_SCHEMA = f"media_id long, kind string, content binary, meta struct<{MEDIA_META_SCHEMA}>"


def _decode_image_real(content: bytes) -> np.ndarray:
    from io import BytesIO

    from PIL import Image  # pragma: no cover - not installed in this container

    return np.asarray(Image.open(BytesIO(content)).convert("L"), dtype=np.uint8)


def decode_image(content: bytes, width: int, height: int) -> np.ndarray:
    """Grayscale pixel matrix (height × width, uint8).

    STUB FALLBACK: without Pillow, the payload is reinterpreted as raw
    row-major grayscale bytes (truncated/zero-padded to fit). Deterministic
    by construction — tests and oracles rely on that.
    """
    try:
        return _decode_image_real(content)
    except ImportError:
        n = width * height
        buf = np.frombuffer(content[:n], dtype=np.uint8)
        if len(buf) < n:
            buf = np.pad(buf, (0, n - len(buf)))
        return buf.reshape(height, width)


def decode_images(media: DataFrame) -> DataFrame:
    """media → (media_id, width, height, pixels array<int>) for images."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                w, h = int(r.meta["width"]), int(r.meta["height"])
                px = decode_image(bytes(r.content), w, h)
                out.append((r.media_id, w, h, px.reshape(-1).astype("int32")))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "pixels"])

    return media.filter("kind = 'image'").mapInPandas(
        _decode, "media_id long, width int, height int, pixels array<int>"
    )


def resize_images(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel arrays (vectorized numpy)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = np.asarray(r.pixels, dtype=np.int32).reshape(r.height, r.width)
                ys = (np.arange(out_h) * r.height // out_h).clip(0, r.height - 1)
                xs = (np.arange(out_w) * r.width // out_w).clip(0, r.width - 1)
                res = px[np.ix_(ys, xs)]
                out.append((r.media_id, out_w, out_h, res.reshape(-1)))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "pixels"])

    return decoded.mapInPandas(
        _resize, "media_id long, width int, height int, pixels array<int>"
    )


def image_features(decoded: DataFrame, bins: int = 16) -> DataFrame:
    """Normalized intensity histogram per image → embedding-ready vector.

    Feeds directly into operators.similarity (cosine top-k / near-dup on
    the feature column) — media dedup is the same plan as text dedup.
    """

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = np.asarray(r.pixels, dtype=np.int32)
                hist, _ = np.histogram(px, bins=bins, range=(0, 256))
                total = max(len(px), 1)
                out.append((r.media_id, (hist / total).astype("float64")))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return decoded.mapInPandas(_feat, "media_id long, features array<double>")


def image_feature_pipeline(media: DataFrame, bins: int = 16) -> DataFrame:
    """Fused decode → histogram in ONE Arrow pass.

    The composable form (:func:`decode_images` → :func:`image_features`)
    ships the full pixel matrix back through Arrow between stages; when
    only features are needed, fusing the two kernels halves the Python
    round-trips — the mapInPandas equivalent of operator fusion.
    """

    def _decode_feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                w, h = int(r.meta["width"]), int(r.meta["height"])
                px = decode_image(bytes(r.content), w, h)
                hist, _ = np.histogram(px, bins=bins, range=(0, 256))
                out.append((r.media_id, (hist / max(px.size, 1)).astype("float64")))
            yield pd.DataFrame(out, columns=["media_id", "features"])

    return media.filter("kind = 'image'").mapInPandas(
        _decode_feat, "media_id long, features array<double>"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled timestamp.

    Frame extraction itself is codec work (STUB: fixed-size byte slice per
    frame index — deterministic); the offset arithmetic, fan-out shape and
    schema are the real thing. At scale this is the explode that turns a
    video table into a frame table, so it partitions by media_id
    downstream.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                dur = int(r.meta["duration_ms"] or 0)
                content = bytes(r.content)
                n_frames = max(dur // every_ms, 0)
                frame_bytes = max(len(content) // max(n_frames, 1), 1)
                for i in range(n_frames):
                    ts = i * every_ms
                    chunk = content[i * frame_bytes : (i + 1) * frame_bytes]
                    out.append((r.media_id, i, ts, chunk))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    return media.filter("kind = 'video'").mapInPandas(
        _sample, "media_id long, frame_idx int, ts_ms int, frame binary"
    )


def audio_window_energy(media: DataFrame, window_ms: int = 250) -> DataFrame:
    """Per-window RMS energy over (fake-)PCM audio payloads.

    Treats the payload as unsigned 8-bit PCM at ``meta.sample_rate`` (the
    decode stub; a real decoder swaps in transparently) and emits one row
    per window — the audio twin of :func:`sample_frames`.
    """

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                sr = int(r.meta["sample_rate"] or 8000)
                pcm = np.frombuffer(bytes(r.content), dtype=np.uint8).astype("float64")
                pcm = (pcm - 128.0) / 128.0
                spw = max(sr * window_ms // 1000, 1)
                n_win = len(pcm) // spw
                for i in range(n_win):
                    seg = pcm[i * spw : (i + 1) * spw]
                    out.append((r.media_id, i, float(np.sqrt(np.mean(seg**2)))))
            yield pd.DataFrame(out, columns=["media_id", "window_idx", "rms"])

    return media.filter("kind = 'audio'").mapInPandas(
        _energy, "media_id long, window_idx int, rms double"
    )


def audio_fingerprint_pairs(
    media: DataFrame,
    window_ms: int = 25,
    q_levels: int = 16,
    ngram: int = 4,
    min_shared: int = 3,
    max_df: int = 100,
) -> DataFrame:
    """Audio near-dup via acoustic fingerprinting (public
    envelope-hashing idea, Shazam-style reduced to energy): per-window
    RMS (:func:`audio_window_energy`) quantized to ``q_levels`` buckets,
    then ``ngram`` consecutive buckets hash into one fingerprint — two
    recordings sharing ≥ ``min_shared`` fingerprints are near-dup
    candidates, scored by distinct-fingerprint containment.

    Reuses the postings machinery of :func:`frame_dedup_pairs` (hot cut,
    pair join, containment), so the shuffle carries 16-byte hashes only.
    The per-media envelope array is bounded by media duration (windows =
    duration/window_ms), which bounds the ``collect_list``; quantization
    rides the 6-dp-rounded RMS so the fingerprints are cross-engine
    reproducible.
    """
    from pyspark.sql import functions as F

    en = audio_window_energy(media, window_ms=window_ms)
    seq = en.select(
        "media_id",
        "window_idx",
        F.floor(F.round(F.col("rms"), 6) * q_levels).cast("int").alias("q"),
    )
    arr = seq.groupBy("media_id").agg(
        F.array_sort(F.collect_list(F.struct("window_idx", "q"))).alias("s")
    )
    qarr = F.transform(F.col("s"), lambda x: x["q"].cast("string"))
    m = F.greatest(F.size(qarr) - F.lit(ngram - 1), F.lit(0))
    acc = F.slice(qarr, 1, m)
    for j in range(2, ngram + 1):
        acc = F.zip_with(acc, F.slice(qarr, j, m), lambda a, b: F.concat_ws(",", a, b))
    fps = arr.select("media_id", F.explode(acc).alias("fp"))
    return frame_dedup_pairs(
        fps, frame_col="fp", min_shared=min_shared, max_df=max_df
    )


def frame_dedup_pairs(
    frames: DataFrame,
    id_col: str = "media_id",
    frame_col: str = "frame",
    min_shared: int = 2,
    max_df: int = 100,
) -> DataFrame:
    """Content-defined media dedup: videos sharing ≥ ``min_shared``
    identical frames are near-dup candidates, scored by containment
    ``|A∩B| / min(|A|,|B|)`` over DISTINCT frame hashes.

    The media twin of the shingle-posting text dedup: hash every frame
    once (md5 of the raw bytes), join postings on the 16-byte hash — the
    shuffle never carries frame payloads. ``max_df`` drops frames shared
    by more than that many videos BEFORE the pair join: the "black
    frame" guard — a blank/intro frame common to thousands of videos
    would otherwise explode the postings join quadratically (same role
    as the shingle df-cap, same O(max_df²) bound per frame).
    """
    from pyspark.sql import functions as F

    # fh feeds FOUR consumers (sizes, hot cut, both join sides); without
    # sharing, each consumer re-runs the Arrow frame-sampling kernel —
    # the expensive Python stage — once per branch. persist() the subtree
    # for the duration of ONE eager materialization of the (tiny) pairs
    # result, then unpersist in the finally: no pinned cache entry
    # outlives the call, and the checkpoint write is the pair list, not
    # the full frame-hash postings (the r7 eager-checkpoint-of-fh form
    # paid a full postings write per invocation — BENCH r7 regression).
    fh = (
        frames.select(F.col(id_col).alias("mid"), F.md5(F.col(frame_col)).alias("fh"))
        .distinct()
        .persist()
    )
    try:
        sizes = fh.groupBy("mid").agg(F.count("*").alias("n_frames"))
        hot = fh.groupBy("fh").agg(F.count("*").alias("df")).filter(F.col("df") > max_df)
        cold = fh.join(hot, "fh", "left_anti")
        a = cold.select(F.col("mid").alias("id_a"), "fh")
        b = cold.select(F.col("mid").alias("id_b"), "fh")
        shared = (
            a.join(b, "fh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("shared"))
            .filter(F.col("shared") >= min_shared)
        )
        sa = sizes.select(F.col("mid").alias("id_a"), F.col("n_frames").alias("na"))
        sb = sizes.select(F.col("mid").alias("id_b"), F.col("n_frames").alias("nb"))
        out = (
            shared.join(sa, "id_a")
            .join(sb, "id_b")
            .select(
                "id_a",
                "id_b",
                F.col("shared").cast("int").alias("shared"),
                F.round(
                    F.col("shared").cast("double") / F.least("na", "nb"), 6
                ).alias("containment"),
            )
        )
        # eager: runs the whole DAG once while fh is pinned; the returned
        # frame reads the checkpointed pair list (a few rows per media id)
        return out.localCheckpoint(eager=True)
    finally:
        fh.unpersist()


def image_ahash_bands(decoded: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash over decoded grayscale pixels, emitted as
    four 16-bit band values (row-major grid order): nearest-neighbor
    sample the pixel matrix onto a ``grid×grid`` lattice, threshold each
    sample against the lattice mean (integer form ``grid²·pix > Σpix`` —
    no division), pack bits 16 at a time.

    Banded output is the LSH-ready form: two images within Hamming
    distance 3 of each other MUST share at least one identical band
    (pigeonhole over 4 bands), so near-dup candidate generation is a
    band-bucket equi-join — never an all-pairs scan. Same shape as the
    SimHash text bands (`operators.dedup.simhash_pairs`, cited there) and
    the classic pHash/ahash family (public imagehash semantics).
    """
    n_bits = grid * grid
    n_bands = n_bits // 16

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                px = np.asarray(r.pixels, dtype=np.int64).reshape(r.height, r.width)
                ys = (np.arange(grid) * r.height // grid).clip(0, r.height - 1)
                xs = (np.arange(grid) * r.width // grid).clip(0, r.width - 1)
                sub = px[np.ix_(ys, xs)].reshape(-1)
                total = int(sub.sum())
                bits = (sub * n_bits > total).astype(np.int64)
                bands = [
                    int((bits[16 * b : 16 * b + 16] << np.arange(16)).sum())
                    for b in range(n_bands)
                ]
                out.append((r.media_id, bands))
            yield pd.DataFrame(out, columns=["media_id", "bands"])

    return decoded.mapInPandas(_hash, "media_id long, bands array<long>")


def scene_segments(frames: DataFrame, levels: int = 16) -> DataFrame:
    """Scene segmentation over sampled frames: quantize each frame to a
    coarse visual level (decode stub: the first payload byte bucketed to
    ``levels`` — a real build swaps in a perceptual frame feature), cut
    a boundary wherever consecutive frames change level, and report the
    per-video scene census (count, longest run, exact mean length in
    ppm). The shot-boundary-detection shape (public formulation:
    threshold-on-frame-difference, e.g. PySceneDetect's content
    detector) reduced to windows: after the Arrow frame fan-out
    everything is JVM-side — one exchange on media_id shared by the lag
    boundary, the running scene id and both aggregations."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("media_id").orderBy("frame_idx")
    lvl = (F.ascii(F.col("frame").cast("string")) / (256 // levels)).cast("int")
    b = frames.select(
        "media_id",
        "frame_idx",
        lvl.alias("lvl"),
    ).select(
        "media_id",
        "frame_idx",
        F.when(
            F.lag("lvl").over(w).isNull() | (F.col("lvl") != F.lag("lvl").over(w)), 1
        )
        .otherwise(0)
        .alias("boundary"),
    )
    scenes = b.select(
        "media_id",
        F.sum("boundary")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("scene_id"),
    )
    per_scene = scenes.groupBy("media_id", "scene_id").agg(F.count("*").alias("len"))
    return per_scene.groupBy("media_id").agg(
        F.sum("len").alias("n_frames"),
        F.count("*").alias("n_scenes"),
        F.max("len").alias("longest_scene"),
        F.expr("sum(len) * 1000000 div count(*)").alias("mean_scene_len_ppm"),
    )
