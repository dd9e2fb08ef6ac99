"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, Arrow batch shapes, partitioning, UDF
signatures) is real and tested; the codec step is STUBBED — this container
has no image/audio libraries, so `decode` produces a deterministic fake
derived from the bytes (or raises NotImplementedError in strict mode). On a
real cluster you swap `_decode_image_stub` for PIL/libvips/ffmpeg calls —
the dataflow does not change.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, media bytes, width int, height int, "
    "duration_ms int, mime string"
)

FEATURES_SCHEMA = (
    "media_id string, kind string, feature array<float>, feat_norm double, "
    "decoder string"
)

FRAME_SCHEMA = "media_id string, frame_idx int, ts_ms int, frame_hash string"

STRICT = False  # set True to surface NotImplementedError instead of the fake


def _decode_image_stub(data: bytes, out_dim: int = 16) -> np.ndarray:
    """STUB decoder: deterministic pseudo-features from a hash of the bytes
    (used when no codec library exists, e.g. this container)."""
    if STRICT:
        raise NotImplementedError("image codec not available in this container")
    digest = hashlib.sha256(data or b"").digest()
    raw = np.frombuffer((digest * ((out_dim * 4) // len(digest) + 1))[: out_dim * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def _decode_image_pil(data: bytes, out_dim: int = 16) -> np.ndarray:
    """Real codec path: PIL grayscale thumbnail -> normalized pixel
    features. Only selected when PIL imports (a real cluster); undecodable
    bytes fall back to the stub features for that row so a corrupt blob
    never kills the batch."""
    import io

    from PIL import Image

    try:
        img = Image.open(io.BytesIO(data or b"")).convert("L").resize(
            (out_dim, 1))
        return np.asarray(img, dtype=np.float32).reshape(-1) / 255.0
    except Exception:
        return _decode_image_stub(data, out_dim)


_DECODERS = {"stub": _decode_image_stub, "pil": _decode_image_pil}


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def resolve_decoder(name: str | None = None):
    """(identity, fn): the requested decoder by name, or — in auto mode —
    PIL when importable, else the deterministic stub. Resolution happens
    driver-side so the recorded identity is uniform across the job; a
    cluster swaps in the real codec with zero code change just by having
    PIL installed."""
    if name is None:
        name = "pil" if _pil_available() else "stub"
    return name, _DECODERS[name]


def extract_media_features(media: DataFrame, out_dim: int = 16,
                           decoder: str | None = None) -> DataFrame:
    """binary -> feature vector, one Arrow batch at a time (the real-cluster
    shape: batch-decode, batch-embed). `decoder` pins a codec ("stub" keeps
    the output bit-deterministic for oracles); None auto-selects the real
    codec when its library is importable. The output's `decoder` column
    records which one produced each row, so downstream consumers can tell
    real features from stand-ins."""
    dec_name, dec_fn = resolve_decoder(decoder)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                dec_fn(m if m is not None else b"", out_dim)
                for m in pdf["media"]
            ]
            norms = [float(np.linalg.norm(f)) for f in feats]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "feature": [f.tolist() for f in feats],
                "feat_norm": norms,
                "decoder": dec_name,
            })

    return media.select("media_id", "kind", "media").mapInPandas(fn, FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video -> frame records at a fixed sampling interval. The decode is
    stubbed (frame_hash derives from (bytes, ts)); the row-explosion shape —
    one input row to N frame rows per batch — is the real pipeline shape."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, dur in zip(pdf["media_id"], pdf["media"], pdf["duration_ms"]):
                dur = int(dur or 0)
                for i, ts in enumerate(range(0, max(dur, 1), every_ms)):
                    h = hashlib.sha256((data or b"") + ts.to_bytes(8, "little")).hexdigest()[:16]
                    rows.append((mid, i, ts, h))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame_hash"])

    return media.filter(F.col("kind") == "video").select(
        "media_id", "media", "duration_ms"
    ).mapInPandas(fn, FRAME_SCHEMA)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from `media_ref` spans: the opaque
    binary is a hash-expansion of the ref (stand-in for fetched bytes)."""
    refs = (
        documents.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media_ref")
        .select(F.col("s.media_ref").alias("media_id"))
        .distinct()
    )
    return refs.select(
        "media_id",
        F.when(F.col("media_id").rlike(r"\.(mp4|webm)($|\?)"), "video")
        .when(F.col("media_id").rlike(r"\.(mp3|wav|ogg)($|\?)"), "audio")
        .otherwise("image").alias("kind"),
        F.sha2(F.col("media_id"), 256).cast("binary").alias("media"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.pmod(F.xxhash64("media_id"), F.lit(10000)) + 1000).cast("int").alias("duration_ms"),
        F.lit("application/octet-stream").alias("mime"),
    )


# ------------------------------------------------------- media-span dedup


def dedup_media_spans(spans: DataFrame, min_refs: int = 2) -> DataFrame:
    """Cross-document exact dedup of media references (the LAION/DataComp
    image-dedup step, keyed on URL/content hash): one row per media_ref
    occurring >= `min_refs` times —

      (media_ref, n_refs, n_docs, keeper_doc_id, keeper_offset)

    where the keeper is the lexicographically first (doc_id, offset)
    occurrence, so the canonical copy is reshuffle-stable. Input is a flat
    span table (doc_id, kind, text, media_ref, offset).

    Scale shape (100-TB lens): ONE groupBy on media_ref — a uniform hash
    key (refs are URLs/content hashes) with map-side partial aggregation,
    so a site-logo ref appearing in 10^8 documents combines inside each
    map task; the struct-min keeper is an aggregate, not a window, so no
    hot ref ever buffers its occurrence list in one task.
    """
    media = spans.filter(F.col("kind") == "media_ref")
    return (
        media.groupBy("media_ref")
        .agg(
            F.count("*").alias("n_refs"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "offset")).alias("_k"),
        )
        .filter(F.col("n_refs") >= int(min_refs))
        .select(
            "media_ref", "n_refs", "n_docs",
            F.col("_k.doc_id").alias("keeper_doc_id"),
            F.col("_k.offset").alias("keeper_offset"),
        )
    )


def drop_dup_media(spans: DataFrame) -> DataFrame:
    """The corpus transform behind `dedup_media_spans`: remove every
    media span that is NOT its ref's keeper occurrence; text spans pass
    through untouched. Row schema is preserved.

    Shape: keeper table (one row per duplicated ref) joins the media
    spans on media_ref — uniform key, AQE skew-join splits a pathological
    hot ref; the text partition never shuffles.
    """
    keep = dedup_media_spans(spans, min_refs=2).select(
        "media_ref",
        F.col("keeper_doc_id").alias("_kd"),
        F.col("keeper_offset").alias("_ko"),
    )
    media = (
        spans.filter(F.col("kind") == "media_ref")
        .join(keep, "media_ref", "left")
        .filter(
            F.col("_kd").isNull()
            | ((F.col("doc_id") == F.col("_kd"))
               & (F.col("offset") == F.col("_ko"))))
        .drop("_kd", "_ko")
        .select(*spans.columns)
    )
    return spans.filter(F.col("kind") != "media_ref").unionByName(media)
