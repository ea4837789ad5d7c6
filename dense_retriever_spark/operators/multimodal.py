"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with typed metadata
(schemas.MULTIMODAL_SCHEMA). Decode / feature-extraction run as Arrow-batched
``mapInPandas`` so payload bytes stream executor-side in Arrow batches and
never hit the driver. The actual media decode is STUBBED (no image/audio libs
in this container — clearly marked below); the Spark-side plumbing (schema,
batch iteration, partitioning, output contract) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # real image decoding when the deployment has PIL; stub otherwise
    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:  # this container ships no media libs — documented stub
    _PILImage = None
    _HAS_PIL = False

FEATURE_SCHEMA = (
    "asset_id long, kind string, payload_sha string, n_bytes long, "
    "feat array<float>"
)


def synth_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets (stand-in for real media files).

    Every derived value is SQL-reproducible so the driver's DuckDB oracle can
    hash-verify the whole mapInPandas feature path (contract2.Q25_SQL):
    kind from an md5-derived integer hash (same construction as
    operators.dedup._hash60 — verified bit-equal to DuckDB's
    CAST('0x'||substr(md5(..),1,15) AS BIGINT)), payload = the UTF-8 bytes of
    a sha256 hex string truncated to a per-row length in [16, 64]."""
    kind_h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"k{seed}:"), F.col("id"))), 1, 15),
        16,
        10,
    ).cast("long")
    plen = (F.lit(16) + F.pmod(F.col("id"), F.lit(49))).cast("int")
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(kind_h, F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit(seed), F.col("id")), 256)
        .substr(F.lit(1), plen)
        .cast("binary")
        .alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df


def _decode_stub(payload: bytes, kind: str, dim: int) -> np.ndarray:
    """STUB: deterministic fake 'decoder'. A real deployment replaces this with
    PIL/torchaudio/ffmpeg frame sampling; everything around it (Arrow batch
    shape, schema, partitioning) is production-real.

    Raises NotImplementedError for kinds a real decoder wouldn't support."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: (asset_id, kind, payload_sha, n_bytes,
    feat ARRAY<FLOAT>). Arrow-batched; payloads never leave the executor."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p), k, dim).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "payload_sha": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "feat": feats,
                }
            )

    return assets.mapInPandas(fn, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "asset_id long, kind string, width int, height int, out_bytes long, "
    "resize_sha string"
)


def resize_images(
    assets: DataFrame,
    width: int = 64,
    height: int = 64,
    decoder: str = "stub",
) -> DataFrame:
    """mapInPandas image resize — 1:1 row shape, images only.

    The kind filter is a plain predicate BEFORE the UDF, so Catalyst pushes
    it to the scan and non-image payload bytes are never Arrow-transferred.

    ``decoder``:
    - ``"stub"`` (default): deterministic fake pixels — the output is the
      real resize metadata plus a content fingerprint
      resize_sha = sha256(payload_sha ':' WxH) the DuckDB oracle reproduces,
      so the full Arrow batch path is hash-verified even with no media libs
      in the container.
    - ``"pil"``: REAL decode+resize via PIL (import-guarded at module load);
      raises ImportError at call time if PIL is absent. resize_sha becomes
      the sha256 of the resized RGB pixel bytes.
    - ``"auto"``: pil when available, stub otherwise.
    """
    if decoder == "auto":
        decoder = "pil" if _HAS_PIL else "stub"
    if decoder not in ("pil", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if decoder == "pil" and not _HAS_PIL:
        raise ImportError("decoder='pil' requested but PIL is not installed")
    use_pil = decoder == "pil"

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            if use_pil:
                out_sha, out_bytes = [], []
                for p in pdf["payload"]:
                    img = _PILImage.open(io.BytesIO(bytes(p))).convert("RGB")
                    raw = img.resize((width, height)).tobytes()
                    out_sha.append(hashlib.sha256(raw).hexdigest())
                    out_bytes.append(len(raw))
            else:
                shas = [
                    hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                ]
                out_sha = [
                    hashlib.sha256(f"{s}:{width}x{height}".encode()).hexdigest()
                    for s in shas
                ]
                out_bytes = [width * height * 3] * len(pdf)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "out_bytes": out_bytes,
                    "resize_sha": out_sha,
                }
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(
        fn, schema=RESIZE_SCHEMA
    )


FRAME_SCHEMA = "asset_id long, frame_idx int, frame_sha string"


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """mapInPandas video frame sampling — 1:N row shape, videos only.

    Emits ``n_frames`` rows per video asset, the fan-out batch shape a real
    ffmpeg sampler produces (one output row per sampled frame; mapInPandas is
    the right operator because the output cardinality differs from the
    input's). Frame extraction is STUBBED: frame_sha =
    sha256(payload_sha ':' frame_idx), SQL-reproducible so the oracle
    verifies the fan-out exactly.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, shas = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                psha = hashlib.sha256(bytes(p)).hexdigest()
                for i in range(n_frames):
                    ids.append(aid)
                    idxs.append(i)
                    # --- STUB: real impl seeks to frame i and encodes it
                    shas.append(
                        hashlib.sha256(f"{psha}:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "frame_sha": shas}
            )

    return assets.filter(F.col("kind") == "video").mapInPandas(
        fn, schema=FRAME_SCHEMA
    )
