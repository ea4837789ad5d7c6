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


# ---------------------------------------------------------------------------
# Pure-numpy PPM (P6) codec — REAL pixel decode with zero media libraries.
# The PIL branch below is import-guarded and can never execute in a container
# without PIL (round-3 verdict); PPM is trivially parseable, so the
# decode→resize→hash path runs on REAL pixels here and in CI, not just in
# deployments that ship PIL.
# ---------------------------------------------------------------------------


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6, maxval 255). The fixture-side twin
    of decode_ppm; also what a real pipeline uses to re-emit normalized
    frames without an image library."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) uint8, got shape {img.shape}")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → (h, w, 3) uint8. Handles the full header grammar:
    '#' comments and arbitrary whitespace between tokens; maxval must be
    ≤ 255 (16-bit PPMs are rejected, not misread)."""
    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM (P6 magic missing)")
    pos, tokens = 2, []
    while len(tokens) < 3:
        if pos >= len(payload):
            raise ValueError("truncated PPM header")
        c = payload[pos : pos + 1]
        if c == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            tokens.append(int(payload[start:pos]))
    pos += 1  # exactly ONE whitespace byte separates maxval from raster
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError(f"16-bit PPM (maxval={maxval}) not supported")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError(f"PPM raster truncated: {len(raster)} < {need}")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (index map floor(i*src/dst)) —
    the library-free resize kernel used by decoder='ppm'."""
    src_h, src_w = img.shape[:2]
    rows = (np.arange(height) * src_h) // height
    cols = (np.arange(width) * src_w) // width
    return img[rows[:, None], cols[None, :]]


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


PPM_ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)


def synth_ppm_assets(
    spark: SparkSession, n: int, width: int = 8, height: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Deterministic REAL image assets: each payload is a valid binary PPM
    (P6) with per-asset-seeded pixels. Unlike synth_assets' opaque blobs,
    these decode to actual rasters — the fixture for the decoder='ppm' path.
    Generated in mapInPandas so payload bytes materialize executor-side."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for aid in pdf["id"]:
                rng = np.random.default_rng(seed * 1_000_003 + int(aid))
                img = rng.integers(
                    0, 256, size=(height, width, 3), dtype=np.int64
                ).astype(np.uint8)
                payloads.append(encode_ppm(img))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/x-portable-pixmap",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                }
            )

    return spark.range(n).mapInPandas(fn, schema=PPM_ASSET_SCHEMA)


def synth_gradient_ppm_assets(
    spark: SparkSession, n: int, width: int = 6, height: int = 8,
    seed: int = 7,
) -> DataFrame:
    """REAL PPM images whose pixels are SQL-reproducible: each ROW of image
    ``asset_id`` is the solid 3-byte color ``md5('ppm{seed}:{id}:{row}')
    [:6 hex chars]``. A nearest-neighbor resize of such an image is fully
    reconstructible in plain SQL (pick rows by the floor-index map, repeat
    the row color out_width times) — the construction behind the q55 oracle,
    which puts actual pixel decoding under the driver's hash gate."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for aid in pdf["id"]:
                rows = [
                    np.frombuffer(
                        bytes.fromhex(
                            hashlib.md5(
                                f"ppm{seed}:{int(aid)}:{r}".encode()
                            ).hexdigest()[:6]
                        ),
                        dtype=np.uint8,
                    )
                    for r in range(height)
                ]
                img = np.stack(
                    [np.tile(c, (width, 1)) for c in rows]
                )  # (h, w, 3)
                payloads.append(encode_ppm(img))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["id"],
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/x-portable-pixmap",
                    "width": width,
                    "height": height,
                    "duration_ms": None,
                }
            )

    return spark.range(n).mapInPandas(fn, schema=PPM_ASSET_SCHEMA)


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
    fingerprint: str = "raw",
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
    - ``"ppm"``: REAL decode+resize with NO media library — payloads are
      binary PPM (P6), decoded by the pure-numpy decode_ppm and resized by
      the deterministic nearest-neighbor kernel. resize_sha is the sha256 of
      the resized RGB pixel bytes, exactly like the pil path — this is the
      branch that makes real pixel decode testable in containers without
      PIL (synth_ppm_assets generates oracle-checkable inputs).
    - ``"auto"``: pil when available, stub otherwise.

    ``fingerprint``: ``"raw"`` hashes the resized RGB raster bytes;
    ``"hex"`` hashes its LOWERCASE-HEX string instead — the
    cross-engine-verifiable form (the oracle engine's sha256 only accepts
    VARCHAR, q55). Applies to the real decoders (pil/ppm).
    """
    if decoder == "auto":
        decoder = "pil" if _HAS_PIL else "stub"
    if decoder not in ("pil", "ppm", "stub"):
        raise ValueError(f"unknown decoder {decoder!r}")
    if fingerprint not in ("raw", "hex"):
        raise ValueError(f"unknown fingerprint {fingerprint!r}")
    if decoder == "pil" and not _HAS_PIL:
        raise ImportError("decoder='pil' requested but PIL is not installed")

    def _sha(raw: bytes) -> str:
        data = raw.hex().encode("ascii") if fingerprint == "hex" else raw
        return hashlib.sha256(data).hexdigest()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            if decoder == "pil":
                out_sha, out_bytes = [], []
                for p in pdf["payload"]:
                    img = _PILImage.open(io.BytesIO(bytes(p))).convert("RGB")
                    raw = img.resize((width, height)).tobytes()
                    out_sha.append(_sha(raw))
                    out_bytes.append(len(raw))
            elif decoder == "ppm":
                out_sha, out_bytes = [], []
                for p in pdf["payload"]:
                    raw = resize_nearest(
                        decode_ppm(bytes(p)), width, height
                    ).tobytes()
                    out_sha.append(_sha(raw))
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
