"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is REAL for the dependency-free formats (binary PPM/PGM
images, PCM WAV audio — parsed here with numpy, no media libraries
needed) and refuses loudly for compressed formats (JPEG/PNG/MP4 need
codecs this container doesn't ship; deployments inject a decoder).
Everything Spark-side is real and tested either way: schemas, Arrow
batch shapes, ``mapInPandas`` signatures, and the partitioning contract
(binary payloads repartitioned so one Arrow batch stays under the
executor-memory budget).

At 100 TB the decode path dominates: it runs as ``mapInPandas`` (Arrow
batches, vectorized handoff), never per-row Python UDFs, and metadata-only
queries never touch the binary column (parquet column pruning does the
work — verified in tests via the read schema).
"""

from __future__ import annotations

import re
import struct
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T
from sarkac_spark.plans.audit import lazy_checkpoint

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha_prefix string, "
    "feature array<float>"
)


# Netpbm binary header: magic, then 2 (PGM) or 3 (PPM counts incl.
# maxval) whitespace-separated decimal fields, '#' comments allowed
# between tokens, one single whitespace byte before the raster.
_PNM_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*(\d+)")


def decode_pnm(raw: bytes) -> tuple[np.ndarray, int, int]:
    """Binary Netpbm decode, dependency-free: P6 (RGB) -> (h, w, 3)
    uint8 array, P5 (grayscale) -> (h, w, 1). Follows the published
    netpbm format spec (magic, '#' comments, single-whitespace raster
    delimiter, maxval<=255 one byte per sample)."""
    magic = raw[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM payload: magic={magic!r}")
    channels = 3 if magic == b"P6" else 1
    pos, fields = 2, []
    for _ in range(3):  # width, height, maxval
        m = _PNM_TOKEN.match(raw, pos)
        if not m:
            raise ValueError("truncated PNM header")
        fields.append(int(m.group(1)))
        pos = m.end()
    width, height, maxval = fields
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported PNM maxval {maxval} (1-byte samples only)")
    pos += 1  # the single whitespace byte after maxval
    n = width * height * channels
    raster = np.frombuffer(raw, dtype=np.uint8, count=n, offset=pos)
    return raster.reshape(height, width, channels), width, height


def decode_wav(raw: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV decode, dependency-free: -> (float64 samples in [-1, 1]
    averaged across channels, sample_rate). Follows the published RIFF/
    WAVE layout: chunk walk to 'fmt ' (PCM only, 8/16-bit) and 'data'."""
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, size = raw[pos : pos + 4], struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format={audio_format})")
    if bits == 16:
        samples = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:  # 8-bit WAV is unsigned, midpoint 128
        samples = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return samples, sample_rate


def default_decoder(payload: bytes, kind: str) -> list[float]:
    """Decode -> fixed-width feature step for the dependency-free
    formats, sniffed by magic bytes (the ``kind`` column is metadata,
    payloads are the ground truth):

    - binary PPM/PGM image -> [width, height, channels, mean, std]
      (pixel stats over 0-255 samples)
    - PCM WAV audio        -> [sample_rate, n_samples, duration_s,
      rms, peak]

    Compressed formats (JPEG/PNG/MP4...) still refuse loudly — they
    need codecs this container doesn't ship; real deployments inject a
    decoder (PIL/torchaudio/ffmpeg) with the same signature.
    """
    if payload[:2] in (b"P5", b"P6"):
        pixels, width, height = decode_pnm(payload)
        flat = pixels.astype(np.float64)
        return [
            float(width),
            float(height),
            float(pixels.shape[2]),
            round(float(flat.mean()), 6),
            round(float(flat.std()), 6),
        ]
    if payload[:4] == b"RIFF":
        samples, rate = decode_wav(payload)
        n = len(samples)
        return [
            float(rate),
            float(n),
            round(n / rate, 6) if rate else 0.0,
            round(float(np.sqrt(np.mean(samples**2))) if n else 0.0, 6),
            round(float(np.abs(samples).max()) if n else 0.0, 6),
        ]
    raise NotImplementedError(
        "no built-in codec for this payload (only binary PPM/PGM and PCM "
        "WAV decode dependency-free); inject decoder= for other formats"
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] = default_decoder,
    batch_rows: int = 256,
) -> DataFrame:
    """Binary -> feature vectors via mapInPandas (Arrow batches).

    ``batch_rows`` bounds how many payloads are decoded and accumulated
    per yielded output frame: each incoming Arrow batch is processed in
    slices of at most ``batch_rows`` rows, so the Python worker's
    working set is ~batch_rows * payload size regardless of how large a
    batch Arrow delivers. (Incoming batch size itself is governed by
    the session-wide ``spark.sql.execution.arrow.maxRecordsPerBatch`` —
    set it too for payloads in the tens of MB.)
    """
    step = max(1, int(batch_rows))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            for lo in range(0, len(pdf), step):
                chunk = pdf.iloc[lo : lo + step]
                feats, n_bytes, prefixes = [], [], []
                for payload, kind in zip(chunk["payload"], chunk["kind"]):
                    raw = bytes(payload) if payload is not None else b""
                    n_bytes.append(len(raw))
                    prefixes.append(hashlib.sha256(raw).hexdigest()[:16])
                    feats.append(decoder(raw, kind))
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": n_bytes,
                        "sha_prefix": prefixes,
                        "feature": feats,
                    }
                )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — must never read the payload column
    (column pruning; asserted in tests via the optimized plan)."""
    return media.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms"
    )


def payload_stats(media: DataFrame) -> DataFrame:
    """Byte-level stats without decoding: JVM-side only."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.lower(F.hex(F.substring("payload", 1, 8))).alias("head_hex"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sample timestamp
    (sequence+explode, JVM-side); the actual frame grab is the injected
    decoder's job. Shows the batch shape a real sampler would consume."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("sample_ms"),
    )


# --- perceptual-hash image dedup ---------------------------------------------

# dHash grid: GRID_ROWS x (GRID_COLS+1) block means, GRID_ROWS*GRID_COLS
# adjacent-pair comparisons = 64 bits, carried as DHASH_BANDS x 16-bit
# band values (never as one 64-bit integer: bit 63 two's-complement and
# BIGINT shift-overflow semantics differ across engines; band arrays
# are also exactly what LSH banding wants). Constants are engine
# contract, mirrored in the DuckDB oracle (queries/llm.py).
GRID_ROWS = 8
GRID_COLS = 8  # comparisons per row; the mean grid is GRID_ROWS x 9
DHASH_BANDS = 4
DHASH_BAND_BITS = (GRID_ROWS * GRID_COLS) // DHASH_BANDS  # 16


def dhash_bands_from_pixels(pixels: np.ndarray) -> list[int]:
    """The dHash kernel, shared by every path that hashes an image:
    (h, w) or (h, w, ch) integer array -> DHASH_BANDS 16-bit band
    values.

    Steps, all integer-exact so an arithmetic oracle can replay them:
    channels collapse by SUM (monotone in the mean — no division
    rounding); the image block-averages onto a GRID_ROWS x
    (GRID_COLS+1) grid with bin index ``i * bins // n`` (any size, no
    interpolation); each bit compares horizontally adjacent block means
    via cross-multiplied SUMS (left_sum * right_count <
    right_sum * left_count — again no division). Block averaging makes
    the hash invariant to integer upscaling and (absent clipping) to
    constant brightness shifts: both preserve every mean comparison.
    """
    px = pixels.astype(np.int64)
    if px.ndim == 3:
        px = px.sum(axis=2)
    h, w = px.shape
    rows = np.arange(h) * GRID_ROWS // h
    cols = np.arange(w) * (GRID_COLS + 1) // w
    # per-block pixel sums and counts via two bincount folds
    sums = np.zeros((GRID_ROWS, GRID_COLS + 1), dtype=np.int64)
    cnts = np.zeros((GRID_ROWS, GRID_COLS + 1), dtype=np.int64)
    np.add.at(sums, (rows[:, None], cols[None, :]), px)
    np.add.at(cnts, (rows[:, None], cols[None, :]), 1)
    left_s, right_s = sums[:, :-1], sums[:, 1:]
    left_n, right_n = cnts[:, :-1], cnts[:, 1:]
    bits = (left_s * right_n < right_s * left_n).astype(np.int64).ravel()
    return pack_band_values(bits)


def pack_band_values(bits: np.ndarray) -> list[int]:
    """64 comparison bits -> DHASH_BANDS 16-bit band values, the one
    packing shared by the image and audio kernels (bit k lands in band
    k // 16 at weight 2^(k % 16) — mirrored in the oracle SQL)."""
    return [
        int(
            (
                bits[b * DHASH_BAND_BITS : (b + 1) * DHASH_BAND_BITS]
                << np.arange(DHASH_BAND_BITS)
            ).sum()
        )
        for b in range(DHASH_BANDS)
    ]


def image_dhash(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    pixel_decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Per-image perceptual hash over the REAL decode path: PNM payload
    -> pixels (``decode_pnm``) -> ``dhash_bands_from_pixels``. Arrow
    ``mapInPandas`` like ``extract_features`` — the decode is the
    Python-side cost and it is batch-vectorized; everything downstream
    (banding, hamming) is JVM integer code. Output: (id,
    dhash_bands array<int>).

    ``pixel_decoder`` is the codec injection point for COMPRESSED
    formats (the ``default_decoder`` contract applied to the dedup
    path): ``bytes -> (h, w) or (h, w, ch) integer ndarray``. Default
    is the dependency-free binary-PNM decode; non-PNM payloads then
    refuse loudly. An injected decoder composes unchanged with
    ``dedup_phash`` because the hash kernel sees only pixels — pinned
    end-to-end by ``test_injected_codec_composes_with_dedup_phash``
    (zlib-wrapped PPM, no new dependency)."""
    decode = pixel_decoder or (lambda raw: decode_pnm(raw)[0])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                pixels = decode(bytes(payload))
                out.append(dhash_bands_from_pixels(np.asarray(pixels)))
            yield pd.DataFrame({id_col: pdf[id_col], "dhash_bands": out})

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, dhash_bands array<int>"
    )


def dedup_phash(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 6,
    max_band_df: int | None = None,
) -> DataFrame:
    """Image near-dup pairs from dHash band values: LSH banding on the
    DHASH_BANDS exact 16-bit chunks (pigeonhole: hamming <=
    DHASH_BANDS-1 GUARANTEES a shared band; beyond that recall decays
    like any banded LSH), candidates Hamming-verified JVM-side
    (zip_with XOR + bit_count over the band arrays — the full 64-bit
    distance, never a float). ``max_band_df`` is the hot-band fanout
    cap (the ``MINHASH_MAX_BAND_DF`` semantics — flat/black images all
    hash alike and would otherwise pair quadratically).

    Input: ``image_dhash`` output (or anything with ``dhash_bands``).
    Output: (id_a, id_b, hamming), id_a < id_b, hamming <= max_hamming.
    Scale shape: one explode (DHASH_BANDS rows/image), df-capped
    equi-join on the band key, verify only on candidates — the
    ``dedup_simhash`` plan over a mapInPandas-derived relation.
    """
    from sarkac_spark.operators.dedup import _df_cap

    # ``hashes`` is usually the output of a mapInPandas DECODE stage —
    # the dominant cost at scale (guide §4) — and this operator
    # references it three times (band explode, __ba side, __bb side)
    # under different downstream keys. Catalyst cannot reuse a subtree
    # across those prunings, so without a barrier the decode re-runs
    # per leg (measured r12: 16 MapInPandas invocations at runtime for
    # dedup_video). One lazy localCheckpoint runs the decode exactly
    # once; the materialized relation is just (id, band ints).
    hashes = hashes.transform(lazy_checkpoint)
    banded = hashes.select(
        F.col(id_col),
        F.posexplode("dhash_bands").alias("band_idx", "band_val"),
    ).select(
        F.col(id_col),
        F.concat_ws("|", F.col("band_idx"), F.col("band_val")).alias("band_key"),
    )
    banded = _df_cap(banded, "band_key", max_band_df)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(b, "band_key")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    ha = hashes.select(F.col(id_col).alias("id_a"), F.col("dhash_bands").alias("__ba"))
    hb = hashes.select(F.col(id_col).alias("id_b"), F.col("dhash_bands").alias("__bb"))
    # length-mismatched arrays (e.g. videos with different sampled-frame
    # counts): zip_with pads the shorter side with NULL — a missing band
    # counts as maximally distant (all 16 bits), NOT as a null that
    # would silently drop the pair at the <= filter.
    hamming = F.aggregate(
        F.zip_with(
            "__ba",
            "__bb",
            lambda x, y: F.coalesce(
                F.bit_count(x.bitwiseXOR(y)), F.lit(DHASH_BAND_BITS)
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cands.join(ha, "id_a")
        .join(hb, "id_b")
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --- audio fingerprint dedup --------------------------------------------------

# Audio analog of dHash: the decoded waveform bins onto AFP_FRAMES+1
# equal frames, per-frame ENERGY (sum of squared samples) replaces the
# block mean, and the 64 consecutive-frame comparisons pack into the
# same DHASH_BANDS x 16-bit band layout — so `dedup_phash` (banding +
# Hamming verify) pairs audio fingerprints unchanged. Sign-of-delta
# energies are invariant to global gain (energies scale by gain^2,
# comparisons survive any monotone scaling) and to integer resampling
# (sample duplication scales every equal-size frame alike).
AFP_FRAMES = GRID_ROWS * GRID_COLS  # 64 comparisons over 65 frames


def afp_bands_from_samples(samples: np.ndarray) -> list[int]:
    """Waveform -> DHASH_BANDS 16-bit audio-fingerprint band values.

    Exactness note (what makes an arithmetic oracle possible): for
    int16 PCM decoded by ``decode_wav`` (sample/32768), per-frame
    energies are sums of squares of dyadic rationals — exactly
    representable in doubles up to 2^53 — so energy comparisons equal
    the INTEGER comparisons on the raw sample squares whenever frames
    are equal-sized. Uneven frames compare via cross-multiplied counts.
    """
    s = np.asarray(samples, dtype=np.float64)
    n = len(s)
    bins = AFP_FRAMES + 1
    idx = np.arange(n) * bins // max(n, 1)
    sums = np.zeros(bins, dtype=np.float64)
    cnts = np.zeros(bins, dtype=np.int64)
    np.add.at(sums, idx, s * s)
    np.add.at(cnts, idx, 1)
    bits = (
        sums[:-1] * cnts[1:] < sums[1:] * cnts[:-1]
    ).astype(np.int64)
    return pack_band_values(bits)


def audio_fingerprint(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    sample_decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Per-clip audio fingerprint over the REAL decode path: PCM WAV ->
    samples (``decode_wav``) -> ``afp_bands_from_samples``. Arrow
    ``mapInPandas`` like ``image_dhash``; output (id, dhash_bands
    array<int>) — feed straight into ``dedup_phash`` for banded
    near-dup pairing.

    ``sample_decoder`` is the codec injection point for COMPRESSED
    audio (``image_dhash``'s ``pixel_decoder`` contract, audio flavor):
    ``bytes -> 1-D float sample array``. Default is the dependency-free
    PCM-WAV decode; non-WAV payloads then refuse loudly. An injected
    decoder composes unchanged with ``dedup_phash`` because the
    fingerprint kernel sees only samples — pinned by
    ``test_injected_audio_codec_composes_with_dedup_phash``."""
    decode = sample_decoder or (lambda raw: decode_wav(raw)[0])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                samples = np.asarray(decode(bytes(payload)))
                out.append(afp_bands_from_samples(samples))
            yield pd.DataFrame({id_col: pdf[id_col], "dhash_bands": out})

    return media.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, dhash_bands array<int>"
    )


def wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Minimal valid 16-bit mono PCM WAV container around ``samples``
    (int16 range) — the synthesis counterpart of ``decode_wav``, used
    by tests and the deterministic oracle corpora."""
    data = np.asarray(samples).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def video_fingerprint(
    frames: DataFrame,
    id_col: str = "media_id",
    frame_col: str = "frame_idx",
    payload_col: str = "payload",
    pixel_decoder: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """Video near-dup signature from SAMPLED FRAMES: each frame (a PNM
    payload, e.g. produced by the ``frame_sample_plan`` + injected
    grabber pipeline) hashes through the image dHash path, and the
    per-frame band values concatenate in frame order into one
    ``dhash_bands`` array per video (n_frames x DHASH_BANDS ints).
    ``dedup_phash`` pairs the result unchanged — its banding
    (posexplode keeps the position as the band index, so frame 0's
    bands never collide with frame 2's) and zip_with XOR Hamming are
    agnostic to array length; ``max_hamming`` then bounds the TOTAL
    bit distance across all sampled frames.

    Input: one row per (video, sampled frame); output: (id,
    dhash_bands). Scale shape: the frame relation is the scan unit
    (decode cost ∝ sampled frames, not video bytes), the per-video
    rollup is one grouped aggregation with frame-ordered assembly.

    ``pixel_decoder`` is the per-FRAME codec injection point (same
    contract as ``image_dhash``: ``bytes -> integer pixel ndarray``) —
    a real deployment injects its frame-grabber's output codec here;
    default is the dependency-free binary-PNM decode. Pinned by
    ``test_injected_video_codec_composes_with_dedup_phash``."""
    decode = pixel_decoder or (lambda raw: decode_pnm(raw)[0])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                pixels = np.asarray(decode(bytes(payload)))
                out.append(dhash_bands_from_pixels(pixels))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    frame_col: pdf[frame_col],
                    "frame_bands": out,
                }
            )

    per_frame = frames.select(id_col, frame_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, {frame_col} int, frame_bands array<int>"
    )
    return per_frame.groupBy(id_col).agg(
        F.flatten(
            F.array_sort(
                F.collect_list(F.struct(F.col(frame_col), F.col("frame_bands")))
            ).getField("frame_bands")
        ).alias("dhash_bands")
    )
