"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched mapInPandas.

Image DIMENSIONS are decoded for REAL from PNG/JPEG headers
(``parse_image_header`` — pure-stdlib ``struct`` over the IHDR chunk /
SOFn marker, no image libraries needed); payloads that are not
parseable images fall back to a DETERMINISTIC FAKE (clearly marked
below) standing in for a full pixel decode, since PIL/ffmpeg are not in
this container.  Everything around the decode — the binary column
schema, the mapInPandas batch shape, partitioning, the frame-sampling
explode — is real and tested; productionizing pixel work means
replacing only ``_fake_decode``'s body.

Scale notes: payloads stay opaque binary end-to-end (no JVM<->Python
string conversion); mapInPandas streams Arrow record batches so peak
memory is one batch, not one partition; decode is map-only and scales
with input splits.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: output schema of the decode step
IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes int, format string, width int, height int, "
    "n_frames int"
)


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Model a multimodal table: binary payload column + typed metadata.
    (Real pipelines read payloads from object storage; here the payload is
    the utf-8 text bytes so tests are self-contained.)"""
    fmt = F.when(F.col(id_col) % 3 == 0, "png").when(
        F.col(id_col) % 3 == 1, "jpeg"
    ).otherwise("mp4")
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").cast("binary").alias("payload"),
        F.struct(
            fmt.alias("format"),
            F.length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL image header parse, pure stdlib ``struct`` — no image libs.

    PNG: the 8-byte signature, then the IHDR chunk's big-endian
    width/height (PNG spec: IHDR is always the first chunk, at a fixed
    offset).  JPEG: walk the marker stream from SOI, skipping fill
    bytes and parameterless markers, to the first frame header
    (SOF0–SOF15, excluding DHT/JPG/DAC which share the 0xC* range);
    its segment carries precision, then big-endian height and width.
    Returns (format, width, height), or None when the payload is not a
    parseable PNG/JPEG — the caller falls back to the deterministic
    stub, so text-byte payloads (the oracle fixtures) are untouched:
    0x89 and 0xFF can never begin valid UTF-8 text.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return ("png", w, h)
        return None
    if payload[:2] == b"\xff\xd8":
        i, n = 2, len(payload)
        while i + 3 < n:
            if payload[i] != 0xFF:
                return None
            marker = payload[i + 1]
            while marker == 0xFF and i + 2 < n:  # fill bytes
                i += 1
                marker = payload[i + 1]
            # parameterless markers: SOI, TEM, RSTn
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9 or i + 4 > n:  # EOI before any SOF
                return None
            seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None


def _fake_decode(payload: bytes, fmt: str) -> tuple[int, int, int]:
    """STUB — stands in for PIL.Image.open / av.open.  Deterministic
    pseudo-decode: dimensions and frame count derived from a sha256 of the
    payload.  Replace body with a real decoder to productionize; the
    signature (bytes, format) -> (width, height, n_frames) is the contract.
    """
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    n_frames = 1 if fmt in ("png", "jpeg") else 1 + d[2] % 120
    return width, height, n_frames


def decode_image_meta(with_payload: DataFrame) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batches).

    Input: columns (doc_id, payload, media_meta).  Output: IMAGE_META_SCHEMA.
    """

    def decode_one(payload: bytes, fmt: str) -> tuple[int, int, int]:
        real = parse_image_header(bytes(payload))
        if real is not None:
            return real[1], real[2], 1
        return _fake_decode(payload, fmt)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                decode_one(p, m["format"])
                for p, m in zip(pdf["payload"], pdf["media_meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "format": [m["format"] for m in pdf["media_meta"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "n_frames": [m[2] for m in metas],
                }
            )

    return with_payload.mapInPandas(batches, IMAGE_META_SCHEMA)


def sample_frames(meta: DataFrame, every_n: int = 30) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index (0, every_n, 2*every_n, ...).  Pure JVM explode — the decode of
    each sampled frame would be a second mapInPandas over (payload,
    frame_idx)."""
    return meta.filter(F.col("n_frames") > 1).select(
        "doc_id",
        "format",
        F.explode(
            F.sequence(
                F.lit(0), F.col("n_frames") - 1, F.lit(every_n)
            )
        ).alias("frame_idx"),
    )


def resize_meta(meta: DataFrame, max_side: int = 64) -> DataFrame:
    """'Resize' at the metadata level: compute the scaled dimensions the
    real resizer would produce (aspect-preserving fit into max_side).
    Pure column arithmetic; the pixel work belongs in the decode UDF."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return meta.withColumns(
        {
            "out_width": F.greatest(
                F.lit(1), F.floor(F.col("width") * scale).cast("int")
            ),
            "out_height": F.greatest(
                F.lit(1), F.floor(F.col("height") * scale).cast("int")
            ),
        }
    )


AUDIO_ENERGY_SCHEMA = (
    "doc_id bigint, n_windows int, peak_energy int, mean_energy double"
)


def parse_wav_header(
    payload: bytes,
) -> tuple[int, int, int, int, int] | None:
    """REAL RIFF/WAVE header parse, pure stdlib — no audio libraries.

    Walks the word-aligned chunk list for ``fmt `` (PCM format code,
    channels, sample rate, bits per sample) and ``data`` (the sample
    bytes).  Returns (sample_rate, channels, bits_per_sample,
    data_offset, data_len) for PCM files, else None — the caller falls
    back to the deterministic stub, so non-WAV payloads (the oracle's
    text fixtures, real mp4s) are untouched.
    """
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, fmt = 12, None
    while i + 8 <= len(payload):
        tag = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            audio_fmt, ch, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (audio_fmt, ch, sr, bits)
        elif tag == b"data":
            if fmt is None or fmt[0] != 1:  # PCM only
                return None
            return (fmt[2], fmt[1], fmt[3], i + 8, min(size, len(payload) - i - 8))
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    return None


def _wav_energies(payload: bytes, n_windows: int = 8) -> list[int] | None:
    """REAL per-window energies for PCM16 WAV payloads: the data chunk's
    little-endian int16 samples split into ``n_windows`` equal windows,
    each reduced to its integer mean square (sum(x^2) // n — exact
    integer arithmetic, engine- and platform-deterministic; 32767^2
    fits the int32 output column).  None when the payload is not
    PCM16 WAV — the stub handles it."""
    hdr = parse_wav_header(payload)
    if hdr is None or hdr[2] != 16:
        return None
    _, _, _, off, dlen = hdr
    n_samples = dlen // 2
    if n_samples < n_windows:
        return None
    samples = struct.unpack(f"<{n_samples}h", payload[off : off + 2 * n_samples])
    w = n_samples // n_windows
    out = []
    for k in range(n_windows):
        chunk = samples[k * w : (k + 1) * w] if k < n_windows - 1 else samples[k * w :]
        out.append(sum(x * x for x in chunk) // len(chunk))
    return out


def _fake_audio_energies(payload: bytes, n_windows: int = 8) -> list[int]:
    """STUB — stands in for an audio decode + per-window RMS (librosa /
    torchaudio aren't in this container).  Deterministic pseudo-energies:
    bytes 3..3+n of the payload's sha256.  Replace the body with a real
    decoder; the (bytes) -> [int energy per window] contract and all
    Spark-side plumbing stay as-is.
    """
    d = hashlib.sha256(payload).digest()
    return [d[3 + i] for i in range(n_windows)]


def audio_energy_stats(
    with_payload: DataFrame, n_windows: int = 8
) -> DataFrame:
    """Windowed audio energy via mapInPandas (Arrow batches): rows whose
    media format carries an audio track (mp4/wav here) decode to
    ``n_windows`` per-window energies, reduced to peak and mean.
    PCM16 WAV payloads decode for REAL (``_wav_energies`` — stdlib
    struct over the RIFF data chunk, exact integer mean squares);
    everything else falls back to the deterministic stub.

    Same scale shape as decode_image_meta: the Python stage is an
    Arrow-batched map over (payload) with a fixed output schema, no
    shuffle; the reduction happens inside the batch, so each input row
    yields exactly one output row regardless of window count.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                e = _wav_energies(b, n_windows)
                if e is None:
                    e = _fake_audio_energies(b, n_windows)
                rows.append(
                    (
                        doc_id,
                        n_windows,
                        max(e),
                        float(sum(e)) / n_windows,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_windows", "peak_energy", "mean_energy"],
            )

    audio = with_payload.filter(
        F.col("media_meta")["format"].isin("mp4", "wav")
    )
    return audio.select("doc_id", "payload").mapInPandas(
        batches, AUDIO_ENERGY_SCHEMA
    )
