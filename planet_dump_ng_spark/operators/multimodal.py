"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched mapInPandas.

Image DIMENSIONS are decoded for REAL from PNG/JPEG headers
(``parse_image_header`` — pure-stdlib ``struct`` over the IHDR chunk /
SOFn marker, no image libraries needed), and video dimensions / frame
counts / duration from the MP4 container (``parse_mp4_header`` —
ISO-BMFF box walk to moov/trak/tkhd + stts); payloads that are not
parseable media fall back to a DETERMINISTIC FAKE (clearly marked
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
import zlib
from collections.abc import Iterator

import pandas as pd

from planet_dump_ng_spark.operators import compact_python_input
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
            # Implausible dims = unparseable: the PNG spec caps both at
            # 2^31-1, and the unsigned unpack would otherwise overflow
            # the int32 schema column — one crafted header in an
            # untrusted corpus must fall back to the stub, not fail the
            # whole Arrow batch.
            if not (0 < w < 2**31 and 0 < h < 2**31):
                return None
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
                if w == 0 or h == 0:  # dimensionless frame header
                    return None
                return ("jpeg", w, h)
            i += 2 + seg_len
        return None
    return None


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the ISO-BMFF boxes in
    ``buf[start:end]`` — the [size:4 BE][type:4] framing, with the
    64-bit largesize escape (size == 1) and the to-end-of-file form
    (size == 0).  Malformed sizes terminate the walk instead of
    raising: a truncated/crafted box reads as "no more boxes", so the
    caller falls back to the stub."""
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", buf[i : i + 4])[0]
        typ = buf[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > end:
                return
            size = struct.unpack(">Q", buf[i + 8 : i + 16])[0]
            body = i + 16
        elif size == 0:
            size = end - i
        if size < body - i or i + size > end:
            return
        yield typ, body, i + size
        i += size


def _mp4_find(buf: bytes, start: int, end: int, typ: bytes):
    """(body_start, body_end) of the first ``typ`` box in the range."""
    for t, b, e in _mp4_boxes(buf, start, end):
        if t == typ:
            return b, e
    return None


def parse_mp4_header(
    payload: bytes,
) -> tuple[int, int, int, int] | None:
    """REAL ISO-BMFF (MP4) container parse, pure stdlib ``struct`` — no
    media libraries.  Walks ``moov`` for the movie header (``mvhd``:
    timescale + duration -> integer milliseconds) and the first VIDEO
    track (``trak`` whose ``tkhd`` carries nonzero 16.16-fixed
    width/height), then that track's sample table (``mdia/minf/stbl/
    stts``) for the exact frame count (sum of the time-to-sample entry
    counts).  Returns (width, height, n_frames, duration_ms), or None
    when the payload is not a parseable MP4 — the caller falls back to
    the deterministic stub, so text-byte payloads (the oracle
    fixtures) are untouched: they would need an ``ftyp`` box at offset
    4 with a plausible size to get past the gate.  Both tkhd versions
    are handled (v0: 32-bit times, width at body offset 76; v1: 64-bit
    times, offset 88); dims outside (0, 2^31) are treated as
    unparseable, matching ``parse_image_header``'s overflow guard.
    """
    n = len(payload)
    if n < 16 or payload[4:8] != b"ftyp":
        return None
    moov = _mp4_find(payload, 0, n, b"moov")
    if moov is None:
        return None
    duration_ms = 0
    mvhd = _mp4_find(payload, moov[0], moov[1], b"mvhd")
    if mvhd is not None and mvhd[1] - mvhd[0] >= 4:
        ver = payload[mvhd[0]]
        try:
            if ver == 1:
                ts, dur = struct.unpack(
                    ">IQ", payload[mvhd[0] + 20 : mvhd[0] + 32]
                )
            else:
                ts, dur = struct.unpack(
                    ">II", payload[mvhd[0] + 12 : mvhd[0] + 20]
                )
            if ts > 0:
                duration_ms = dur * 1000 // ts
        except struct.error:
            pass
    for t, b, e in _mp4_boxes(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        tkhd = _mp4_find(payload, b, e, b"tkhd")
        if tkhd is None or tkhd[1] - tkhd[0] < 4:
            continue
        woff = tkhd[0] + (88 if payload[tkhd[0]] == 1 else 76)
        if woff + 8 > tkhd[1]:
            continue
        w16, h16 = struct.unpack(">II", payload[woff : woff + 8])
        w, h = w16 >> 16, h16 >> 16  # 16.16 fixed-point, integer part
        if not (0 < w < 2**31 and 0 < h < 2**31):
            continue  # audio/hint tracks carry zero dims — keep looking
        n_frames = 1
        mdia = _mp4_find(payload, b, e, b"mdia")
        if mdia is not None:
            minf = _mp4_find(payload, mdia[0], mdia[1], b"minf")
            if minf is not None:
                stbl = _mp4_find(payload, minf[0], minf[1], b"stbl")
                if stbl is not None:
                    stts = _mp4_find(payload, stbl[0], stbl[1], b"stts")
                    if stts is not None and stts[1] - stts[0] >= 8:
                        n_entries = struct.unpack(
                            ">I", payload[stts[0] + 4 : stts[0] + 8]
                        )[0]
                        total = 0
                        for j in range(n_entries):
                            off = stts[0] + 8 + 8 * j
                            if off + 8 > stts[1]:
                                break
                            total += struct.unpack(
                                ">I", payload[off : off + 4]
                            )[0]
                        # same int32-schema guard as the dimensions: a
                        # crafted uint32 sample_count must not overflow
                        # the 'n_frames int' column and fail the batch
                        if 0 < total < 2**31:
                            n_frames = total
        return (w, h, n_frames, duration_ms)
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
        b = bytes(payload)
        real = parse_image_header(b)
        if real is not None:
            return real[1], real[2], 1
        mp4 = parse_mp4_header(b)
        if mp4 is not None:
            return mp4[0], mp4[1], mp4[2]
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

    # collapse empty scan splits: every Arrow task pays a Python
    # worker round-trip (operators.compact_python_input)
    return compact_python_input(with_payload).mapInPandas(
        batches, IMAGE_META_SCHEMA
    )


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
    little-endian int16 samples split into ``n_windows`` windows of
    ``n_samples // n_windows`` samples each, the LAST window absorbing
    the ``n_samples % n_windows`` remainder; each window reduces to its
    integer mean square (sum(x^2) // len — exact integer arithmetic,
    engine- and platform-deterministic; 32767^2 fits the int32 output
    column).  None when the payload is not PCM16 WAV — the stub
    handles it."""
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
    return compact_python_input(
        audio.select("doc_id", "payload")
    ).mapInPandas(batches, AUDIO_ENERGY_SCHEMA)


# -- perceptual image near-dup (dHash) -----------------------------------------


def _png_luma_rows(payload: bytes) -> tuple[int, int, list[list[int]]] | None:
    """REAL PNG pixel decode, pure stdlib (zlib inflate + per-scanline
    unfilter) — no image libraries.  Returns (width, height, rows of
    per-pixel luma 0..255), or None when the payload is not a PNG this
    decoder covers (bit depth 8, color types 0/2/3/4/6, no interlace)
    — the caller falls back to the deterministic stub, the
    parse_image_header discipline.

    Luma is the integer BT.601 approximation (299R+587G+114B)//1000 —
    exact integer arithmetic, so the fingerprint is bit-stable across
    platforms.
    """
    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, n = 8, len(payload)
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    plte: list[tuple[int, int, int]] = []
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            return None  # truncated chunk
        if ctype == b"IHDR":
            if clen < 13:
                return None
            width, height = struct.unpack(">II", body[:8])
            bit_depth, color_type = body[8], body[9]
            interlace = body[12]
        elif ctype == b"PLTE":
            plte = [
                (body[i], body[i + 1], body[i + 2])
                for i in range(0, len(body) - 2, 3)
            ]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + body + crc
    if (
        width is None
        or not (0 < width < 2**31 and 0 < height < 2**31)
        or bit_depth != 8
        or color_type not in (0, 2, 3, 4, 6)
        or interlace != 0
        or not idat
    ):
        return None
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = width * channels
    if len(raw) < height * (stride + 1):
        return None
    rows: list[list[int]] = []
    prev = bytearray(stride)
    offset = 0
    for _y in range(height):
        ftype = raw[offset]
        line = bytearray(raw[offset + 1 : offset + 1 + stride])
        offset += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            return None  # invalid filter byte
        prev = line
        if color_type == 0:
            lum = list(line)
        elif color_type == 4:
            lum = [line[i] for i in range(0, stride, 2)]
        elif color_type == 3:
            if not plte:
                return None
            lum = []
            for idx in line:
                if idx >= len(plte):
                    return None
                r, g, b = plte[idx]
                lum.append((299 * r + 587 * g + 114 * b) // 1000)
        else:  # 2 (RGB) or 6 (RGBA)
            lum = [
                (
                    299 * line[i]
                    + 587 * line[i + 1]
                    + 114 * line[i + 2]
                )
                // 1000
                for i in range(0, stride, channels)
            ]
        rows.append(lum)
    return width, height, rows


def png_dhash(payload: bytes) -> int | None:
    """REAL perceptual fingerprint: 64-bit difference hash (dHash) over
    the decoded PNG pixels — 9x8 integer box-mean luma grid, one bit
    per horizontal gradient (cell brighter than its right neighbour).
    Near-identical images (recompression, metadata edits, mild
    re-encodes) land within a few Hamming bits of each other, which is
    the property the banded Hamming join exploits.  Returns a SIGNED
    64-bit int (Spark LongType two's complement), or None when the
    payload is not a decodable PNG of at least 9x8 pixels.
    """
    decoded = _png_luma_rows(payload)
    if decoded is None:
        return None
    width, height, rows = decoded
    if width < 9 or height < 8:
        return None
    grid: list[list[int]] = []
    for r in range(8):
        y0, y1 = r * height // 8, (r + 1) * height // 8
        row: list[int] = []
        for c in range(9):
            x0, x1 = c * width // 9, (c + 1) * width // 9
            tot = 0
            for y in range(y0, y1):
                lr = rows[y]
                for x in range(x0, x1):
                    tot += lr[x]
            row.append(tot // ((y1 - y0) * (x1 - x0)))
        grid.append(row)
    out = 0
    for r in range(8):
        for c in range(8):
            out = (out << 1) | (1 if grid[r][c] > grid[r][c + 1] else 0)
    return out - (1 << 64) if out >= (1 << 63) else out


def _fake_dhash(payload: bytes) -> int:
    """STUB — stands in for png_dhash on payloads the pure-stdlib
    decoder does not cover (non-PNG formats, exotic PNG variants).
    Deterministic: the first 8 bytes of sha256(payload), big-endian,
    folded to signed 64-bit — so exact payload copies still collide at
    Hamming 0 and the oracle fixtures (text-byte payloads) replay it
    in SQL via DuckDB's sha256.  Replace with a real JPEG/video-frame
    decoder to productionize; the signature bytes -> signed int64 is
    the contract."""
    h = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big")
    return h - (1 << 64) if h >= (1 << 63) else h


#: output schema of the fingerprint step
IMAGE_DHASH_SCHEMA = "doc_id bigint, dhash bigint"


def image_dhash(with_payload: DataFrame) -> DataFrame:
    """Perceptual fingerprints for the image-modality rows via
    mapInPandas (Arrow batches): real dHash where the payload is a
    decodable PNG, deterministic stub otherwise.  Map-only — one
    output row per image row, payloads never leave the executor."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for payload in pdf["payload"]:
                b = bytes(payload)
                h = png_dhash(b)
                hashes.append(_fake_dhash(b) if h is None else h)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "dhash": hashes})

    imgs = with_payload.filter(
        F.col("media_meta")["format"].isin("png", "jpeg")
    )
    return compact_python_input(
        imgs.select("doc_id", "payload")
    ).mapInPandas(batches, IMAGE_DHASH_SCHEMA)


def dhash_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup image pairs by dHash Hamming distance: band the 64-bit
    fingerprint into four 16-bit bands, equi-join on (band, value),
    verify with the exact popcount — the simhash_pairs shape with a
    pigeonhole GUARANTEE: two hashes within Hamming distance 3 differ
    in at most 3 of the 4 bands, so they MUST agree on at least one;
    recall at ``max_hamming <= 3`` is exact, not probabilistic.  Band
    values are uniform for non-dup images, so the join keys don't
    skew; candidate collisions verify away at the popcount.  Returns
    distinct ``(id_a, id_b, hamming)`` with id_a < id_b."""
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned("dhash", 16 * i)
            .bitwiseAND(F.lit(65535))
            .alias("bv"),
        )
        for i in range(4)
    ]
    b = hashes.select(
        F.col("doc_id").alias("id"),
        "dhash",
        F.explode(F.array(*bands)).alias("bb"),
    ).select("id", "dhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    a, c = b.alias("a"), b.alias("b")
    hamming = F.bit_count(F.expr("a.dhash ^ b.dhash"))
    return (
        a.join(
            c,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def synth_png(variant: int, width: int = 24, height: int = 16) -> bytes:
    """Deterministic tiny RGB PNG (bit depth 8, filter-0 scanlines,
    one zlib IDAT) — the fixture generator that lets distributed
    queries and tests exercise the REAL decode path
    (:func:`png_dhash`) on bytes that are a pure function of
    ``variant``: same variant => byte-identical PNG => identical
    fingerprint, different variants => different gradients.  Pure
    stdlib, so the expected fingerprints can be precomputed driver- or
    oracle-side without Spark."""

    def chunk(typ: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + typ
            + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)  # filter type: None
        for x in range(width):
            raw += bytes(
                (
                    (16 * x + 11 * variant) % 256,
                    (8 * y + 23 * variant) % 256,
                    (x * y + 5 * variant) % 256,
                )
            )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
