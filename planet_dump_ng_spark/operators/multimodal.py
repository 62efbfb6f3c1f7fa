"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched mapInPandas.

The image/audio libraries are not available in this environment, so the
DECODE STEP IS A DETERMINISTIC FAKE (clearly marked below): it derives
pseudo-metadata from the payload bytes.  Everything around it — the
binary column schema, the mapInPandas batch shape, partitioning, the
frame-sampling explode — is real and tested; swapping in PIL/ffmpeg means
replacing only ``_fake_decode``'s body.

Scale notes: payloads stay opaque binary end-to-end (no JVM<->Python
string conversion); mapInPandas streams Arrow record batches so peak
memory is one batch, not one partition; decode is map-only and scales
with input splits.
"""

from __future__ import annotations

import hashlib
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

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [
                _fake_decode(p, m["format"])
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
    media format carries an audio track (the mp4 class here) decode to
    ``n_windows`` per-window energies, reduced to peak and mean.

    Same scale shape as decode_image_meta: the Python stage is an
    Arrow-batched map over (payload) with a fixed output schema, no
    shuffle; the reduction happens inside the batch, so each input row
    yields exactly one output row regardless of window count.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                e = _fake_audio_energies(bytes(payload), n_windows)
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

    audio = with_payload.filter(F.col("media_meta")["format"] == "mp4")
    return audio.select("doc_id", "payload").mapInPandas(
        batches, AUDIO_ENERGY_SCHEMA
    )
