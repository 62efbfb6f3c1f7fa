"""Minimal protobuf wire-format encoder/decoder (no protobuf dependency).

Implements just what the OSMPBF container format needs — varint, zigzag,
length-delimited fields, packed repeated scalars — from the public
Protocol Buffers encoding spec.  Used by the PBF sink (encode) and the
PBF reader used in tests (decode).

Wire types: 0 = varint, 1 = 64-bit, 2 = length-delimited, 5 = 32-bit.
"""

from __future__ import annotations


def varint(n: int) -> bytes:
    """Unsigned LEB128."""
    if n < 0:
        n &= (1 << 64) - 1  # two's-complement 64-bit, per proto spec
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else ((-n) << 1) - 1


def unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def tag(field: int, wire_type: int) -> bytes:
    return varint((field << 3) | wire_type)


def field_varint(field: int, value: int) -> bytes:
    return tag(field, 0) + varint(value)


def field_bytes(field: int, data: bytes) -> bytes:
    return tag(field, 2) + varint(len(data)) + data


def field_string(field: int, s: str) -> bytes:
    return field_bytes(field, s.encode("utf-8"))


#: below this many values the per-call numpy overhead beats the win;
#: above it the vectorized LEB128 is ~20-50x the per-value Python loop
_NP_MIN = 64


def _leb128_np(values):
    """Vectorized unsigned-LEB128 core: -> (concatenated bytes, per-value
    byte counts ndarray).  Negatives take the 64-bit two's-complement
    form, same as :func:`varint` — the int64->uint64 view IS that
    mapping.  Each of the up-to-10 LEB128 byte positions is computed for
    the whole array at once; a row-major boolean take flattens only the
    bytes each value actually uses, preserving per-value order."""
    import numpy as np

    a = np.asarray(values, dtype=np.int64).view(np.uint64)
    n = len(a)
    out = np.zeros((n, 10), dtype=np.uint8)
    used = np.zeros((n, 10), dtype=bool)
    v = a.copy()
    pending = np.ones(n, dtype=bool)  # value still emitting bytes
    for i in range(10):
        byte = (v & np.uint64(0x7F)).astype(np.uint8)
        v >>= np.uint64(7)
        more = v != 0
        out[:, i] = byte | (np.where(more, 0x80, 0)).astype(np.uint8)
        used[:, i] = pending
        pending = pending & more
        if not pending.any():
            break
    return out[used].tobytes(), used.sum(axis=1)


def _varints_np(values) -> bytes:
    """Vectorized unsigned-LEB128 of an int sequence -> concatenated
    bytes, BYTE-IDENTICAL to ``b"".join(varint(v) for v in values)``
    (pinned by test_round5 against the scalar path on random inputs)."""
    return _leb128_np(values)[0]


def varints_np_each(values) -> list[bytes]:
    """Vectorized LEB128 with per-VALUE slicing: one bytes object per
    input, each byte-identical to ``varint(v)``.  The piecewise form the
    columnar way/relation encoders assemble per-element messages from —
    the varint arithmetic runs over the whole block at once, only the
    final message concatenation stays per-element."""
    import numpy as np

    n = len(values)
    if n == 0:
        return []
    flat, counts = _leb128_np(values)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    return [flat[offs[i]: offs[i + 1]] for i in range(n)]


def _slice_segments(field: int, flat: bytes, counts, lens, starts) -> list[bytes]:
    """Cut one LEB128 byte stream into per-segment packed fields."""
    import numpy as np

    voffs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=voffs[1:])
    head = tag(field, 2)
    out: list[bytes] = []
    for s in range(len(lens)):
        if lens[s] == 0:
            out.append(b"")
            continue
        body = flat[voffs[starts[s]]: voffs[starts[s] + lens[s]]]
        out.append(head + varint(len(body)) + body)
    return out


def _seg_starts(lens):
    import numpy as np

    starts = np.zeros(len(lens), dtype=np.int64)
    if len(lens) > 1:
        np.cumsum(lens[:-1], out=starts[1:])
    return starts


def packed_sint64s_segmented(
    field: int, flat_values, seg_lengths
) -> list[bytes]:
    """Per-SEGMENT packed sint64 field over a flattened value array:
    byte-identical to ``[packed_sint64s(field, delta_encode(seg)) for
    seg in segments]`` (empty segments -> b"", matching packed_*'s
    empty-field elision), with the delta restarting at every segment
    boundary — the per-way refs / per-relation memids wire shape.  One
    vectorized delta+zigzag+LEB128 pass over every segment's values at
    once; per-segment work is two offset lookups and one slice."""
    import numpy as np

    lens = np.asarray(seg_lengths, dtype=np.int64)
    a = np.asarray(flat_values, dtype=np.int64)
    starts = _seg_starts(lens)
    d = np.empty_like(a)
    if len(a):
        d[0] = a[0]
        np.subtract(a[1:], a[:-1], out=d[1:])
        nz = starts[lens > 0]
        d[nz] = a[nz]  # delta restarts on each segment's first value
    flat, counts = _leb128_np(_zigzag_np(d))
    return _slice_segments(field, flat, counts, lens, starts)


def packed_varints_segmented(
    field: int, flat_values, seg_lengths
) -> list[bytes]:
    """Per-SEGMENT packed plain-varint field (no zigzag, no delta):
    byte-identical to ``[packed_varints(field, seg) for seg in
    segments]`` with the same empty-segment elision — the per-relation
    member-types wire shape."""
    import numpy as np

    lens = np.asarray(seg_lengths, dtype=np.int64)
    flat, counts = _leb128_np(flat_values)
    return _slice_segments(field, flat, counts, lens, _seg_starts(lens))


def _zigzag_np(values):
    """Vectorized :func:`zigzag` -> uint64 array (same (n<<1)^(n>>63)
    arithmetic-shift formula, which the scalar form's negative branch
    equals)."""
    import numpy as np

    a = np.asarray(values, dtype=np.int64)
    return ((a << 1) ^ (a >> 63)).view(np.uint64).view(np.int64)


def packed_varints(field: int, values) -> bytes:
    """Packed repeated varint field; empty -> omitted."""
    if len(values) == 0:
        return b""
    if len(values) >= _NP_MIN:
        body = _varints_np(values)
    else:
        body = b"".join(varint(v) for v in values)
    return field_bytes(field, body)


def packed_sint64s(field: int, values) -> bytes:
    if len(values) == 0:
        return b""
    if len(values) >= _NP_MIN:
        body = _varints_np(_zigzag_np(values))
    else:
        body = b"".join(varint(zigzag(v)) for v in values)
    return field_bytes(field, body)


def delta_encode(values) -> list[int]:
    """Running-difference encode.  Contract: inputs are int64 quantities
    whose pairwise differences also fit in int64 (true of every OSM
    column — ids, nano-degree coords, epoch times, string indexes); a
    difference outside int64 could not be represented as the wire
    format's sint64 anyway."""
    if len(values) >= _NP_MIN:
        import numpy as np

        a = np.asarray(values, dtype=np.int64)
        d = np.empty_like(a)
        d[0] = a[0]
        np.subtract(a[1:], a[:-1], out=d[1:])
        return d.tolist()  # python ints: small-array callers re-iterate
    out = []
    prev = 0
    for v in values:
        out.append(v - prev)
        prev = v
    return out


# -- decoding (tests / verification path) ------------------------------------


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a message's fields.
    value is int for varint/fixed, bytes for length-delimited."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            val, pos = read_varint(buf, pos)
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            val = int.from_bytes(buf[pos : pos + 4], "little")
            pos += 4
        elif wt == 1:
            val = int.from_bytes(buf[pos : pos + 8], "little")
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


def unpack_varints(data: bytes) -> list[int]:
    out = []
    pos = 0
    while pos < len(data):
        v, pos = read_varint(data, pos)
        out.append(v)
    return out


def unpack_sint64s(data: bytes) -> list[int]:
    return [unzigzag(v) for v in unpack_varints(data)]


def delta_decode(values) -> list[int]:
    out = []
    acc = 0
    for v in values:
        acc += v
        out.append(acc)
    return out
