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


def packed_varints(field: int, values) -> bytes:
    """Packed repeated varint field; empty -> omitted."""
    if not values:
        return b""
    body = b"".join(varint(v) for v in values)
    return field_bytes(field, body)


def packed_sint64s(field: int, values) -> bytes:
    if not values:
        return b""
    body = b"".join(varint(zigzag(v)) for v in values)
    return field_bytes(field, body)


def delta_encode(values) -> list[int]:
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
