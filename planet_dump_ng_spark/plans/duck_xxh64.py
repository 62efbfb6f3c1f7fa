"""Spark-compatible xxhash64 as a single inline DuckDB SQL expression.

Spark's ``xxhash64`` (seed 42) is XXH64 over a value's UTF-8 bytes
(common/unsafe XXH64.java): 32-byte stripes over the 8-byte-aligned
prefix, + total length, remaining 8-byte words, one optional 4-byte word,
tail bytes, final avalanche.  Replicating it in DuckDB makes MinHash+LSH
banding — whose shingle hashes are ``pmod(xxhash64(s), P)`` — fully
SQL-expressible, so the driver's correctness gate can hash-compare the
LSH dedup query instead of falling back to a rows-only check.

The driver executes oracle SQL as ONE statement, so no ``CREATE MACRO``
is available: :func:`xxh64_inline` composes the whole algorithm into a
single (large, ~15 KB) expression.  Building blocks:

- HUGEINT arithmetic in [0, 2^64): multiplication splits the left
  operand into 32-bit halves so intermediates stay under 2^96 (HUGEINT
  overflows at 2^127); xor hops through UBIGINT (DuckDB's ``xor``);
  rotl(x, r) = (x * 2^r) % 2^64 + x // 2^(64-r) — the shifted-out high
  bits land exactly in the vacated low bits, so the terms never overlap.
- "let" bindings use single-element ``list_transform``
  (``list_transform([x], v -> e)[1]``), evaluating each stage once and
  keeping the expansion linear instead of exponential.
- variable-length loops are ``list_reduce`` folds; DuckDB's fold carries
  no separate init value, so the init is ``list_prepend``-ed and stripe
  elements are padded to the accumulator's 4-lane list shape.

Verified byte-exact against Spark over lengths 0..65, multi-byte UTF-8,
and every tail-length class by tools/xxh64_dev.py.
"""

from __future__ import annotations

from collections.abc import Callable

# XXH64 primes, 2^64, and seed-42 derived lane initializers.
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261
_M = 18446744073709551616  # 2^64
_MS = f"{_M}::HUGEINT"
_V1 = (42 + _P1 + _P2) % _M
_V2 = (42 + _P2) % _M
_V3 = 42
_V4 = (42 - _P1) % _M
_H0 = (42 + _P5) % _M  # init when the aligned prefix has no stripes


class _Gen:
    """Expression builder with a local name counter (deterministic text).

    ``prefix`` namespaces every generated lambda variable so independently
    generated expressions can nest without capture."""

    def __init__(self, prefix: str = "x") -> None:
        self.n = 0
        self.prefix = prefix

    def let(self, val: str, body: Callable[[str], str]) -> str:
        v = self.var("v")
        return f"list_transform([{val}], {v} -> {body(v)})[1]"

    def var(self, tag: str = "l") -> str:
        self.n += 1
        return f"{self.prefix}{tag}{self.n}"


def _mul(a: str, b: str) -> str:
    """(a*b) mod 2^64; a, b must be cheap (names or constants)."""
    return (
        f"((({a} % 4294967296::HUGEINT) * {b}"
        f" + ((({a} // 4294967296::HUGEINT) * {b}) % 4294967296::HUGEINT)"
        f" * 4294967296::HUGEINT) % {_MS})"
    )


def _rot(x: str, r: int) -> str:
    """rotl64; x must be cheap."""
    return f"(({x} * {1 << r}::HUGEINT) % {_MS} + {x} // {1 << (64 - r)}::HUGEINT)"


def _xor(a: str, b: str) -> str:
    return f"CAST(xor(CAST({a} AS UBIGINT), CAST({b} AS UBIGINT)) AS HUGEINT)"


def _w8(g: _Gen, bs: str, off: str) -> str:
    """Little-endian 64-bit word of byte-list ``bs`` at 1-based offset."""
    return g.let(
        f"CAST({off} AS BIGINT)",
        lambda p: f"({bs}[{p}] + {bs}[{p}+1] * 256::HUGEINT"
        f" + {bs}[{p}+2] * 65536::HUGEINT + {bs}[{p}+3] * 16777216::HUGEINT"
        f" + {bs}[{p}+4] * 4294967296::HUGEINT"
        f" + {bs}[{p}+5] * 1099511627776::HUGEINT"
        f" + {bs}[{p}+6] * 281474976710656::HUGEINT"
        f" + {bs}[{p}+7] * 72057594037927936::HUGEINT)",
    )


def _w4(g: _Gen, bs: str, off: str) -> str:
    return g.let(
        f"CAST({off} AS BIGINT)",
        lambda p: f"({bs}[{p}] + {bs}[{p}+1] * 256::HUGEINT"
        f" + {bs}[{p}+2] * 65536::HUGEINT + {bs}[{p}+3] * 16777216::HUGEINT)",
    )


def _vrd(g: _Gen, v: str, w: str) -> str:
    """Stripe lane: rotl(v + w*P2, 31) * P1."""
    return g.let(
        f"(({v} + {_mul(w, f'{_P2}::HUGEINT')}) % {_MS})",
        lambda u: g.let(_rot(u, 31), lambda r: _mul(r, f"{_P1}::HUGEINT")),
    )


def _mrg(g: _Gen, h: str, v: str) -> str:
    """Stripe merge: (h ^ rotl(v*P2,31)*P1) * P1 + P4."""
    return g.let(
        _mul(v, f"{_P2}::HUGEINT"),
        lambda a: g.let(
            _rot(a, 31),
            lambda b: g.let(
                _mul(b, f"{_P1}::HUGEINT"),
                lambda c: g.let(
                    _xor(h, c),
                    lambda d: f"(({_mul(d, f'{_P1}::HUGEINT')} + {_P4}::HUGEINT) % {_MS})",
                ),
            ),
        ),
    )


def _wrd(g: _Gen, h: str, w: str) -> str:
    """Trailing word: rotl(h ^ rotl(w*P2,31)*P1, 27) * P1 + P4."""
    return g.let(
        _mul(w, f"{_P2}::HUGEINT"),
        lambda a: g.let(
            _rot(a, 31),
            lambda b: g.let(
                _mul(b, f"{_P1}::HUGEINT"),
                lambda c: g.let(
                    _xor(h, c),
                    lambda d: g.let(
                        _rot(d, 27),
                        lambda e: f"(({_mul(e, f'{_P1}::HUGEINT')} + {_P4}::HUGEINT) % {_MS})",
                    ),
                ),
            ),
        ),
    )


def _b1(g: _Gen, h: str, b: str) -> str:
    """Tail byte: rotl(h ^ b*P5, 11) * P1."""
    return g.let(
        _mul(b, f"{_P5}::HUGEINT"),
        lambda a: g.let(
            _xor(h, a),
            lambda c: g.let(_rot(c, 11), lambda d: _mul(d, f"{_P1}::HUGEINT")),
        ),
    )


def _fmix_signed(g: _Gen, h: str) -> str:
    """Avalanche, then reinterpret [0, 2^64) as Spark's signed BIGINT."""
    return g.let(
        _mul(_xor(h, f"{h} // 8589934592::HUGEINT"), f"{_P2}::HUGEINT"),
        lambda h1: g.let(
            _mul(_xor(h1, f"{h1} // 536870912::HUGEINT"), f"{_P3}::HUGEINT"),
            lambda h2: g.let(
                _xor(h2, f"{h2} // 4294967296::HUGEINT"),
                lambda h3: f"CAST(CASE WHEN {h3} >= 9223372036854775808::HUGEINT"
                f" THEN {h3} - {_MS} ELSE {h3} END AS BIGINT)",
            ),
        ),
    )


def xxh64_inline(s_expr: str, prefix: str = "x") -> str:
    """Inline DuckDB expression equal to Spark's ``F.xxhash64(s_expr)``."""
    g = _Gen(prefix)

    def with_bytes(s: str) -> str:
        i = g.var("i")
        bytes_expr = g.let(
            f"hex(encode({s}))",
            lambda hx: (
                f"list_transform(range(1, CAST(length({hx}) // 2 AS BIGINT) + 1),"
                f" {i} -> CAST("
                f"strpos('0123456789ABCDEF', substr({hx}, 2 * {i} - 1, 1)) * 16"
                f" + strpos('0123456789ABCDEF', substr({hx}, 2 * {i}, 1)) - 17"
                " AS HUGEINT))"
            ),
        )
        return g.let(bytes_expr, lambda bs: g.let(
            f"CAST(len({bs}) AS HUGEINT)", lambda n: g.let(
                f"({n} - {n} % 8)", lambda na: _aligned(bs, n, na))))

    def _aligned(bs: str, n: str, na: str) -> str:
        # 32-byte stripes over the aligned prefix (when na >= 32), + total
        # length, then the leftover aligned 8-byte words.
        vs0 = (
            f"[{_V1}::HUGEINT, {_V2}::HUGEINT, {_V3}::HUGEINT, {_V4}::HUGEINT]"
        )
        si = g.var("s")
        stripe_list = (
            f"list_transform(range(0, CAST({na} // 32 AS BIGINT)),"
            f" {si} -> [CAST(32 * {si} AS HUGEINT),"
            " 0::HUGEINT, 0::HUGEINT, 0::HUGEINT])"
        )
        va, vb = g.var("a"), g.var("b")
        # the stripe word is let-bound before the lane update (it is
        # referenced 4x inside the expansion otherwise)
        stripe_fold = (
            f"list_reduce(list_prepend({vs0}, {stripe_list}), ({va}, {vb}) -> ["
            + ", ".join(
                _vrd(g, f"{va}[{i + 1}]", _w8(g, bs, f"{vb}[1] + {8 * i + 1}"))
                for i in range(4)
            )
            + "])"
        )
        merged = g.let(
            stripe_fold,
            lambda vs: g.let(
                f"(({_rot(f'{vs}[1]', 1)} + {_rot(f'{vs}[2]', 7)}"
                f" + {_rot(f'{vs}[3]', 12)} + {_rot(f'{vs}[4]', 18)}) % {_MS})",
                lambda h0: g.let(
                    _mrg(g, h0, f"{vs}[1]"),
                    lambda h1: g.let(
                        _mrg(g, h1, f"{vs}[2]"),
                        lambda h2: g.let(
                            _mrg(g, h2, f"{vs}[3]"),
                            lambda h3: _mrg(g, h3, f"{vs}[4]"),
                        ),
                    ),
                ),
            ),
        )
        hw = (
            f"((CASE WHEN {na} >= 32 THEN {merged} ELSE {_H0}::HUGEINT END"
            f" + {n}) % {_MS})"
        )
        return g.let(hw, lambda h: _words(bs, n, na, h))

    def _words(bs: str, n: str, na: str, hw: str) -> str:
        wa, wb, wi = g.var("a"), g.var("b"), g.var("w")
        word_list = (
            f"list_transform(range("
            f"CAST(CASE WHEN {na} >= 32 THEN 4 * ({na} // 32) ELSE 0 END AS BIGINT),"
            f" CAST({na} // 8 AS BIGINT)), {wi} -> "
            + _w8(g, bs, f"8 * {wi} + 1")
            + ")"
        )
        fold = (
            f"list_reduce(list_prepend({hw}, {word_list}),"
            f" ({wa}, {wb}) -> {_wrd(g, wa, wb)})"
        )
        return g.let(fold, lambda h8: _tail(bs, n, na, h8))

    def _tail(bs: str, n: str, na: str, h8: str) -> str:
        four = g.let(
            _w4(g, bs, f"{na} + 1"),
            lambda k: g.let(
                _mul(k, f"{_P1}::HUGEINT"),
                lambda kk: g.let(
                    _xor(h8, kk),
                    lambda x: g.let(
                        _rot(x, 23),
                        lambda r: f"(({_mul(r, f'{_P2}::HUGEINT')} + {_P3}::HUGEINT) % {_MS})",
                    ),
                ),
            ),
        )
        h4 = f"(CASE WHEN {n} - {na} >= 4 THEN {four} ELSE {h8} END)"
        ba, bb, ti = g.var("a"), g.var("b"), g.var("t")
        tail_list = (
            f"list_transform(range("
            f"CAST({na} + CASE WHEN {n} - {na} >= 4 THEN 5 ELSE 1 END AS BIGINT),"
            f" CAST({n} + 1 AS BIGINT)), {ti} -> {bs}[CAST({ti} AS BIGINT)])"
        )
        return g.let(
            h4,
            lambda h: g.let(
                f"list_reduce(list_prepend({h}, {tail_list}),"
                f" ({ba}, {bb}) -> {_b1(g, ba, bb)})",
                lambda hf: _fmix_signed(g, hf),
            ),
        )

    return g.let(s_expr, with_bytes)


def xxh64_long_inline(e_expr: str, prefix: str = "g") -> str:
    """Inline DuckDB expression equal to ``F.xxhash64(bigint_col)``.

    Spark hashes fixed-width integer inputs through XXH64.hashLong — one
    8-byte word, no byte expansion:
    ``h = seed+P5+8; h = rotl(h ^ rotl(k*P2,31)*P1, 27)*P1 + P4; fmix``.
    """
    g = _Gen(prefix)
    h0 = f"{(42 + _P5 + 8) % _M}::HUGEINT"
    return g.let(
        f"((CAST({e_expr} AS HUGEINT) % {_MS}) + {_MS}) % {_MS}",
        lambda k: g.let(_wrd(g, h0, k), lambda h: _fmix_signed(g, h)),
    )


def xxh64_pmod_inline(s_expr: str, p: int, prefix: str = "p") -> str:
    """Inline DuckDB expression equal to ``F.pmod(F.xxhash64(s), p)``."""
    inner = xxh64_inline(s_expr, prefix=prefix)
    g = _Gen(prefix + "m")
    return g.let(inner, lambda h: f"((({h} % {p}) + {p}) % {p})")


# Convenience macro form for tests / interactive use (single statement).
XXH64_MACROS = (
    "CREATE OR REPLACE MACRO xxh64_spark(s) AS "
    + xxh64_inline("CAST(s AS VARCHAR)")
    + ";"
)
