"""XXH64 re-expressed as pure DuckDB SQL — the oracle side of Spark's
``xxhash64``.

Spark's production hash family (``F.xxhash64``, seed 42) is the fast
JVM path used by the dedup/sampling operators; DuckDB has no xxhash64,
which previously left those registry keys rows-only.  This module
GENERATES DuckDB SQL expressions that replay the public XXH64 algorithm
(Cyan4973/xxHash spec; Spark's XXH64.java implements the same mapping
with hashInt/hashLong specializations) bit-for-bit:

- 64-bit wraparound arithmetic on HUGEINT (multiplication split into
  32-bit halves so no product exceeds the 128-bit range);
- let-bindings via single-element ``list_transform`` lambdas, so each
  intermediate is evaluated once and the generated text stays linear;
- data-length loops (32-byte stripes, 8-byte words, tail bytes) via
  ``list_reduce`` with the seed state as the list head;
- bytes addressed through ``hex(encode(s))`` substrings (little-endian
  lanes re-assembled by reversing hex pairs).

Equivalence with Spark is pinned by tests/test_xxh64_sql.py over empty /
ascii / unicode / >32-byte strings and the hashLong/hashInt chain shapes
the operators use (differential, Spark vs DuckDB).

CALLER CONTRACT: generated expressions bind internal lambda variables
(u, sd, t, s, x, o, i, w, k, l, l4, bb, mr, hm, hx, n, v0, sa, sb,
h0-h3, hx1, hx2, f1-f4, r1, r2).  An OUTER lambda variable passed in as
``expr``/``seed_expr`` must not use those names unless it is consumed
before any internal binding: ``expr`` of :func:`xxh64_str` is consumed
in the outermost scope (any name works), but ``seed_expr`` of
:func:`xxh64_int`/:func:`xxh64_long` is referenced under the internal
``u`` binding — callers use a name like ``uu`` (the shadowing bug this
guards against made every minhash signature seed-only, i.e. constant
across documents).
"""

from __future__ import annotations

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5
M = 1 << 64
SEED = 42


def _let(var: str, expr: str, body: str, cast: str = "::HUGEINT") -> str:
    """Bind ``expr`` to ``var`` inside ``body`` (single evaluation)."""
    return f"list_transform([({expr}){cast}], {var} -> ({body}))[1]"


def _add(*terms: str) -> str:
    return "((" + " + ".join(f"({t})" for t in terms) + f") % {M})"


def _mul(a: str, b: str) -> str:
    """(a * b) mod 2**64 with operands < 2**64.  Split into 32-bit halves
    so no intermediate exceeds HUGEINT range.  ``a``/``b`` should be
    SHORT expressions (let-bound variables) — each appears three times."""
    lo = f"(({a}) % 4294967296) * (({b}) % 4294967296)"
    mid = (
        f"((({a}) % 4294967296) * (({b}) // 4294967296)"
        f" + (({a}) // 4294967296) * (({b}) % 4294967296)) % 4294967296"
    )
    return f"(({lo} + ({mid}) * 4294967296) % {M})"


def _rotl(x: str, r: int) -> str:
    """Rotate-left by constant r; low and high parts are disjoint so the
    sum needs no final reduction."""
    return f"((({x}) * {1 << r}) % {M} + (({x}) // {1 << (64 - r)}))"


def _xor(a: str, b: str) -> str:
    return f"xor(({a}), ({b}))"


def _fmix(h_var: str) -> str:
    """XXH64 avalanche over a let-bound variable."""
    s1 = _xor(h_var, f"({h_var}) // {1 << 33}")
    body = _let(
        "f2",
        _mul("f1", str(P2)),
        _let(
            "f3",
            _xor("f2", f"f2 // {1 << 29}"),
            _let(
                "f4",
                _mul("f3", str(P3)),
                _xor("f4", f"f4 // {1 << 32}"),
            ),
        ),
    )
    return _let("f1", s1, body)


def _signed(expr: str) -> str:
    """[0, 2**64) -> two's-complement BIGINT (Spark's LongType view)."""
    return (
        f"(CASE WHEN ({expr}) >= {1 << 63} THEN ({expr}) - {M}"
        f" ELSE ({expr}) END)::BIGINT"
    )


def _unsigned64(expr: str) -> str:
    """Signed BIGINT expression -> its bit pattern in [0, 2**64)."""
    return f"(((({expr})::HUGEINT) % {M} + {M}) % {M})"


def _round0(v_var: str) -> str:
    """rotl(v * P2, 31) * P1 for a let-bound v."""
    return _let("r1", _mul(v_var, str(P2)), _let("r2", _rotl("r1", 31), _mul("r2", str(P1))))


def _merge_word(h_expr: str, lane_expr: str) -> str:
    """One 8-byte word step: h = rotl(h ^ round0(lane), 27) * P1 + P4."""
    inner = _let(
        "k",
        _round0("w"),
        _let(
            "hx1",
            _xor("h0", "k"),
            _let("hx2", _rotl("hx1", 27), _add(_mul("hx2", str(P1)), str(P4))),
        ),
    )
    return _let("h0", h_expr, _let("w", lane_expr, inner))


# ---------------------------------------------------------------- byte access
# over hx (UPPERCASE hex of the UTF-8 bytes) with 0-based byte offset o


def _lane8(o_expr: str) -> str:
    """Little-endian 8-byte lane at byte offset o (an expression)."""
    pairs = " || ".join(
        f"substring(hx, (2*({o_expr}) + {2 * i + 1})::BIGINT, 2)" for i in reversed(range(8))
    )
    return f"('0x' || {pairs})::UBIGINT::HUGEINT"


def _lane4(o_expr: str) -> str:
    pairs = " || ".join(
        f"substring(hx, (2*({o_expr}) + {2 * i + 1})::BIGINT, 2)" for i in reversed(range(4))
    )
    return f"('0x' || {pairs})::UBIGINT::HUGEINT"


def _byte(o_expr: str) -> str:
    return f"('0x' || substring(hx, (2*({o_expr}) + 1)::BIGINT, 2))::INT::HUGEINT"


def xxh64_str(expr: str, seed: int = SEED) -> str:
    """DuckDB SQL: Spark ``xxhash64(expr)`` for a string column/expression
    (signed BIGINT result)."""
    v1 = (seed + P1 + P2) % M
    v2 = (seed + P2) % M
    v3 = seed % M
    v4 = (seed - P1) % M

    # 32-byte stripe fold: state [v1..v4], items [o, o+8, o+16, o+24]
    def stripe_round(v: str, off: str) -> str:
        inner = _let(
            "sa",
            _add("v0", _mul("l", str(P2))),
            _let("sb", _rotl("sa", 31), _mul("sb", str(P1))),
        )
        return _let("v0", v, _let("l", _lane8(off), inner))

    stripe_state = (
        f"list_reduce([[{v1}::HUGEINT, {v2}::HUGEINT, {v3}::HUGEINT, {v4}::HUGEINT]]"
        f" || list_transform(range(0, n // 32),"
        f" i -> [i*32, i*32 + 8, i*32 + 16, i*32 + 24]),"
        f" (s, x) -> ["
        + ", ".join(stripe_round(f"s[{k}]", f"x[{k}]") for k in (1, 2, 3, 4))
        + "])"
    )
    converge = _add(
        _rotl("t[1]", 1), _rotl("t[2]", 7), _rotl("t[3]", 12), _rotl("t[4]", 18)
    )
    merged = converge
    for k in (1, 2, 3, 4):
        merged = _let(
            "h0",
            merged,
            _let(
                "mr",
                _round0(f"t[{k}]"),
                _let("hm", _xor("h0", "mr"), _add(_mul("hm", str(P1)), str(P4))),
            ),
        )
    big_path = _let("t", stripe_state, merged, cast="")
    acc0 = f"(CASE WHEN n >= 32 THEN ({big_path}) ELSE {(seed + P5) % M} END)"

    acc1 = _add(acc0, "n")
    # 8-byte words from (n//32)*32 while o + 8 <= n
    words = (
        f"list_reduce([({acc1})]"
        f" || list_transform(range((n // 32) * 32, n - 7, 8), o -> o::HUGEINT),"
        f" (s, x) -> ({_merge_word('s', _lane8('x'))}))"
    )
    # one 4-byte chunk at (n//8)*8 iff n % 8 >= 4
    four = _let(
        "h0",
        words,
        f"CASE WHEN n % 8 >= 4 THEN ("
        + _let(
            "l4",
            _lane4("(n // 8) * 8"),
            _let(
                "hx1",
                _xor("h0", f"(l4 * {P1}) % {M}"),  # l4 < 2**32: plain product fits
                _let("hx2", _rotl("hx1", 23), _add(_mul("hx2", str(P2)), str(P3))),
            ),
        )
        + ") ELSE h0 END",
    )
    # tail bytes from n - n % 4
    tail = (
        f"list_reduce([({four})]"
        f" || list_transform(range(n - n % 4, n, 1), o -> o::HUGEINT),"
        f" (s, x) -> ("
        + _let(
            "h0",
            "s",
            _let(
                "bb",
                _byte("x"),
                _let(
                    "hx1",
                    _xor("h0", f"(bb * {P5}) % {M}"),
                    _let("hx2", _rotl("hx1", 11), _mul("hx2", str(P1))),
                ),
            ),
        )
        + "))"
    )
    final = _let("hf", tail, _fmix("hf"))
    whole = _let(
        "hx",
        f"hex(encode({expr}))",
        _let("n", f"octet_length(encode({expr}))::BIGINT", final, cast=""),
        cast="",
    )
    return _signed(whole)


def xxh64_long(expr: str, seed_expr: str = str(SEED)) -> str:
    """DuckDB SQL: Spark XXH64.hashLong(expr, seed) — ``expr`` a signed
    BIGINT expression, ``seed_expr`` an unsigned-domain expression or
    literal.  Signed BIGINT result."""
    body = _let(
        "u",
        _unsigned64(expr),
        _let(
            "sd",
            seed_expr,
            _let(
                "k1",
                _round0("u"),
                _let(
                    "h1",
                    _xor(_add("sd", str((P5 + 8) % M)), "k1"),
                    _let(
                        "h2",
                        _rotl("h1", 27),
                        _let("h3", _add(_mul("h2", str(P1)), str(P4)), _fmix("h3")),
                    ),
                ),
            ),
        ),
    )
    return _signed(body)


def xxh64_int(expr: str, seed_expr: str = str(SEED)) -> str:
    """DuckDB SQL: Spark XXH64.hashInt(expr, seed) — ``expr`` a 32-bit
    integer expression (its unsigned bits are hashed)."""
    u32 = f"(((({expr})::HUGEINT) % 4294967296 + 4294967296) % 4294967296)"
    body = _let(
        "u",
        u32,
        _let(
            "sd",
            seed_expr,
            _let(
                "h1",
                _xor(_add("sd", str((P5 + 4) % M)), f"(u * {P1}) % {M}"),
                _let(
                    "h2",
                    _rotl("h1", 23),
                    _let("h3", _add(_mul("h2", str(P2)), str(P3)), _fmix("h3")),
                ),
            ),
        ),
    )
    return _signed(body)


def xxh64_long_chain_int(long_expr: str, int_literal: int) -> str:
    """Spark ``F.xxhash64(longCol, F.lit(i))``: seed 42 → hashLong(col)
    → hashInt(i, ·).  The hashLong half is independent of ``i`` — callers
    hashing one column under many seeds should let-bind it once via
    :func:`xxh64_long` and wrap each seed with :func:`xxh64_int`."""
    inner_unsigned = _unsigned64(xxh64_long(long_expr))
    return xxh64_int(str(int_literal), inner_unsigned)


def xxh64_int_lit(k: int, seed_expr: str) -> str:
    """hashInt with a LITERAL int input: (k & 0xFFFFFFFF) * P1 folds to a
    constant, saving two bindings per evaluation — used by the minhash
    oracle, which evaluates this hundreds of thousands of times."""
    c = ((k & 0xFFFFFFFF) * P1) % M
    body = _let(
        "sd",
        seed_expr,
        _let(
            "h1",
            _xor(_add("sd", str((P5 + 4) % M)), str(c)),
            _let(
                "h2",
                _rotl("h1", 23),
                _let("h3", _add(_mul("h2", str(P2)), str(P3)), _fmix("h3")),
            ),
        ),
    )
    return _signed(body)


def hashint_seeds_cte(
    n_seeds: int, src: str = "hu_t", u_col: str = "u", id_col: str = "doc_id"
) -> str:
    """Chained-CTE form of hashInt(k, u) for k in 0..n_seeds-1: each
    algorithm step is one CTE layer of plain columns, so evaluation is
    fully vectorized with zero list allocations (the let-binding form
    costs a 1-element list per binding per row — ~60µs/eval; this form
    is ~µs).  Emits CTE definitions ``ia, ib, ... iz`` (append after a
    WITH clause); ``iz`` has columns (id_col, v0..v{n-1}) holding the
    signed hashInt results."""
    ks = range(n_seeds)
    c1 = (P5 + 4) % M

    def cols(fmt) -> str:
        return ", ".join(fmt(k) for k in ks)

    layers = [
        f"ia AS (SELECT {id_col}, ((({u_col}) + {c1}) % {M}) AS a FROM {src})",
        f"ib AS (SELECT {id_col}, "
        + cols(lambda k: f"xor(a, {((k & 0xFFFFFFFF) * P1) % M}::HUGEINT) AS t{k}")
        + " FROM ia)",
        f"ic AS (SELECT {id_col}, "
        + cols(lambda k: f"({_rotl(f't{k}', 23)}) AS r{k}")
        + " FROM ib)",
        f"im AS (SELECT {id_col}, "
        + cols(lambda k: f"({_add(_mul(f'r{k}', str(P2)), str(P3))}) AS m{k}")
        + " FROM ic)",
        f"if1 AS (SELECT {id_col}, "
        + cols(lambda k: f"({_xor(f'm{k}', f'm{k} // {1 << 33}')}) AS a{k}")
        + " FROM im)",
        f"if2 AS (SELECT {id_col}, "
        + cols(lambda k: f"({_mul(f'a{k}', str(P2))}) AS b{k}")
        + " FROM if1)",
        f"if3 AS (SELECT {id_col}, "
        + cols(lambda k: f"({_xor(f'b{k}', f'b{k} // {1 << 29}')}) AS c{k}")
        + " FROM if2)",
        f"if4 AS (SELECT {id_col}, "
        + cols(lambda k: f"({_mul(f'c{k}', str(P3))}) AS d{k}")
        + " FROM if3)",
        f"if5 AS (SELECT {id_col}, "
        + cols(lambda k: f"({_xor(f'd{k}', f'd{k} // {1 << 32}')}) AS e{k}")
        + " FROM if4)",
        f"iz AS (SELECT {id_col}, "
        + cols(lambda k: f"({_signed(f'e{k}')}) AS v{k}")
        + " FROM if5)",
    ]
    return ", ".join(layers)
