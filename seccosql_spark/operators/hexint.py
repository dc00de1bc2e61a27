"""Cross-engine md5-hex-prefix → integer: the shared recipe behind every
md5-uniform hash in the oracles. DuckDB has no conv(hex, 16, 10), so the
SQL side decodes the first `nchars` hex digits positionally (strpos over
the hex alphabet); the Spark twin is `F.conv(F.substring(md5, 1, n), 16,
10)`. One parameterized generator — the 32/48/60-bit variants previously
lived as three hand-maintained copies (r10 review finding)."""

from __future__ import annotations


def hex_prefix_int_sql(expr: str, nchars: int) -> str:
    """DuckDB SQL: first `nchars` hex chars of the md5-hex `expr` as an
    integer (4*nchars bits; nchars <= 15 keeps it inside BIGINT). NOTE:
    `expr` is spliced once per digit — pass a column or a cheap expression,
    or hoist the md5 into its own CTE column first."""
    if not (1 <= nchars <= 15):
        raise ValueError(f"nchars must be in [1, 15], got {nchars}")
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({expr}, {i + 1}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    )
