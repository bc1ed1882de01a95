"""Mojibake (double-encoding) repair — the ftfy idea as a vectorized
column operator.

Web text routinely arrives double-encoded: utf-8 bytes were decoded as
latin-1/cp1252 somewhere upstream, turning ``café`` into ``cafÃ©``
(and, after two bad hops, ``cafÃƒÂ©``). The repair trick is the
round-trip test: if re-encoding the string as latin-1 (cp1252
fallback for the 0x80–0x9F gap) yields bytes that decode CLEANLY as
utf-8, the string was mojibake and the decode is the original;
genuinely-clean accented text fails the utf-8 decode and is left
untouched. Deterministic byte arithmetic — no models, no heuristics
beyond the round trip — so it is exactly oracle-able.

``fix_mojibake_text`` iterates to a fixpoint (double-encoded text
needs two passes) with a bounded pass count. The column form runs as
an Arrow-batched pandas UDF; at corpus scale apply it over DISTINCT
texts (or route through the distinct-type broadcast pattern the BPE
apply uses) — though even row-wise it is a pure map stage, zero
shuffles.

Known ambiguity (shared with ftfy): a document that GENUINELY
discusses the string ``Ã©`` will be "repaired". The round-trip test
makes this astronomically unlikely on natural text (the byte sequence
must be valid utf-8 in its entirety), but it is why n_passes rides
along in the output — audit the repaired slice, don't trust it
blindly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX_PASSES = 3


def fix_mojibake_text(s: str, max_passes: int = _MAX_PASSES) -> tuple[str, int]:
    """(repaired string, passes applied). Pure function; the column
    operator and the tests share it."""
    for p in range(max_passes):
        if not any(0x80 <= ord(c) <= 0xFF for c in s):
            return s, p
        try:
            b = s.encode("latin-1")
        except UnicodeEncodeError:
            try:
                b = s.encode("cp1252")
            except UnicodeEncodeError:
                return s, p
        try:
            dec = b.decode("utf-8")
        except UnicodeDecodeError:
            return s, p
        if dec == s:
            return s, p
        s = dec
    return s, max_passes


def repair_mojibake_col(text_col: str | Column) -> Column:
    """struct(repaired string, n_passes int) — Arrow-batched."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf("repaired string, n_passes int", PandasUDFType.SCALAR)
    def fix(s):
        pairs = s.map(fix_mojibake_text)
        return pd.DataFrame(
            {
                "repaired": pairs.map(lambda t: t[0]),
                "n_passes": pairs.map(lambda t: t[1]),
            }
        )

    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return fix(col)
