"""HTML → text extraction: the first real curation step for web-crawl
training data (the trafilatura/resiliparse stage, reduced to a stdlib
``html.parser`` core so it runs anywhere and stays deterministic).

Spec (mirrored exactly by the DuckDB oracle of ``text_html_extract``):

* only BODY content is extracted (head/title are metadata, not text);
* ``<script>``/``<style>`` subtrees are dropped entirely;
* block-level tags (p, div, h1-h6, li, br, nav, footer, ...) open and
  close LINES; inline tags (a, b, i, span, ...) do not;
* each line's whitespace is normalized (runs collapsed, ends stripped);
  empty lines are dropped;
* per line, the LINK DENSITY = chars emitted inside ``<a>`` / total
  chars (both pre-normalization); lines above ``max_link_density`` are
  boilerplate (nav bars, footers, ad blocks — text made of links) and
  are dropped, the remaining lines joined with ``\\n``;
* character references are decoded (``&amp;`` → ``&``).

Scale posture: the parser is pure per-row Python, so it runs as an
Arrow-batched pandas UDF — one Python roundtrip per Arrow batch, not
per row, and the operator is embarrassingly parallel (no shuffle). At
100 TB this is the classic CPU-bound map stage; throughput scales with
executor cores and nothing else.
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import Column
from pyspark.sql import functions as F

_BLOCK_TAGS = frozenset(
    "p div h1 h2 h3 h4 h5 h6 li ul ol br nav footer header section "
    "article table tr blockquote pre hr form".split()
)
_SKIP_TAGS = frozenset({"script", "style"})


class _TextExtractor(HTMLParser):
    """Collects (line_text, link_density) pairs from one document."""

    def __init__(self):
        # convert_charrefs=True (default) decodes &amp; &#39; etc.
        super().__init__()
        self._in_body = False
        self._skip_depth = 0
        self._link_depth = 0
        self._chunks: list[tuple[str, bool]] = []  # (text, inside_link)
        self.lines: list[tuple[str, float]] = []

    def _flush(self) -> None:
        if not self._chunks:
            return
        raw = "".join(t for t, _ in self._chunks)
        link_chars = sum(len(t) for t, in_link in self._chunks if in_link)
        self._chunks = []
        norm = " ".join(raw.split())
        if not norm:
            return
        density = link_chars / len(raw) if raw else 0.0
        self.lines.append((norm, density))

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "body":
            self._in_body = True
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "body":
            self._flush()
            self._in_body = False
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data):
        if self._in_body and not self._skip_depth and data:
            self._chunks.append((data, self._link_depth > 0))

    def close(self):
        super().close()
        self._flush()


def extract_text(
    html: str, max_link_density: float = 0.5
) -> tuple[str, int, int]:
    """Extract main text from one HTML document.

    Returns ``(text, n_kept, n_dropped)`` — kept lines joined with
    newlines, plus how many lines the link-density boilerplate filter
    kept and dropped. Tolerates malformed markup (stdlib parser is
    lenient: unclosed tags, stray ``</...>``, comments are no-ops)."""
    p = _TextExtractor()
    p.feed(html or "")
    p.close()
    kept = [t for t, d in p.lines if d <= max_link_density]
    dropped = len(p.lines) - len(kept)
    return "\n".join(kept), len(kept), dropped


class _LinkExtractor(HTMLParser):
    """Collects <a href> targets from BODY content (skipping
    script/style), in document order."""

    def __init__(self):
        super().__init__()
        self._in_body = False
        self._skip_depth = 0
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
            return
        if tag == "body":
            self._in_body = True
            return
        if tag == "a" and self._in_body and not self._skip_depth:
            href = dict(attrs).get("href")
            if href:
                self.links.append(href)

    def handle_endtag(self, tag):
        if tag in _SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag == "body":
            self._in_body = False


def extract_links(html: str) -> list[str]:
    """All body <a href> values of one document, in order — the crawl
    -frontier extraction step. Tolerates malformed markup."""
    p = _LinkExtractor()
    p.feed(html or "")
    p.close()
    return p.links


def html_links_col(html_col: str | Column) -> Column:
    """Arrow-batched link extraction: array<string> of body hrefs.
    Explode + canonicalize downstream to build the frontier / link
    graph; pure map stage, no shuffle."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf("array<string>", PandasUDFType.SCALAR)
    def lk(s):
        return s.map(extract_links)

    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return lk(col)


def html_extract_col(
    html_col: str | Column, max_link_density: float = 0.5
) -> Column:
    """Arrow-batched extraction column: struct(extracted_text string,
    n_kept int, n_dropped int). Use with ``.select`` + ``.*`` expansion;
    no shuffle, scales as a pure map stage."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type annotations: postponed evaluation (future annotations)
    # would leave them as unresolvable strings for pyspark's inspector
    @pandas_udf(
        "extracted_text string, n_kept int, n_dropped int",
        PandasUDFType.SCALAR,
    )
    def ex(s):
        import pandas as pd

        out = [extract_text(x, max_link_density) for x in s]
        return pd.DataFrame(
            out, columns=["extracted_text", "n_kept", "n_dropped"]
        )

    col = F.col(html_col) if isinstance(html_col, str) else html_col
    return ex(col)
