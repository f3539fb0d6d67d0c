"""Deterministic HTML → text extraction. **FROZEN BYTE CONTRACT.**

The north rule (BASELINE.json:6,15) requires a "trafilatura-style
deterministic extractor guaranteeing byte-identical extracted text per
url". trafilatura/lxml are not installed in this environment, so the
extractor is pure stdlib (``html.parser``) with a fixed, documented spec.
Once golden hashes are frozen (tests/fixtures/golden_extract.jsonl) this
module is APPEND-ONLY: any change to the functions below breaks the
byte-identity contract and replay equivalence.

Spec (v1, frozen 2026-08-16):

1. **Charset detection order** (for ``bytes`` input): UTF-8/UTF-16/UTF-32
   BOM → ``<meta charset=...>`` / ``<meta http-equiv=Content-Type>`` in
   the first 2048 bytes → strict UTF-8 → Latin-1 (never fails).
2. **DOM handling** (``html.parser.HTMLParser``, ``convert_charrefs=True``
   so entities and numeric character references decode to text): content
   inside SKIP_TAGS (script/style/head/nav/…) is dropped, tracked with a
   per-tag depth counter so malformed nesting degrades deterministically.
3. **Block structure**: BLOCK_TAGS open/close and <br>/<hr> emit a line
   break; everything else (including raw newlines in source text) is
   inline whitespace.
4. **Whitespace canonicalization**: within each block-delimited line,
   runs of Unicode whitespace (incl. source newlines) collapse to a
   single ASCII space and the line is stripped; empty lines are dropped;
   lines join with a single "\\n".
5. **Unicode normalization**: NFC over the final string.

All of this is vectorized for the hot path via an Arrow pandas UDF
(Iterator[Series] → Iterator[Series] form, so per-batch Python overhead
amortizes) — no per-row Python UDF anywhere (BASELINE.json:15).
"""

from __future__ import annotations

import codecs
import re
import unicodedata
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_SPEC_VERSION = 1

# Content inside these tags is never text (trafilatura-style boilerplate
# removal: chrome, scripts, embedded data).
SKIP_TAGS = frozenset(
    {
        "script",
        "style",
        "noscript",
        "template",
        "head",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "iframe",
        "svg",
        "select",
        "option",
        "button",
        "object",
        "embed",
        "applet",
        "canvas",
        "audio",
        "video",
        "map",
        "figcaption",
    }
)

# Opening or closing one of these forces a line break.
BLOCK_TAGS = frozenset(
    {
        "address",
        "article",
        "blockquote",
        "body",
        "caption",
        "dd",
        "div",
        "dl",
        "dt",
        "fieldset",
        "figure",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "html",
        "legend",
        "li",
        "main",
        "ol",
        "p",
        "pre",
        "section",
        "summary",
        "table",
        "tbody",
        "td",
        "tfoot",
        "th",
        "thead",
        "tr",
        "ul",
    }
)

_LINE_BREAK_VOID = frozenset({"br", "hr"})

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_.:\-]+)""", re.IGNORECASE
)

# Block-boundary sentinel: a code point that cannot survive handle_data
# whitespace collapse and is vanishingly unlikely in real text.
_BLOCK_BREAK = "\x00"


def decode_html(raw: bytes | str) -> str:
    """Decode html bytes to str with the frozen charset-detection order."""
    if isinstance(raw, str):
        return raw
    if raw.startswith(codecs.BOM_UTF8):
        return raw[len(codecs.BOM_UTF8) :].decode("utf-8", errors="replace")
    for bom, enc in (
        (codecs.BOM_UTF32_LE, "utf-32-le"),
        (codecs.BOM_UTF32_BE, "utf-32-be"),
        (codecs.BOM_UTF16_LE, "utf-16-le"),
        (codecs.BOM_UTF16_BE, "utf-16-be"),
    ):
        if raw.startswith(bom):
            return raw[len(bom) :].decode(enc, errors="replace")
    m = _META_CHARSET_RE.search(raw[:2048])
    if m:
        name = m.group(1).decode("ascii", errors="ignore")
        try:
            codec = codecs.lookup(name)
            return raw.decode(codec.name, errors="strict")
        except (LookupError, UnicodeDecodeError):
            pass
    try:
        return raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self._parts: list[str] = []
        self._title_parts: list[str] = []
        self._in_title = 0

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag == "title":
            self._in_title += 1
        if tag in SKIP_TAGS:
            self._skip_depth += 1
        elif tag in BLOCK_TAGS or tag in _LINE_BREAK_VOID:
            self._parts.append(_BLOCK_BREAK)

    def handle_startendtag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in BLOCK_TAGS or tag in _LINE_BREAK_VOID:
            self._parts.append(_BLOCK_BREAK)

    def handle_endtag(self, tag: str) -> None:
        if tag == "title" and self._in_title > 0:
            self._in_title -= 1
        if tag in SKIP_TAGS:
            if self._skip_depth > 0:
                self._skip_depth -= 1
        elif tag in BLOCK_TAGS:
            self._parts.append(_BLOCK_BREAK)

    def handle_data(self, data: str) -> None:
        if self._in_title:
            self._title_parts.append(data)
        if self._skip_depth == 0 and data:
            self._parts.append(data)

    def text(self) -> str:
        lines: list[str] = []
        for rawline in "".join(self._parts).split(_BLOCK_BREAK):
            collapsed = " ".join(rawline.split())
            if collapsed:
                lines.append(collapsed)
        return unicodedata.normalize("NFC", "\n".join(lines))

    def title(self) -> str | None:
        t = " ".join("".join(self._title_parts).split())
        return unicodedata.normalize("NFC", t) if t else None


def _parse(raw: bytes | str | None) -> _TextExtractor:
    p = _TextExtractor()
    if raw is not None:
        p.feed(decode_html(raw))
        p.close()
    return p


# ---------------------------------------------------------------------- #
# Fast scanner (same bytes, ~3× less CPU)
# ---------------------------------------------------------------------- #
# html.parser spends most of extraction CPU in per-token Python method
# dispatch. This scanner replicates the EXACT byte behavior of
# _TextExtractor for the well-formed subset of HTML — ordinary start/end/
# self-closing tags with quoted or unquoted attributes, entity references,
# script/style CDATA with a clean matching end tag — and returns None
# ("I'm not sure") for ANYTHING else: comments, doctypes, processing
# instructions, malformed tags, stray '</', cdata end-tag oddities. The
# caller then falls back to the frozen html.parser path, so output bytes
# are identical by construction on the fallback and verified identical on
# the fast path by a hypothesis differential test
# (tests/test_extract.py::test_fast_scanner_differential). The frozen
# byte CONTRACT is unchanged — this is a physical plan choice, like
# Catalyst picking a different join.
from html import unescape as _unescape  # noqa: E402  (stdlib, deterministic)

_FAST_BAIL_RE = re.compile(r"<[!?]|</[^a-zA-Z]")
# The name group is followed by a lookahead restricted to html.parser's
# EXACT tag-name terminators ([\t\n\r\f />] — tagfind_tolerant's
# exclusion charset): a name followed by anything else (\xa0, \x0b,
# \x00, any Unicode space) is absorbed INTO the name by html.parser,
# giving different tag semantics, so the scanner must decline rather
# than match "<p\xa0>" as a <p>. Inside the attribute section both this
# pattern and html.parser use Unicode \s, so those positions align.
_FAST_TAG_RE = re.compile(
    r"<(?P<close>/)?(?P<name>[a-zA-Z][-.a-zA-Z0-9:_]*)(?=[\t\n\r\f />])"
    r"(?P<attrs>(?:\s+[^\s/>=\"'<]+(?:\s*=\s*(?:\"[^\"<]*\"|'[^'<]*'|[^\s>\"'`<]*))?)*)"
    r"\s*(?P<selfclose>/)?>"
)
_FAST_CDATA_INTEREST = {
    t: re.compile(rf"</\s*{t}", re.IGNORECASE) for t in ("script", "style")
}
_FAST_CDATA_END = {
    t: re.compile(rf"</\s*{t}\s*>", re.IGNORECASE) for t in ("script", "style")
}


def _fast_scan(src: str) -> tuple[list[str], list[str]] | None:
    """Single-pass tokenizer mirroring _TextExtractor's state machine.
    Returns (parts, title_parts) or None when the input leaves the
    verified-identical subset."""
    if _FAST_BAIL_RE.search(src):
        return None
    parts: list[str] = []
    title_parts: list[str] = []
    skip_depth = 0
    in_title = 0

    def data(seg: str) -> None:
        if not seg:
            return
        if "&" in seg:
            seg = _unescape(seg)
            if not seg:
                return
        if in_title:
            title_parts.append(seg)
        if skip_depth == 0:
            parts.append(seg)

    pos, n = 0, len(src)
    while pos < n:
        lt = src.find("<", pos)
        if lt == -1:
            data(src[pos:])
            break
        data(src[pos:lt])
        m = _FAST_TAG_RE.match(src, lt)
        if m is None:
            nxt = src[lt + 1 : lt + 2]
            if nxt and not (nxt.isalpha() or nxt in "/!?"):
                # html.parser emits a lone '<' as data and moves on
                if in_title:
                    title_parts.append("<")
                if skip_depth == 0:
                    parts.append("<")
                pos = lt + 1
                continue
            return None  # anything else: let html.parser decide
        closing, tag, attrs, selfclose = (
            m.group("close"), m.group("name").lower(),
            m.group("attrs"), m.group("selfclose"),
        )
        pos = m.end()
        if closing:
            if attrs.strip() or selfclose:
                return None  # tolerant-endtag territory — not our subset
            if tag == "title" and in_title > 0:
                in_title -= 1
            if tag in SKIP_TAGS:
                if skip_depth > 0:
                    skip_depth -= 1
            elif tag in BLOCK_TAGS:
                parts.append(_BLOCK_BREAK)
            continue
        if selfclose:
            if tag in BLOCK_TAGS or tag in _LINE_BREAK_VOID:
                parts.append(_BLOCK_BREAK)
            continue
        # start tag
        if tag == "title":
            in_title += 1
        if tag in SKIP_TAGS:
            skip_depth += 1
        elif tag in BLOCK_TAGS or tag in _LINE_BREAK_VOID:
            parts.append(_BLOCK_BREAK)
        if tag in _FAST_CDATA_INTEREST:
            if in_title:
                return None  # raw cdata would feed title_parts — defer
            mi = _FAST_CDATA_INTEREST[tag].search(src, pos)
            if mi is None:
                break  # unterminated cdata: rest is (dropped) raw data
            me = _FAST_CDATA_END[tag].match(src, mi.start())
            if me is None:
                return None  # '</scriptx' etc. — html.parser's call
            pos = me.end()
            # matching end tag: mirrors handle_endtag(tag in SKIP_TAGS)
            if skip_depth > 0:
                skip_depth -= 1
    return parts, title_parts


def _finish_text(parts: list[str]) -> str:
    lines: list[str] = []
    for rawline in "".join(parts).split(_BLOCK_BREAK):
        collapsed = " ".join(rawline.split())
        if collapsed:
            lines.append(collapsed)
    return unicodedata.normalize("NFC", "\n".join(lines))


def _finish_title(title_parts: list[str]) -> str | None:
    t = " ".join("".join(title_parts).split())
    return unicodedata.normalize("NFC", t) if t else None


def extract_text(raw: bytes | str | None) -> str | None:
    """Pure-python core; the pandas UDF and the golden oracle share it.
    Fast scanner first; frozen html.parser path whenever the scanner
    declines — byte-identical either way."""
    if raw is None:
        return None
    src = decode_html(raw)
    scanned = _fast_scan(src)
    if scanned is not None:
        return _finish_text(scanned[0])
    return _parse(src).text()


def extract_text_reference(raw: bytes | str | None) -> str | None:
    """The frozen html.parser path, unconditionally — the differential
    test's ground truth."""
    if raw is None:
        return None
    return _parse(decode_html(raw)).text()


def extract_title(raw: bytes | str | None) -> str | None:
    if raw is None:
        return None
    src = decode_html(raw)
    scanned = _fast_scan(src)
    if scanned is not None:
        return _finish_title(scanned[1])
    return _parse(src).title()


def extract_title_reference(raw: bytes | str | None) -> str | None:
    if raw is None:
        return None
    return _parse(decode_html(raw)).title()


@F.pandas_udf(T.StringType())
def extract_text_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(extract_text)


@F.pandas_udf(T.StringType())
def extract_title_udf(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    for s in batches:
        yield s.map(extract_title)


# ------------------------------------------------------------------ #
# link extraction (additive — does NOT touch the frozen text contract)
# ------------------------------------------------------------------ #

_HREF_RE = (
    r"""<[aA](?:\s[^>]*?)?\s[hH][rR][eE][fF]\s*=\s*["']([^"'#][^"']*)["']"""
)


def extract_links(html_col) -> Column:
    """``array<string>`` of href values from anchor tags — pure codegen
    (regexp_extract_all over the decoded bytes), the input to the
    link-graph operators (operators/graph.py). Fragment-only hrefs are
    skipped; no URL resolution here (compose with
    functions/url.canonical_url downstream)."""
    s = F.col(html_col).cast("string") if isinstance(html_col, str) else html_col.cast("string")
    return F.regexp_extract_all(s, F.lit(_HREF_RE), 1)


def host_edges(df: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(src, dst) host-level edge list from crawled pages: one explode
    of the per-page link array, hosts lowercased/www-stripped via the
    frozen URL spec; relative links (no host) drop; self-loops drop."""
    from datax_spark.functions.url import url_parts

    src_host = F.regexp_replace(
        F.lower(url_parts(F.col(url_col))["host"]), "^www\\.", ""
    )
    dst_host = F.regexp_replace(
        F.lower(url_parts(F.col("_link"))["host"]), "^www\\.", ""
    )
    return (
        df.select(
            src_host.alias("src"),
            F.explode(extract_links(html_col)).alias("_link"),
        )
        .select("src", dst_host.alias("dst"))
        .filter((F.col("dst") != "") & (F.col("src") != F.col("dst")))
    )
