"""Link extraction from fetched content (SURVEY.md F7–F10, P10).

The reference extracts URLs from HTML (BeautifulSoup/lxml over
``<a href>`` with ``<base>`` honored), Atom/RSS feeds (feedparser) and
sitemap XML (``/root/reference/starbelly/extractor.py:131-235``,
``sitemap.py:20-83``), dispatching on content-type and raising on
unsupported MIME (extractor.py:156-158).  Bodies over 10 MB are
skipped (extractor.py:16-17).

This container has no bs4/lxml/feedparser, so the parsers are original
stdlib implementations with the same *behaviors* (pinned by
tests/test_extract.py, mirroring the reference's test expectations):

* HTML: every ``<a href>``; relative URLs resolved against ``<base
  href>`` if present else the page URL; only http(s) kept downstream.
* Atom: ``<link href>`` entries; RSS: ``<link>`` text elements.
* Sitemap: ``<url><loc>`` and nested ``<sitemap><loc>`` index files,
  namespace-tolerant.
* Unsupported content-type → no links (the pipeline's MIME gate).

Pure kernels + one ``mapInPandas`` operator (Arrow batches, no per-row
Python in the Spark plan).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin
from xml.etree import ElementTree

import pandas as pd

MAX_PARSE_BYTES = 10 * 1024 * 1024   # extractor.py:16-17 semantics

_A_HREF_RE = re.compile(
    r"""<a\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE | re.DOTALL,
)
_BASE_RE = re.compile(
    r"""<base\b[^>]*?\bhref\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.IGNORECASE,
)
_RSS_LINK_RE = re.compile(r"<link>\s*([^<\s][^<]*?)\s*</link>", re.IGNORECASE)


def _first_group(m: re.Match) -> str:
    return next(g for g in m.groups() if g is not None)


# ---------------------------------------------------------------------------
# Charset detection + decode (F10).  The reference uses chardet +
# w3lib.encoding.html_to_unicode (extractor.py:200-204); this is the
# deterministic, dependency-free precedence chain covering the same
# decisions: BOM > header charset > <meta> charset > utf-8 if valid >
# latin-1 (never fails).
# ---------------------------------------------------------------------------

_BOMS = (
    (b"\xef\xbb\xbf", "utf-8-sig"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)
_HEADER_CHARSET_RE = re.compile(r"charset\s*=\s*[\"']?([\w.:-]+)", re.I)
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?([\w.:-]+)""", re.IGNORECASE
)


def detect_charset(body: bytes, content_type: str | None = None) -> str:
    """Pick the decode charset: BOM sniff → Content-Type header →
    <meta charset> in the first 4 KB → utf-8 if it validates →
    latin-1 fallback."""
    for bom, enc in _BOMS:
        if body.startswith(bom):
            return enc
    for source in (
        _HEADER_CHARSET_RE.search(content_type or ""),
        _META_CHARSET_RE.search(body[:4096]),
    ):
        if source:
            g = source.group(1)
            enc = (g if isinstance(g, str) else g.decode("ascii", "ignore"))
            try:
                b"x".decode(enc)
                return enc.lower()
            except (LookupError, UnicodeDecodeError):
                pass  # unknown label → keep sniffing
    try:
        body.decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return _statistical_charset(body)


# Undeclared non-UTF-8 fallback (the reference runs chardet here,
# extractor.py:200-204): score a small set of common legacy encodings
# by how much of the decoded text lands in a coherent script block,
# instead of silently producing latin-1 mojibake.  Deterministic: pure
# function of the first 8 KB, fixed candidate order breaks ties.
_FALLBACK_ENCODINGS = ("shift_jis", "euc_jp", "koi8_r", "cp1251", "latin-1")


def _char_class(o: int) -> str:
    if o in (9, 10, 13) or 32 <= o < 127:
        return "ascii"
    if 0x3040 <= o <= 0x30FF or 0x4E00 <= o <= 0x9FFF \
            or 0xFF01 <= o <= 0xFF9F or o in (0x3001, 0x3002):
        return "cjk"                          # kana / CJK / fullwidth
    if 0x0400 <= o <= 0x04FF:
        return "cyr"
    if 0xC0 <= o <= 0xFF or o in (0xA9, 0xAB, 0xBB):
        return "lat1"                         # latin-1 letters/quotes
    return "junk"  # C1 controls, replacement chars, stray symbols


def _script_score(text: str) -> float:
    """Fraction of characters that look like real text.  ASCII
    printables score full weight; CJK/cyrillic chars score full weight
    only in RUNS of ≥2 (real text in those scripts comes in runs —
    an isolated CJK char flanked by ASCII is the mojibake signature
    of decoding a stray latin-1 byte as a multibyte lead); latin-1
    extended letters get partial weight (plausible, but also what
    mojibake looks like)."""
    if not text:
        return 0.0
    classes = [_char_class(ord(ch)) for ch in text]
    score = 0.0
    for i, c in enumerate(classes):
        if c == "ascii":
            score += 1.0
        elif c in ("cjk", "cyr"):
            in_run = (i > 0 and classes[i - 1] == c) or \
                     (i + 1 < len(classes) and classes[i + 1] == c)
            score += 1.0 if in_run else 0.3
        elif c == "lat1":
            score += 0.45
    return score / len(text)


def _statistical_charset(body: bytes) -> str:
    sample = body[:8192]
    best, best_score = "latin-1", -1.0
    for enc in _FALLBACK_ENCODINGS:
        try:
            text = sample.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
        s = _script_score(text)
        if s > best_score + 1e-9:
            best, best_score = enc, s
    return best


def decode_body(body: bytes | str, content_type: str | None = None) -> str:
    """Decode fetched bytes to text via detect_charset; never raises."""
    if isinstance(body, str):
        return body
    return body.decode(detect_charset(body, content_type), errors="replace")


def extract_html_links(base_url: str, body: bytes | str,
                       content_type: str | None = None) -> list[str]:
    """<a href> extraction with <base> handling; relative → absolute."""
    if isinstance(body, bytes):
        if len(body) > MAX_PARSE_BYTES:
            return []
        text = decode_body(body, content_type)
    else:
        text = body
    base_m = _BASE_RE.search(text)
    base = urljoin(base_url, _first_group(base_m)) if base_m else base_url
    out = []
    for m in _A_HREF_RE.finditer(text):
        href = _first_group(m).strip()
        if not href or href.startswith(("#", "javascript:", "mailto:")):
            continue
        try:
            out.append(urljoin(base, href))
        except ValueError:
            continue  # malformed URL skipped (test_extractor semantics)
    return out


def extract_feed_links(body: bytes | str,
                       content_type: str | None = None) -> list[str]:
    """Atom <link href=...> and RSS <link>text</link> entries."""
    text = decode_body(body, content_type)
    links = []
    try:
        root = ElementTree.fromstring(text)
        for el in root.iter():
            tag = el.tag.rsplit("}", 1)[-1].lower()
            if tag == "link":
                href = el.get("href") or (el.text or "").strip()
                if href:
                    links.append(href)
    except ElementTree.ParseError:
        # fall back to the RSS regex for mildly-malformed feeds
        links = [m.group(1) for m in _RSS_LINK_RE.finditer(text)]
    return links


def extract_sitemap_links(body: bytes | str,
                          content_type: str | None = None) -> list[str]:
    """<url><loc> page entries + <sitemap><loc> nested index files,
    namespace-tolerant (sitemap.py:20-83 semantics)."""
    text = decode_body(body, content_type)
    try:
        root = ElementTree.fromstring(text)
    except ElementTree.ParseError:
        return []
    out = []
    for el in root.iter():
        if el.tag.rsplit("}", 1)[-1].lower() == "loc" and el.text:
            out.append(el.text.strip())
    return out


def parse_mime(content_type: str | None) -> tuple[str, str]:
    """'text/html; charset=x' → ('text', 'html') (F12)."""
    if not content_type:
        return "", ""
    main = content_type.split(";", 1)[0].strip().lower()
    typ, _, sub = main.partition("/")
    return typ, sub


def extract_links(url: str, content_type: str | None,
                  body: bytes | None) -> list[str]:
    """Dispatch on content-type (extractor.py:131-159)."""
    if body is None:
        return []
    typ, sub = parse_mime(content_type)
    if (typ, sub) in (("text", "html"), ("application", "xhtml+xml")):
        return extract_html_links(url, body, content_type)
    if sub in ("atom+xml", "rss+xml") or (typ, sub) == ("application", "xml"):
        if b"<urlset" in body[:4096] or b"<sitemapindex" in body[:4096]:
            return extract_sitemap_links(body, content_type)
        return extract_feed_links(body, content_type)
    return []   # unsupported MIME → nothing to extract


def extract_links_kernel(it):
    """mapInPandas kernel: (url, content_type, body, …) batches →
    (url, link) rows (schema 'url string, link string')."""
    for pdf in it:
        urls, links = [], []
        for u, ct, b in zip(pdf["url"], pdf["content_type"], pdf["body"]):
            for link in extract_links(u, ct, bytes(b) if b is not None else None):
                urls.append(u)
                links.append(link)
        yield pd.DataFrame({"url": urls, "link": links})
