"""URL canonicalization + hashing (SURVEY.md §2.7 F1–F4).

Reference behavior being matched (semantics only, no code reuse):

* ``w3lib.url.canonicalize_url`` as used at
  ``/root/reference/starbelly/downloader.py:45,75`` — sort query
  pairs, drop the fragment, lowercase scheme/host, strip default
  ports, percent-encode with uppercase hex, empty path → ``/``.
* Policy URL normalization at
  ``/root/reference/starbelly/policy.py:627-642`` — strip configured
  query parameters *before* canonicalizing.  Pinned expectation
  (``/root/reference/tests/test_policy.py:541-570``):
  ``http://a.com/?foo=2&foo=1&bar=3&PHPSESSID=4`` →
  ``http://a.com/?PHPSESSID=4&bar=3&foo=1&foo=2`` (no strip list) and
  ``http://a.com/?bar=3&foo=1&foo=2`` (strip ``PHPSESSID``).
* 16-byte blake2b digests for URL / domain / body identity
  (``/root/reference/starbelly/extractor.py:102-103``,
  ``rate_limiter.py:66-76``, ``storage.py:96``).  Spark's builtin
  hashes (xxhash64/sha2) deliberately NOT used for these: seen-set
  equality with the reference requires blake2b-16.

All heavy entry points are vectorized pandas UDFs (Arrow batches);
the pure-Python kernels are importable for unit tests and for the
driver-side simulator.
"""

from __future__ import annotations

import hashlib
import posixpath
from collections.abc import Iterable
from urllib.parse import parse_qsl, quote, unquote, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}

# RFC 3986 sub-delims + pchar extras kept literal in paths; everything
# else percent-encoded with uppercase hex (quote() emits uppercase).
_PATH_SAFE = "/;:@&=+$,!*'()~%"
_QUERY_SAFE = ";:@&=+$,!*'()~/?%"


def _clean_component(text: str, safe: str) -> str:
    """unquote-then-quote so mixed-case escapes normalize to one form."""
    return quote(unquote(text), safe=safe)


def canonicalize_url(url: str, strip_params: Iterable[str] = ()) -> str:
    """Canonicalize one URL (pure Python kernel).

    Deterministic, idempotent: ``canonicalize_url(canonicalize_url(u))
    == canonicalize_url(u)``.
    """
    url = url.strip()
    strip = frozenset(strip_params)
    try:
        scheme, netloc, path, query, _fragment = urlsplit(url)
    except ValueError:
        # Malformed URLs are surfaced as-is; callers filter on scheme.
        return url
    scheme = scheme.lower()

    # host lowercased; default port dropped; userinfo preserved
    userinfo, sep, hostport = netloc.rpartition("@")
    host, colon, port = hostport.partition(":")
    host = host.lower()
    if colon and port == _DEFAULT_PORTS.get(scheme, ""):
        colon, port = "", ""
    netloc = (userinfo + sep if sep else "") + host + (colon + port if port else "")

    # query: parse pairs (keeping blanks), drop stripped params, sort
    # by (key, value) — the reference's full-sort semantics.
    pairs = [
        (k, v)
        for k, v in parse_qsl(query, keep_blank_values=True)
        if k not in strip
    ]
    pairs.sort()
    query = "&".join(
        f"{_clean_component(k, _QUERY_SAFE)}={_clean_component(v, _QUERY_SAFE)}"
        for k, v in pairs
    )

    # path: normalize escapes, collapse dot-segments, empty → '/'
    path = _clean_component(path, _PATH_SAFE)
    if path:
        # collapse '.'/'..' like browsers do before comparing identity
        norm = posixpath.normpath(path)
        if path.endswith("/") and not norm.endswith("/"):
            norm += "/"
        path = norm if norm != "." else "/"
    if not path:
        path = "/"

    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str:
    """Lowercased host (no port) of a URL; '' when unparseable."""
    try:
        netloc = urlsplit(url).netloc
    except ValueError:
        return ""
    host = netloc.rpartition("@")[2].partition(":")[0]
    return host.lower()


def blake2b_16(data: bytes) -> bytes:
    """16-byte blake2b digest — the reference's identity hash."""
    return hashlib.blake2b(data, digest_size=16).digest()


def url_hash(canonical_url: str) -> bytes:
    return blake2b_16(canonical_url.encode("ascii", errors="backslashreplace"))


# ---------------------------------------------------------------------------
# Vectorized (pandas UDF) wrappers
# ---------------------------------------------------------------------------

def make_canonicalize_udf(strip_params: tuple[str, ...] = ()):
    """pandas UDF: url → canonical url, with a policy strip list baked
    in at plan time (policies are tiny; shipping via closure is fine).
    """
    strip = tuple(strip_params)

    @F.pandas_udf(T.StringType())
    def canon(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: canonicalize_url(u, strip))

    return canon


@F.pandas_udf(T.StringType())
def host_udf(urls: pd.Series) -> pd.Series:
    return urls.map(url_host)


@F.pandas_udf(T.BinaryType())
def url_hash_udf(urls: pd.Series) -> pd.Series:
    return urls.map(
        lambda u: blake2b_16(u.encode("ascii", errors="backslashreplace"))
    )


@F.pandas_udf(T.BinaryType())
def blake2b_16_udf(data: pd.Series) -> pd.Series:
    return data.map(lambda b: blake2b_16(b if b is not None else b""))


@F.pandas_udf(T.StringType())
def url_hash_hex_udf(urls: pd.Series) -> pd.Series:
    """Hex form of the URL hash — handy as a sortable string tie-break."""
    return urls.map(
        lambda u: blake2b_16(u.encode("ascii", errors="backslashreplace")).hex()
    )


def make_canon_info_udf(strip_params: tuple[str, ...] = ()):
    """One-pass pandas UDF: raw url → struct(url, host, url_hash).

    The hot-path variant: canonicalize + host + blake2b in a single
    Python stage instead of three (the links pipeline runs this over
    millions of rows per micro-batch; one Arrow round-trip, one pass).
    Hex tie-break derives JVM-side via lower(hex(url_hash)).
    """
    strip = tuple(strip_params)

    @F.pandas_udf("url string, host string, url_hash binary")
    def canon_info(urls: pd.Series) -> pd.DataFrame:
        canon = [canonicalize_url(u, strip) for u in urls]
        hosts = [url_host(u) for u in canon]
        hashes = [
            blake2b_16(u.encode("ascii", errors="backslashreplace"))
            for u in canon
        ]
        return pd.DataFrame({"url": canon, "host": hosts, "url_hash": hashes})

    return canon_info
