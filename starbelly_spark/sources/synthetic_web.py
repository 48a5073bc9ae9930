"""Deterministic synthetic web — the fetch source (SURVEY.md S8).

The reference downloads over live HTTP
(``/root/reference/starbelly/downloader.py:250-350``); in this sandbox
the "network" is a pure function of the URL and a seed, so every fetch
is reproducible on any executor with no shared state and no I/O.  The
fetch itself runs as a vectorized Arrow UDF (``mapInPandas``) over the
popped frontier batch — no per-row Python in the Spark path.

Web shape (all derived from ``zlib.crc32`` of the URL + seed):

* hosts ``h{i}.example`` for ``i < n_hosts``; page count per host is
  skewed — host 0 holds ``skew_share`` of all pages (exercises the
  salted-repartition path at scale).
* page ``/p{j}`` links to its B tree-children on the same host, plus
  one cross-host link, plus a duplicate and (sometimes) a malformed /
  non-http link to exercise dedup + skip paths
  (semantics from ``/root/reference/tests/test_extractor.py:247-377``).
* every ``IMG_EVERY``-th page is an image resource (``image/png`` etc.)
  whose body is an encoded image from the corpus codec and which
  carries a caption — the graft payload.
* deterministic latency and sporadic 404/500 responses for the error
  counters (``/root/reference/starbelly/db.py:429-464`` semantics).
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..functions.images import _pixels_for_id, encode_image, phash64

IMG_EVERY = 7          # every 7th page is an image resource
ERR_EVERY = 50         # sporadic HTTP errors
_URL_RE = re.compile(r"^http://(h\d+)\.example/p(\d+)$")
_FMTS = ("png", "jpeg", "webp")


@dataclass(frozen=True)
class WebConfig:
    n_hosts: int = 10
    total_pages: int = 1000
    branching: int = 3
    skew_share: float = 0.3     # host 0's share of all pages
    seed: int = 42
    pages_per_host: tuple[int, ...] = field(init=False)

    def __post_init__(self):
        rest = self.n_hosts - 1
        p0 = max(1, int(self.total_pages * self.skew_share))
        per = max(1, (self.total_pages - p0) // max(rest, 1))
        pages = (p0,) + (per,) * rest
        object.__setattr__(self, "pages_per_host", pages[: self.n_hosts])

    def seeds(self, k: int | None = None) -> list[str]:
        k = k if k is not None else min(3, self.n_hosts)
        return [f"http://h{i}.example/p0" for i in range(k)]


def parse_url(url: str) -> tuple[int, int] | None:
    m = _URL_RE.match(url)
    if not m:
        return None
    return int(m.group(1)[1:]), int(m.group(2))


def _h(cfg: WebConfig, *parts) -> int:
    return zlib.crc32(("|".join(map(str, parts)) + f"|{cfg.seed}").encode())


def page_exists(cfg: WebConfig, host: int, page: int) -> bool:
    return 0 <= host < cfg.n_hosts and 0 <= page < cfg.pages_per_host[host]


def is_image_page(cfg: WebConfig, host: int, page: int) -> bool:
    return page % IMG_EVERY == 3


def image_meta(cfg: WebConfig, host: int, page: int):
    """(image_id, w, h, fmt, caption) for an image page."""
    image_id = f"img_{host}_{page}"
    hv = _h(cfg, "img", host, page)
    w = 16 + (hv % 17)           # 16..32
    h = 16 + ((hv >> 8) % 17)
    fmt = _FMTS[hv % 3]
    caption = f"synthetic {fmt} image {image_id} ({w}x{h}) seed={cfg.seed}"
    return image_id, w, h, fmt, caption


def out_links(cfg: WebConfig, host: int, page: int) -> list[str]:
    """Links 'on the page' — includes dupes / malformed / off-scheme."""
    if is_image_page(cfg, host, page):
        return []
    links: list[str] = []
    base = cfg.branching * page
    for m in range(1, cfg.branching + 1):
        child = base + m
        if page_exists(cfg, host, child):
            links.append(f"http://h{host}.example/p{child}")
    # one cross-host link
    other = (host + page + 1) % cfg.n_hosts
    if other != host:
        links.append(f"http://h{other}.example/p0")
    hv = _h(cfg, "extras", host, page)
    if links:
        links.append(links[0])                     # duplicate → dedup path
    if hv % 5 == 0:
        links.append("not a url ::")               # malformed → skipped
    if hv % 7 == 0:
        links.append("ftp://h0.example/file")      # off-scheme → skipped
    return links


def login_page(cfg: WebConfig, host: str, with_captcha: bool = False) -> str:
    """Deterministic multi-form login page for a credentialed host —
    the fixture the login-form CLASSIFIER must get right (reference
    login.py:204-260 classifies every form via formasaurus and picks
    the login one).  Three forms: a search form, a newsletter signup
    (has an email field but no password), and the real login form
    (username + password, POST to /login, optional captcha)."""
    captcha = (
        '  <input type="text" name="captcha_answer">\n'
        '  <img src="/captcha.png">\n'
        if with_captcha else ""
    )
    return f"""<html><head><title>{host} login</title></head><body>
<form action="/search" method="GET">
  <input type="text" name="q">
</form>
<form action="/newsletter" method="POST">
  <input type="text" name="email_address">
</form>
<form action="/login" method="POST">
  <input type="text" name="username">
  <input type="password" name="password">
{captcha}  <input type="hidden" name="csrf" value="tok-{host}">
</form>
</body></html>"""


def session_token(job_id: str, host: str) -> str:
    """Deterministic per-(job, host) login session token — the
    simulated analogue of the reference's per-job cookie session
    (``/root/reference/starbelly/login.py:1-286``: one login flow per
    credentialed domain per job, cookies live in the job's jar)."""
    import hashlib

    return hashlib.blake2b(
        f"{job_id}|{host}".encode(), digest_size=8
    ).hexdigest()


def content_type_of(cfg: WebConfig, host: int, page: int) -> str:
    """The content type a 200 response for this page carries — derived
    WITHOUT materializing the body (the response-header view the MIME
    download gate inspects)."""
    if is_image_page(cfg, host, page):
        return f"image/{image_meta(cfg, host, page)[3]}"
    kind = page_kind(cfg, host, page)
    if kind == "sitemap":
        return "application/xml"
    if kind == "atom":
        return "application/atom+xml"
    return "text/html"


def fetch_one(cfg: WebConfig, url: str, session: str | None = None,
              mime_allow=None) -> dict:
    """Deterministic fetch of one URL (pure kernel; also used by the
    driver-side equivalence simulator).  ``session``: login session
    token for the URL's host, stamped onto the response — the fetch
    runs authenticated iff the crawl established a session first.

    ``mime_allow``: optional ``content_type -> bool`` predicate (the
    policy's MIME save rules).  When it rejects the response's content
    type, the download ABORTS before the body is materialized —
    ``mime_blocked=true``, ``body=None``, no links — mirroring the
    reference's ``MimeNotAllowedError`` (``downloader.py:25-30,
    194-213,301-320``: headers arrive, the type is checked, the
    transfer is abandoned and the result never reaches crawl results;
    the rate limiter still resets, so latency is still charged)."""
    auth = {"authenticated": session is not None, "session_token": session,
            "mime_blocked": False}
    hp = parse_url(url)
    if hp is None or not page_exists(cfg, *hp):
        return {
            "url": url, "status_code": 404, "content_type": None,
            "body": None, "links": [], "latency_ms": 20,
            "image_id": None, "caption": None, "phash": None,
            "w": None, "h": None, "fmt": None, **auth,
        }
    host, page = hp
    hv = _h(cfg, "resp", host, page)
    status = 200
    if hv % ERR_EVERY == 17:
        status = 404
    elif hv % ERR_EVERY == 29:
        status = 500
    elif hv % ERR_EVERY == 41:
        # network-level exception: NO status code at all (reference
        # tracks these apart from http errors, db.py:429-464); the
        # MIME gate never fires — no headers ever arrived
        return {
            "url": url, "status_code": None, "content_type": None,
            "body": None, "links": [], "latency_ms": 20 + (hv % 50),
            "image_id": None, "caption": None, "phash": None,
            "w": None, "h": None, "fmt": None, **auth,
        }
    latency = 50 + (hv % 200)
    # MIME download gate: only 200 responses carry a content type in
    # this web (error pages return none), so only those can be blocked
    if status == 200 and mime_allow is not None:
        ctype = content_type_of(cfg, host, page)
        if not mime_allow(ctype):
            return {
                "url": url, "status_code": status, "content_type": ctype,
                "body": None, "links": [], "latency_ms": latency,
                "image_id": None, "caption": None, "phash": None,
                "w": None, "h": None, "fmt": None,
                **{**auth, "mime_blocked": True},
            }
    if is_image_page(cfg, host, page):
        image_id, w, h, fmt, caption = image_meta(cfg, host, page)
        body = (
            encode_image(_pixels_for_id(image_id, w, h), fmt)
            if status == 200 else None
        )
        ph = phash64(_pixels_for_id(image_id, w, h)) if status == 200 else None
        return {
            "url": url, "status_code": status,
            "content_type": f"image/{fmt}" if status == 200 else None,
            "body": body, "links": [], "latency_ms": latency,
            "image_id": image_id, "caption": caption, "phash": ph,
            "w": w, "h": h, "fmt": fmt, **auth,
        }
    content_type, body = page_payload(cfg, host, page)
    if status != 200:
        return {
            "url": url, "status_code": status, "content_type": None,
            "body": None, "links": [], "latency_ms": latency,
            "image_id": None, "caption": None, "phash": None,
            "w": None, "h": None, "fmt": None, **auth,
        }
    # the engine extracts links by PARSING the body (F7-F9), exactly as
    # the reference parses fetched HTML/feeds/sitemaps — not by reading
    # a side channel.  fetch_one returns the parsed links so the
    # pure-Python simulator sees the identical link stream.
    from ..functions.extract import extract_links

    links = extract_links(url, content_type, body)
    return {
        "url": url, "status_code": status,
        "content_type": content_type,
        "body": body,
        "links": links, "latency_ms": latency,
        "image_id": None, "caption": None, "phash": None,
        "w": None, "h": None, "fmt": None, **auth,
    }


def page_kind(cfg: WebConfig, host: int, page: int) -> str:
    """html | atom | sitemap (images handled separately)."""
    if host % 4 == 1 and page == 1:
        return "sitemap"
    if host % 5 == 2 and page == 2:
        return "atom"
    return "html"


def page_payload(cfg: WebConfig, host: int, page: int) -> tuple[str, bytes]:
    """Render the page body in its content type; links are embedded in
    the markup and must be recovered by parsing (F7-F9)."""
    links = out_links(cfg, host, page)
    kind = page_kind(cfg, host, page)
    if kind == "sitemap":
        locs = "\n".join(f"  <url><loc>{u}</loc></url>" for u in links)
        xml = (
            '<?xml version="1.0"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            f"{locs}\n</urlset>"
        )
        return "application/xml", xml.encode()
    if kind == "atom":
        entries = "\n".join(
            f'  <entry><link href="{u}"/><title>e</title></entry>'
            for u in links
        )
        xml = (
            '<?xml version="1.0"?>\n'
            '<feed xmlns="http://www.w3.org/2005/Atom">\n'
            f"<title>feed {host}/{page}</title>\n{entries}\n</feed>"
        )
        return "application/atom+xml", xml.encode()
    # html: same-host links rendered relative (resolved against <base>),
    # cross-host links absolute — exercises F7's base handling
    own = f"http://h{host}.example"
    hrefs = "\n".join(
        f'  <a href="{u[len(own):] if u.startswith(own + "/") else u}">x</a>'
        for u in links
    )
    html = (
        f"<html><head><base href=\"http://h{host}.example/\"></head>\n"
        f"<body><h1>page {host}/{page}</h1>\n{hrefs}\n</body></html>"
    )
    return "text/html", html.encode()


FETCH_SCHEMA = (
    "url string, status_code int, content_type string, body binary, "
    "links array<string>, latency_ms int, image_id string, caption string, "
    "phash long, w int, h int, fmt string, authenticated boolean, "
    "session_token string, mime_blocked boolean, proxy_url string"
)

_HOST_RE = re.compile(r"^https?://([^/]+)")


def make_fetch_batches(cfg: WebConfig, passthrough: tuple[str, ...] = (),
                       sessions: dict[str, str] | None = None,
                       mime_allow=None):
    """mapInPandas kernel: frontier batch in → response rows out.

    ``passthrough`` columns (e.g. job_id/cost/url_hash) are copied onto
    the output so downstream stages don't need a re-join.
    ``sessions``: host → login session token (per-job cookie-jar
    analogue); shipped via closure — it holds only CREDENTIALED hosts
    (reference domain_login table), which is a tiny config dimension,
    not O(#hosts crawled).
    ``mime_allow``: optional content-type predicate — the MIME download
    gate (see ``fetch_one``); blocked rows surface with
    ``mime_blocked=true`` and no body.
    """
    sessions = sessions or {}

    def _batches(it):
        for pdf in it:
            rows = []
            for u in pdf["url"]:
                hm = _HOST_RE.match(u)
                tok = sessions.get(hm.group(1)) if hm else None
                rows.append(fetch_one(cfg, u, tok, mime_allow=mime_allow))
            out = pd.DataFrame(rows)
            # nullable Int32: exception rows carry status_code = NULL
            out["status_code"] = out["status_code"].astype("Int32")
            out["latency_ms"] = out["latency_ms"].astype("int32")
            # per-row proxy routing (reference downloader.py:266 asks
            # the policy for each request's proxy): the popped batch
            # arrives pre-stamped by policy.proxy_expr; the kernel
            # records the route it fetched through
            out["proxy_url"] = (
                pdf["proxy_url"].values if "proxy_url" in pdf.columns
                else None
            )
            for c in passthrough:
                out[c] = pdf[c].values
            yield out

    return _batches


def fetch_schema_with(passthrough_ddl: str = "") -> str:
    return FETCH_SCHEMA + (", " + passthrough_ddl if passthrough_ddl else "")
