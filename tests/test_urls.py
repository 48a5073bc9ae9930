"""URL canonicalization + hash golden vectors.

Expectations pinned from the reference's behavior
(/root/reference/tests/test_policy.py:541-570 — see SURVEY.md F1/F2,
FIXTURES.md §10); implementation is original.
"""

import hashlib

from starbelly_spark.functions.urls import (
    blake2b_16,
    canonicalize_url,
    url_hash,
    url_host,
)


def test_query_pairs_sorted():
    assert (
        canonicalize_url("http://a.com/?foo=2&foo=1&bar=3&PHPSESSID=4")
        == "http://a.com/?PHPSESSID=4&bar=3&foo=1&foo=2"
    )


def test_strip_params_then_sort():
    assert (
        canonicalize_url(
            "http://a.com/?foo=2&foo=1&bar=3&PHPSESSID=4",
            strip_params=("PHPSESSID",),
        )
        == "http://a.com/?bar=3&foo=1&foo=2"
    )


def test_host_lowercased_default_port_dropped():
    assert canonicalize_url("HTTP://EXAMPLE.com:80/Path") == "http://example.com/Path"
    assert canonicalize_url("https://example.com:443/") == "https://example.com/"
    assert canonicalize_url("https://example.com:8443/x") == "https://example.com:8443/x"


def test_fragment_removed_empty_path_slash():
    assert canonicalize_url("http://a.com#frag") == "http://a.com/"
    assert canonicalize_url("http://a.com/x#frag") == "http://a.com/x"


def test_idempotent():
    u = "http://A.com:80/a/../b/?z=1&a=2#f"
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


def test_dot_segments_collapsed():
    assert canonicalize_url("http://a.com/a/../b/./c") == "http://a.com/b/c"


def test_blank_query_value_kept():
    assert canonicalize_url("http://a.com/?a=&b=1") == "http://a.com/?a=&b=1"


def test_url_host():
    assert url_host("http://User@Sub.Example.COM:8080/p") == "sub.example.com"
    assert url_host("not a url ::") == ""


def test_blake2b16_matches_hashlib():
    data = b"http://a.com/"
    assert blake2b_16(data) == hashlib.blake2b(data, digest_size=16).digest()
    assert len(url_hash("http://a.com/")) == 16


def test_malformed_url_passthrough():
    # unparseable URLs surface unchanged; scheme filter drops them later
    assert canonicalize_url("http://[bad") == "http://[bad"
