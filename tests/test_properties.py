"""Property-based tests (hypothesis) for the pure kernels: the
invariants that must hold on ANY input, not just the golden vectors."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from starbelly_spark.functions.images import decode_image, encode_image, psnr
from starbelly_spark.functions.urls import canonicalize_url, url_hash, url_host
from starbelly_spark.seen import BlockedBloom, CuckooFilter, _as_matrix

_path_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "/-._~%",
    max_size=30,
)
_host_chars = st.text(
    alphabet=string.ascii_lowercase + string.digits + ".-",
    min_size=1, max_size=20,
).filter(lambda h: not h.startswith((".", "-")))
_query_chars = st.text(
    alphabet=string.ascii_letters + string.digits + "=&;+%",
    max_size=30,
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https"]))
    host = draw(_host_chars)
    path = draw(_path_chars)
    query = draw(_query_chars)
    frag = draw(st.text(alphabet=string.ascii_letters, max_size=8))
    u = f"{scheme}://{host}/{path}"
    if query:
        u += f"?{query}"
    if frag:
        u += f"#{frag}"
    return u


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent(u):
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


@given(urls())
@settings(max_examples=300, deadline=None)
def test_canonicalize_drops_fragment_and_keeps_host(u):
    c = canonicalize_url(u)
    assert "#" not in c
    assert url_host(c) == url_host(u).lower()


@given(urls(), urls())
@settings(max_examples=100, deadline=None)
def test_url_hash_is_16_bytes_and_injective_ish(a, b):
    ha, hb = url_hash(canonicalize_url(a)), url_hash(canonicalize_url(b))
    assert len(ha) == 16 and len(hb) == 16
    if canonicalize_url(a) != canonicalize_url(b):
        assert ha != hb   # blake2b collision would be astronomical


@given(st.lists(st.binary(min_size=16, max_size=16), min_size=1,
                max_size=200, unique=True),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(hashes, salt):
    f = BlockedBloom(1 << 13, salt)
    mat = _as_matrix(hashes)
    f.add(mat)
    assert f.contains(mat).all()


@given(st.lists(st.binary(min_size=16, max_size=16), min_size=1,
                max_size=150, unique=True),
       st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=50, deadline=None)
def test_cuckoo_contains_all_when_not_overflowed(hashes, salt):
    f = CuckooFilter(1 << 8, salt)   # 1024 slots >> 150 items
    mat = _as_matrix(hashes)
    fails = f.add(mat)
    assert fails == 0 and not f.overflowed
    assert f.contains(mat).all()
    f.delete(mat)
    assert not f.contains(mat).any()


@given(st.integers(min_value=1, max_value=2**31 - 1),
       st.integers(min_value=4, max_value=32),
       st.integers(min_value=4, max_value=32),
       st.sampled_from(["png", "jpeg", "webp"]))
@settings(max_examples=50, deadline=None)
def test_image_codec_psnr_bound(seed, w, h, fmt):
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(seed))
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    dec = decode_image(encode_image(px, fmt))
    assert dec.shape == px.shape
    assert psnr(px, dec) >= 40.0
