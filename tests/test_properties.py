"""Property-based tests (SURVEY.md §5.2 layer 2, hypothesis)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from opps_feedcrawler_ray.functions.extract import extract_text, normalize_ws, parse_links
from opps_feedcrawler_ray.functions.hashing import fingerprint64
from opps_feedcrawler_ray.functions.robots import parse_robots
from opps_feedcrawler_ray.functions.sketch import HyperLogLog
from opps_feedcrawler_ray.functions.text import jaccard, minhash_signature, shingles, simhash
from opps_feedcrawler_ray.functions.urlnorm import canonicalize_url, extract_host, surt_form
from opps_feedcrawler_ray.state.cuckoo import CuckooFilter

# URL pieces that stay within http(s) space
_hosts = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_paths = st.from_regex(r"(/[A-Za-z0-9._~%\-]{0,8}){0,4}", fullmatch=True)
_queries = st.from_regex(r"([a-z]{1,4}=[A-Za-z0-9%]{0,6}(&[a-z]{1,4}=[A-Za-z0-9]{0,6}){0,3})?", fullmatch=True)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "Http"]),
    host=_hosts,
    port=st.sampled_from(["", ":80", ":443", ":8080"]),
    path=_paths,
    query=_queries,
    frag=st.sampled_from(["", "#x", "#frag"]),
)
@settings(max_examples=300, deadline=None)
def test_canonicalize_idempotent_and_stable(scheme, host, port, path, query, frag):
    url = f"{scheme}://{host}{port}{path}"
    if query:
        url += f"?{query}"
    url += frag
    c = canonicalize_url(url)
    assert c is not None
    # idempotence: canon(canon(u)) == canon(u)
    assert canonicalize_url(c) == c
    # no fragment survives; scheme+host lowercased
    assert "#" not in c
    h = extract_host(c)
    assert h == h.lower()
    # surt is deterministic and recoverable-ordered
    assert surt_form(c) == surt_form(c)


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "hTTp", "ftp"]),
    host=st.from_regex(r"[A-Za-z0-9_.\-]{1,12}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":0080", ":8080", ":"]),
    path=st.from_regex(r"(/(\.|\.\.|[A-Za-z0-9._~%\- ]{0,6})){0,4}/?", fullmatch=True),
    query=st.sampled_from(["", "?", "?a=1", "?a=%2f", "?a?b", "?%zz", "? x"]),
    frag=st.sampled_from(["", "#f"]),
    user=st.sampled_from(["", "u@", "u:p@"]),
)
@settings(max_examples=500, deadline=None)
def test_full_canon_equals_composed(scheme, host, port, path, query, frag, user):
    """_full_canon (the one-parse batch kernel) must be byte-identical to
    composing the three public functions, including None cases."""
    from opps_feedcrawler_ray.functions.urlnorm import _full_canon

    u = f"{scheme}://{user}{host}{port}{path}{query}{frag}"
    t = _full_canon(u)
    c = canonicalize_url(u)
    if c is None:
        assert t is None, u
    else:
        assert t == (c, surt_form(c), extract_host(c)), u


def test_full_canon_ipv6_and_edges():
    from opps_feedcrawler_ray.functions.urlnorm import _full_canon

    for u in (
        "http://[2001:db8::1]/a", "https://[::1]:8443/x?q=1",
        "http://[::1]:443/x", "http://example.com.:8080/a/../b%41?x=%2F",
        "http://:80/x", "not-a-url", "", "ftp://h/a",
    ):
        t = _full_canon(u)
        c = canonicalize_url(u)
        if c is None:
            assert t is None, u
        else:
            assert t == (c, surt_form(c), extract_host(c)), u


@given(
    scheme=st.sampled_from(["http", "https", "HTTP", "hTTp", "ftp"]),
    host=st.from_regex(r"[A-Za-z0-9_.\-]{1,12}", fullmatch=True),
    port=st.sampled_from(["", ":80", ":443", ":0080", ":8080", ":"]),
    path=st.from_regex(r"(/(\.|\.\.|[A-Za-z0-9._~%\- ]{0,6})){0,4}/?", fullmatch=True),
    query=st.sampled_from(["", "?", "?a=1", "?a=%2f", "?a?b", "?%zz", "? x"]),
    tail=st.sampled_from(["", "#f", "\n", " ", "\t", "\x0c", "\xa0", "\x85", "\x1f", " "]),
    lead=st.sampled_from(["", " ", "\n", "\x0c", "\xa0"]),
)
@settings(max_examples=500, deadline=None)
def test_fast_canon_equals_full_path(scheme, host, port, path, query, tail, lead):
    """The _fast_canon regex shortcut must be byte-identical to the full
    RFC 3986 path WHENEVER it claims a match (falling back is always
    allowed; answering differently never is)."""
    from opps_feedcrawler_ray.functions import urlnorm

    u = f"{lead}{scheme}://{host}{port}{path}{query}{tail}"
    f = urlnorm._fast_canon(u)
    if f is not None:
        c = urlnorm.canonicalize_url(u)
        assert c is not None
        assert f == (c, urlnorm.surt_form(c), urlnorm.extract_host(c))


def test_fast_canon_directed_edges():
    """Boundary cases for the fast path: each must either fall back or
    agree exactly with the full path."""
    from opps_feedcrawler_ray.functions import urlnorm

    cases = [
        "http://example.com",              # empty path -> '/'
        "http://example.com?q=1",          # empty path + query
        "http://example.com/a.html",       # dot inside segment stays fast
        "http://example.com/a/./b",        # dot-segment -> fallback
        "http://example.com/a/../b",       # dotdot -> fallback
        "http://example.com/...",          # triple dot -> conservative fallback
        "http://example.com./a",           # trailing-dot host -> fallback
        "http://EXAMPLE.com/a",            # uppercase host -> fallback
        "http://example.com:80/a",         # default port -> fallback
        "http://example.com:8080/a",       # explicit port -> fallback
        "http://user@example.com/a",       # userinfo -> fallback
        "http://example.com/a%2Fb",        # pct -> fallback
        "http://example.com/a?",           # bare '?' -> fallback
        "http://example.com/a#f",          # fragment -> fallback
        "http://example.com/a\n",          # trailing newline
        "http://example.com/a b",          # space in path -> fallback
        "http://example.com/a\x0c",        # trailing form-feed (str.strip ws) -> fallback
        "http://example.com/a\xa0",        # trailing NBSP -> fallback
        "http://example.com/a\x85",        # trailing NEL -> fallback
        "http://example.com/a\x1f",        # \x1f is NOT str.strip-ws; both paths keep it
        "http://example.com/a ",      # trailing line separator -> fallback
        "http://example.com/a?x=1\x0c",    # trailing ws in query -> fallback
        "https://h/",
        "https://my_host.test/x",
    ]
    for u in cases:
        f = urlnorm._fast_canon(u)
        c = urlnorm.canonicalize_url(u)
        if f is not None:
            assert c is not None, u
            assert f == (c, urlnorm.surt_form(c), urlnorm.extract_host(c)), u


_HTML_PIECES = st.sampled_from(
    [
        "plain text ",
        "x > y ",
        "a < b ",
        "&amp; ",
        "&",
        "<p>", "</p>", "<P>", "</ p>",
        "<div class=\"x\">", "</div>",
        "<a href=\"http://h.test/a\">", "<a href='rel/b'>", "<a href=bare>",
        "<a HREF=\"http://h.test/c\" href=\"http://h.test/d\">",
        "<a href=\"\">", "<a>", "</a>",
        "<br>", "<br/>", "<hr />",
        "<head>", "</head>", "<title>t</title>",
        "<script>var a = 1 < 2;</script>", "<style>a{}</style>",
        "<noscript>", "</noscript>", "<svg>", "</svg>",
        "<!-- comment -->", "<!DOCTYPE html>", "<?php x ?>",
        "<img src=\"i.png\"/>", "<span data-x='1'>", "</span>",
        "<weird-tag>", "<a href=\"x>y\">", "<a href =\"q\" >",
        "<ul><li>item</li></ul>", "text\nwith\nnewlines ",
        "<p", "p>", "</", "<>", "< a>",
    ]
)


@given(st.lists(_HTML_PIECES, min_size=0, max_size=12))
@settings(max_examples=400, deadline=None)
def test_fast_html_extract_equals_parser(pieces):
    """The regex fast tokenizer must be byte-identical to the
    html.parser path whenever it claims a match (None = fallback is
    always allowed; a differing answer never is) — for BOTH the text and
    the href list."""
    from html.parser import HTMLParser  # noqa: F401  (documents intent)

    from opps_feedcrawler_ray.functions import extract as ex

    s = "".join(pieces)
    fast = ex._fast_extract_html(s)
    if fast is None:
        return
    p = ex._TextExtractor()
    p.feed(s)
    p.close()
    assert "".join(fast[0]) == "".join(p.parts), s
    assert fast[1] == p.hrefs, s


@given(
    st.text(
        alphabet=" \t\r\f\v\n\xa0\x85 ab.!",
        max_size=120,
    )
)
@settings(max_examples=400, deadline=None)
def test_normalize_ws_fast_equals_regex(s):
    """normalize_ws's str.split fast path must equal the frozen regex
    definition byte-for-byte, including unicode-whitespace edges."""
    import re as _re

    from opps_feedcrawler_ray.functions.extract import normalize_ws

    ws_run = _re.compile(r"[ \t\r\f\v]+")
    ref = "\n".join(
        ln for ln in (x.strip() for x in ws_run.sub(" ", s).split("\n")) if ln
    )
    assert normalize_ws(s) == ref


@given(
    st.text(
        alphabet="ab1/?&=._~%-:;@!$'()*+,#\\ \tA",
        max_size=30,
    ),
    st.sampled_from(["http://", "https://", "HTTP://", ""]),
)
@settings(max_examples=500, deadline=None)
def test_abs_href_fast_path_equals_urljoin(tail, scheme):
    """_ABS_HREF_RE may only claim hrefs for which urljoin is the
    identity (after the fragment-strip the slow path applies)."""
    from urllib.parse import urljoin

    from opps_feedcrawler_ray.functions.extract import _ABS_HREF_RE

    href = scheme + tail
    if _ABS_HREF_RE.match(href):
        base = "http://base.example/dir/page?q=1"
        assert urljoin(base, href) == href
        assert "#" not in href  # fast path never needs the fragment strip


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_fingerprint_deterministic(s):
    assert fingerprint64(s) == fingerprint64(s)
    assert 0 <= fingerprint64(s) < 2**64


@given(st.binary(max_size=500))
@settings(max_examples=150, deadline=None)
def test_extractor_never_crashes(b):
    """Any byte soup extracts to SOME string and link list, no exceptions."""
    t = extract_text("http://h.example/x", b)
    assert isinstance(t, str)
    links = parse_links("http://h.example/x", b)
    assert all(u.startswith(("http://", "https://")) for u in links)


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_normalize_ws_idempotent(s):
    assert normalize_ws(normalize_ws(s)) == normalize_ws(s)


@given(st.lists(st.integers(min_value=1, max_value=2**63), min_size=1, max_size=300, unique=True))
@settings(max_examples=100, deadline=None)
def test_cuckoo_never_false_negative(keys):
    f = CuckooFilter(capacity=512)  # deliberately small → exercises overflow
    for k in keys:
        f.add(k)
    assert all(f.contains(k) for k in keys)
    g = CuckooFilter.from_bytes(f.to_bytes())
    assert all(g.contains(k) for k in keys)


@given(st.lists(st.integers(min_value=1, max_value=2**63), min_size=1, max_size=300, unique=True))
@settings(max_examples=100, deadline=None)
def test_bloom_never_false_negative(keys):
    from opps_feedcrawler_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=64)  # deliberately undersized → saturating bits
    ka = np.array(keys, dtype=np.uint64)
    f.add_batch(ka)
    assert f.contains_batch(ka).all()
    g = BloomFilter.from_bytes(f.to_bytes())
    assert g.contains_batch(ka).all()
    # scalar/batch agreement
    assert all(g.contains(int(k)) for k in keys)


@given(st.text(alphabet="abcdef /\n", max_size=200), _paths)
@settings(max_examples=150, deadline=None)
def test_robots_never_crashes_and_robots_txt_fetchable(body, path):
    r = parse_robots("User-agent: *\n" + body)
    assert isinstance(r.allowed(path or "/"), bool)
    assert r.allowed("/robots.txt")


@given(st.text(min_size=0, max_size=400))
@settings(max_examples=100, deadline=None)
def test_minhash_identical_docs_agree(text):
    """Identical text → identical signature; jaccard(self)=1."""
    a, b = shingles(text), shingles(text)
    assert jaccard(a, b) == 1.0 or (not a and not b)
    assert (minhash_signature(a) == minhash_signature(b)).all()
    assert simhash(text) == simhash(text)


@given(st.lists(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=2000))
@settings(max_examples=30, deadline=None)
def test_hll_merge_equals_union(vals):
    """Sketch mergeability: merge(h(A), h(B)) == h(A ∪ B) exactly."""
    half = len(vals) // 2
    ha, hb, hu = HyperLogLog(p=10), HyperLogLog(p=10), HyperLogLog(p=10)
    ha.add_values(vals[:half])
    hb.add_values(vals[half:])
    hu.add_values(vals)
    assert (ha.merge(hb).reg == hu.reg).all()


# --- rel=canonical differential fuzz --------------------------------------
def _reference_canonical(url: str, html_text: str):
    """HTMLParser-based reference for extract_canonical's documented
    semantics: first <link> in document order whose rel token list
    contains 'canonical' and that has a non-empty href; relative hrefs
    resolve against the page URL; only http(s) results count."""
    from html.parser import HTMLParser
    from urllib.parse import urljoin

    found: list[str] = []

    class _P(HTMLParser):
        def handle_starttag(self, tag, attrs):
            if tag != "link" or found:
                return
            d = {}
            for k, v in attrs:
                if k not in d:  # first occurrence wins, like the regex
                    d[k] = v
            rel = (d.get("rel") or "")
            if "canonical" not in rel.lower().split():
                return
            href = (d.get("href") or "").strip()
            if not href:
                return
            absu = urljoin(url, href).split("#", 1)[0]
            if absu.split(":", 1)[0].lower() in ("http", "https"):
                found.append(absu)

    p = _P()
    p.feed(html_text)
    p.close()
    return found[0] if found else None


_ATTR_VAL = st.text(
    alphabet=st.sampled_from(list("abc/:.?=&%")), min_size=0, max_size=8
)
_REL_VAL = st.sampled_from(
    ["canonical", "alternate canonical", "CANONICAL", "stylesheet",
     "alternate", "canonical alternate", ""]
)


@given(
    rel=_REL_VAL,
    href=_ATTR_VAL,
    decoy=_ATTR_VAL,
    order=st.permutations(["rel", "href", "data-href"]),
    quote=st.sampled_from(['"', "'"]),
    extra_tag=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_extract_canonical_matches_htmlparser_reference(
    rel, href, decoy, order, quote, extra_tag
):
    from opps_feedcrawler_ray.functions.extract import extract_canonical

    q = quote
    parts = {
        "rel": f"rel={q}{rel}{q}",
        "href": f"href={q}{href}{q}",
        "data-href": f"data-href={q}{decoy}{q}",
    }
    tag = "<link " + " ".join(parts[k] for k in order) + ">"
    pre = '<link rel="stylesheet" href="/s.css">' if extra_tag else ""
    html = f"<html><head>{pre}{tag}</head><body><p>x</p></body></html>"
    url = "http://h.example/dir/page"
    got = extract_canonical(url, html.encode())
    want = _reference_canonical(url, html)
    assert got == want, (tag, got, want)


def test_quantile_sketch_certificate_fuzz():
    """MRL sketch certificate under adversarial shapes: random merge
    trees over skewed / constant / shard-sorted parts — rank() stays
    within err_bound and quantile() within q_err_bound everywhere."""
    import numpy as np

    from opps_feedcrawler_ray.functions.sketch import QuantileSketch

    rng = np.random.default_rng(42)
    for trial in range(10):
        k = int(rng.choice([16, 32, 64]))
        nb = int(rng.integers(1, 40))
        dist = ["normal", "lognormal", "constant", "zipfy", "sorted"][trial % 5]
        parts = []
        for _ in range(nb):
            n = int(rng.integers(1, 2000))
            if dist == "normal":
                v = rng.normal(0, 1, n)
            elif dist == "lognormal":
                v = rng.lognormal(0, 3, n)
            elif dist == "constant":
                v = np.full(n, 7.0)
            elif dist == "zipfy":
                v = np.floor(rng.pareto(0.5, n))
            else:
                v = np.sort(rng.uniform(0, 1, n)) + len(parts)
            parts.append(v)
        sks = [QuantileSketch.from_values(p, k=k) for p in parts]
        while len(sks) > 1:
            i, j = sorted(rng.choice(len(sks), 2, replace=False))
            sks[i] = sks[i].merge(sks.pop(j))
        sk = sks[0]
        u = np.sort(np.concatenate(parts))
        n_all = len(u)
        assert abs(sk.total - n_all) < 1e-6
        for x in u[:: max(1, n_all // 40)]:
            tr = np.searchsorted(u, x, side="right")
            assert abs(sk.rank(x) - tr) <= sk.err_bound + 1e-6
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = sk.quantile(q)
            tr = np.searchsorted(u, est, side="right")
            tl = np.searchsorted(u, est, side="left")
            dev = 0 if tl <= q * n_all <= tr else min(abs(tl - q * n_all), abs(tr - q * n_all))
            assert dev <= sk.q_err_bound + 1e-6
