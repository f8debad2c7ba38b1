"""Unit tests for the pure-function core (SURVEY.md §5.2 layer 1)."""

from __future__ import annotations

import numpy as np
import pytest

from opps_feedcrawler_ray.functions.extract import (
    detect_kind,
    extract_text,
    normalize_ws,
    parse_links,
)
from opps_feedcrawler_ray.functions.hashing import fingerprint64, fingerprint64_batch
from opps_feedcrawler_ray.functions.robots import parse_robots
from opps_feedcrawler_ray.functions.urlnorm import (
    canonicalize_url,
    extract_host,
    surt_form,
)
from opps_feedcrawler_ray.state.cuckoo import CuckooFilter

# ---------------------------------------------------------------- urlnorm

CANON_CASES = [
    # RFC 3986 §6.2.2 syntax-based normalization examples
    ("HTTP://www.EXAMPLE.com/", "http://www.example.com/"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a/./b/../c", "http://example.com/a/c"),
    ("http://example.com/%7Euser", "http://example.com/~user"),
    ("http://example.com/%7euser", "http://example.com/~user"),
    ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a?q=1&b=2", "http://example.com/a?q=1&b=2"),
    ("http://user:pw@example.com/a", "http://example.com/a"),
    ("http://example.com./a", "http://example.com/a"),
    ("http://example.com/../a", "http://example.com/a"),
    ("http://example.com/%41", "http://example.com/A"),
    ("http://example.com/100%", "http://example.com/100%25"),
    ("  http://example.com/a  ", "http://example.com/a"),
]


@pytest.mark.parametrize("raw,canon", CANON_CASES)
def test_canonicalize(raw, canon):
    assert canonicalize_url(raw) == canon


def test_canonicalize_rejects():
    assert canonicalize_url("ftp://example.com/a") is None
    assert canonicalize_url("mailto:a@b.c") is None
    assert canonicalize_url("javascript:void(0)") is None
    assert canonicalize_url("") is None
    assert canonicalize_url("http://") is None


def test_canonicalize_idempotent():
    for raw, _ in CANON_CASES:
        c = canonicalize_url(raw)
        assert canonicalize_url(c) == c


def test_surt():
    assert surt_form("http://www.example.com/a?q=1") == "com,example,www)/a?q=1"
    assert surt_form("http://example.com:8080/") == "com,example:8080)/"
    assert surt_form("http://host5.example/p/3") == "example,host5)/p/3"


def test_extract_host():
    assert extract_host("http://www.example.com/a") == "www.example.com"
    assert extract_host("http://example.com:8080/a") == "example.com"


# ---------------------------------------------------------------- hashing


def test_fingerprint_pinned():
    # pinned goldens — blake2b-8byte little-endian (FROZEN; see hashing.py)
    import hashlib

    for s in ["http://example.com/", "a", ""]:
        exp = int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "little")
        assert fingerprint64(s) == exp
    assert fingerprint64("http://example.com/") != fingerprint64("http://example.com/a")


def test_fingerprint_batch_matches_scalar():
    urls = [f"http://h{i}.example/p/{i}" for i in range(100)]
    batch = fingerprint64_batch(urls)
    assert batch.dtype == np.uint64
    assert [int(x) for x in batch] == [fingerprint64(u) for u in urls]


# ---------------------------------------------------------------- extract


def test_extract_html_strips_script_and_head():
    html = (
        b"<html><head><title>T</title><script>var x=1;</script></head>"
        b"<body><p>Hello &amp; welcome</p><div>World</div>"
        b"<style>p{}</style><script>bad()</script><p>End</p></body></html>"
    )
    assert extract_text("http://h/x", html) == "Hello & welcome\nWorld\nEnd"


def test_extract_ws_collapse():
    html = b"<body><p>  a   b  </p>\n\n<p>c</p></body>"
    assert extract_text("http://h/x", html) == "a b\nc"


def test_extract_rss():
    rss = (
        b'<?xml version="1.0"?><rss version="2.0"><channel><title>Feed T</title>'
        b"<item><title>I1</title><description>D1 &amp; more</description></item>"
        b"<item><title>I2</title><description>D2</description></item>"
        b"</channel></rss>"
    )
    assert detect_kind("http://h/feed.xml", rss) == "rss"
    assert extract_text("http://h/feed.xml", rss) == "Feed T\nI1\nD1 & more\nI2\nD2"


def test_extract_atom():
    atom = (
        b'<feed xmlns="http://www.w3.org/2005/Atom"><title>A</title>'
        b"<entry><title>E1</title><summary>S1</summary></entry></feed>"
    )
    assert detect_kind("http://h/atom.xml", atom) == "atom"
    assert extract_text("http://h/atom.xml", atom) == "A\nE1\nS1"


def test_extract_malformed_html_no_crash():
    html = b"<p>unclosed <div>nested <b>deep</p> text"
    out = extract_text("http://h/x", html)
    assert "unclosed" in out and "text" in out


def test_detect_robots():
    assert detect_kind("http://h/robots.txt", b"User-agent: *\nDisallow:") == "robots"
    assert extract_text("http://h/robots.txt", b"User-agent: *") == ""


def test_parse_links():
    html = (
        b'<body><a href="/a">A</a><a href="b/c.html">B</a>'
        b'<a href="http://Other.example:80/Z">C</a><a href="/a">dup</a>'
        b'<a href="mailto:x@y.z">no</a><a href="#frag">no</a></body>'
    )
    links = parse_links("http://host.example/dir/page.html", html)
    assert links == [
        "http://host.example/a",
        "http://host.example/dir/b/c.html",
        "http://Other.example:80/Z",
    ]


def test_parse_links_rss():
    rss = (
        b'<rss version="2.0"><channel><title>T</title>'
        b"<item><link>http://h.example/x</link></item></channel></rss>"
    )
    assert parse_links("http://h.example/feed", rss) == ["http://h.example/x"]


def test_normalize_ws():
    assert normalize_ws("  a\t b \n\n\n c ") == "a b\nc"


# ---------------------------------------------------------------- robots


ROBOTS = b"""
# comment
User-agent: *
Disallow: /private/
Allow: /private/ok.html
Disallow: /tmp$
Crawl-delay: 2
User-agent: otherbot
Disallow: /
"""


def test_robots_matrix():
    r = parse_robots(ROBOTS)
    assert r.allowed("/")
    assert r.allowed("/public/x")
    assert not r.allowed("/private/secret.html")
    assert r.allowed("/private/ok.html")  # longer Allow wins
    assert not r.allowed("/tmp")
    assert r.allowed("/tmp/file")  # $ anchor
    assert r.allowed("/robots.txt")
    assert r.crawl_delay == 2.0


def test_robots_agent_groups():
    r = parse_robots(ROBOTS, agent="otherbot")
    assert not r.allowed("/anything")
    r2 = parse_robots(b"User-agent: somebody\nDisallow: /")
    assert r2.allowed("/x")  # no *-group, no our-group → allow all


def test_robots_wildcard():
    r = parse_robots(b"User-agent: *\nDisallow: /*.pdf$")
    assert not r.allowed("/doc/file.pdf")
    assert r.allowed("/doc/file.pdfx")


def test_robots_tie_allow_wins():
    r = parse_robots(b"User-agent: *\nDisallow: /page\nAllow: /page")
    assert r.allowed("/page")


def test_robots_roundtrip():
    r = parse_robots(ROBOTS)
    r2 = type(r).from_tuple(r.to_tuple())
    assert not r2.allowed("/private/secret.html")
    assert r2.allowed("/private/ok.html")


# ---------------------------------------------------------------- cuckoo


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=4096)
    rng = np.random.default_rng(42)
    keys = rng.integers(1, 2**63, size=4000, dtype=np.uint64)
    keys = np.unique(keys)
    for k in keys:
        assert f.add(int(k))
    for k in keys:
        assert f.contains(int(k))  # NEVER a false negative
    # re-add returns False (already present)
    assert not f.add(int(keys[0]))


def test_cuckoo_fp_rate():
    f = CuckooFilter(capacity=50_000)
    rng = np.random.default_rng(7)
    present = rng.integers(1, 2**62, size=40_000, dtype=np.uint64)
    for k in np.unique(present):
        f.add(int(k))
    probe = rng.integers(2**62, 2**63, size=20_000, dtype=np.uint64)
    fp = sum(f.contains(int(k)) for k in probe)
    assert fp / len(probe) < 0.01


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(capacity=1024)
    keys = [fingerprint64(f"u{i}") for i in range(900)]
    for k in keys:
        f.add(k)
    g = CuckooFilter.from_bytes(f.to_bytes())
    for k in keys:
        assert g.contains(k)
    assert g.count == f.count
    assert not g.add(keys[0])


def test_cuckoo_batch():
    f = CuckooFilter(capacity=1024)
    keys = np.array([fingerprint64(f"u{i}") for i in range(10)] * 2, dtype=np.uint64)
    mask = f.add_batch(keys)
    assert mask[:10].all() and not mask[10:].any()


def test_charset_sniffing():
    """Round-2 spec extension: BOM / XML decl / <meta charset> honored,
    UTF-8-replace fallback unchanged for undeclared pages."""
    from opps_feedcrawler_ray.functions.extract import (
        extract_feed_text,
        extract_html_text,
        sniff_charset,
    )

    latin = '<html><meta charset="iso-8859-1"><body><p>caf\xe9</p></body></html>'.encode(
        "iso-8859-1"
    )
    assert sniff_charset(latin) == "iso-8859-1"
    assert extract_html_text(latin) == "caf\xe9"
    # no declaration → UTF-8 (frozen default, goldens unchanged)
    assert extract_html_text("<p>h\xe9llo</p>".encode()) == "h\xe9llo"
    # invalid UTF-8 without declaration → replacement chars, never a crash
    assert "�" in extract_html_text(b"<p>caf\xe9</p>")
    # UTF-8 BOM
    assert extract_html_text(b"\xef\xbb\xbf<p>ok</p>") == "ok"
    # XML encoding declaration drives the feed decode AND must not crash
    # ET (encoding decls in decoded strings raise ValueError otherwise)
    xml = (
        '<?xml version="1.0" encoding="iso-8859-1"?>'
        "<rss><channel><title>t\xebst</title></channel></rss>"
    ).encode("iso-8859-1")
    assert sniff_charset(xml) == "iso-8859-1"
    assert extract_feed_text(xml) == "t\xebst"
    # unknown charset name → fallback, no crash
    assert sniff_charset(b'<meta charset="no-such-enc"><p>x</p>') == "utf-8"


def test_extractor_registry_plugin():
    """§2.10 extension surface: a registered kind overrides extraction."""
    from opps_feedcrawler_ray.functions import extract as ex

    try:
        ex.register_extractor("html", lambda url, body: "CUSTOM")
        assert ex.extract_text("http://h/x", b"<p>ignored</p>") == "CUSTOM"
        assert ex.extract_page("http://h/x", b"<p>ignored</p>") == ("CUSTOM", [])
    finally:
        ex.EXTRACTOR_REGISTRY.pop("html", None)
    assert ex.extract_text("http://h/x", b"<p>back</p>") == "back"


# ----------------------------------------------------------------- bloom


def test_bloom_no_false_negatives():
    from opps_feedcrawler_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=4096)
    rng = np.random.default_rng(42)
    keys = np.unique(rng.integers(1, 2**63, size=4000, dtype=np.uint64))
    for k in keys:
        assert f.add(int(k))
    for k in keys:
        assert f.contains(int(k))  # NEVER a false negative
    assert not f.add(int(keys[0]))
    assert f.count == len(keys)


def test_bloom_fp_rate():
    from opps_feedcrawler_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=50_000)
    rng = np.random.default_rng(7)
    present = np.unique(rng.integers(1, 2**62, size=40_000, dtype=np.uint64))
    f.insert_batch(present)
    probe = rng.integers(2**62, 2**63, size=20_000, dtype=np.uint64)
    fp = int(f.contains_batch(probe).sum())
    assert fp / len(probe) < 0.01
    # design load: about half the bits set at n == capacity·0.8
    assert f.load_factor() < 0.55


def test_bloom_serialization_roundtrip_and_dispatch():
    from opps_feedcrawler_ray.state.bloom import BloomFilter, seen_filter_from_bytes

    f = BloomFilter(capacity=1024)
    keys = [fingerprint64(f"u{i}") for i in range(900)]
    for k in keys:
        f.add(k)
    g = seen_filter_from_bytes(f.to_bytes())
    assert isinstance(g, BloomFilter)
    for k in keys:
        assert g.contains(k)
    assert g.count == f.count
    assert not g.add(keys[0])
    # untagged (cuckoo) blobs dispatch to CuckooFilter — pre-bloom
    # checkpoints stay restorable
    c = CuckooFilter(capacity=256)
    c.add(keys[0])
    h = seen_filter_from_bytes(c.to_bytes())
    assert isinstance(h, CuckooFilter) and h.contains(keys[0])


def test_bloom_batch_first_occurrence():
    from opps_feedcrawler_ray.state.bloom import BloomFilter

    f = BloomFilter(capacity=1024)
    keys = np.array([fingerprint64(f"u{i}") for i in range(10)] * 2, dtype=np.uint64)
    mask = f.add_batch(keys)
    assert mask[:10].all() and not mask[10:].any()
    assert not f.add_batch(keys).any()



# --------------------------------------------------------------- sitemap


def test_sitemap_detect_extract_links():
    from opps_feedcrawler_ray.functions.extract import detect_kind, extract_text, parse_links

    sm = (
        b'<?xml version="1.0" encoding="UTF-8"?>\n'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>http://s.example/a</loc><lastmod>2024-01-01</lastmod></url>"
        b"<url><loc> http://s.example/b </loc></url>"
        b"<url><loc>http://s.example/a</loc></url>"  # dup → first-wins
        b"</urlset>"
    )
    url = "http://s.example/sitemap.xml"
    assert detect_kind(url, sm) == "sitemap"
    assert extract_text(url, sm) == ""  # no document text
    assert parse_links(url, sm) == ["http://s.example/a", "http://s.example/b"]
    # sitemap INDEX files link to child sitemaps the same way
    idx = (
        b"<sitemapindex><sitemap><loc>http://s.example/sm1.xml</loc></sitemap>"
        b"<sitemap><loc>http://s.example/sm2.xml</loc></sitemap></sitemapindex>"
    )
    assert detect_kind("http://s.example/sitemap_index.xml", idx) == "sitemap"
    assert parse_links("http://s.example/x", idx) == [
        "http://s.example/sm1.xml",
        "http://s.example/sm2.xml",
    ]
    # malformed XML → no links, no crash
    assert parse_links(url, b"<urlset><loc>broken") == []
    # html/rss detection unchanged (frozen goldens intact)
    assert detect_kind("http://h/x", b"<html><body>hi</body></html>") == "html"
    assert detect_kind("http://h/f", b"<rss><channel></channel></rss>") == "rss"


def test_trap_mask_directed():
    import pyarrow as pa

    from opps_feedcrawler_ray.functions.urlnorm import trap_mask

    urls = pa.array(
        [
            "http://h.example/",                          # root → keep
            "http://h.example/a/b/c",                     # shallow → keep
            "http://h.example/" + "d/" * 40,              # 40 deep → drop
            "http://h.example/cal/2024/cal/2024/cal/2024/cal/2024",  # repeat → drop
            "http://h.example/a/a/a",                     # 3 repeats = limit → keep
            "http://h.example/x?q=" + "z" * 3000,         # over-long → drop
        ]
    )
    keep = trap_mask(urls, max_url_len=2048, max_path_depth=32, max_segment_repeat=3)
    assert keep.tolist() == [True, True, False, False, True, False]
    assert trap_mask(pa.array([], pa.string())).shape == (0,)
    # query strings are exempt from depth/repeat: a return-url parameter
    # must not condemn a depth-1 redirect, and trailing slashes add no depth
    qs = pa.array(
        [
            "http://a.com/redirect?next=/x/y/x/y/x/y/x/y",
            "http://a.com/p?u=" + "/".join(f"s{i}" for i in range(40)),
            # exactly 32 DISTINCT segments (+ trailing slash) → keep
            "http://a.com/" + "/".join(f"s{i}" for i in range(32)) + "/",
        ]
    )
    assert trap_mask(qs).tolist() == [True, True, True]


def test_extract_sitemaps_directive():
    from opps_feedcrawler_ray.functions.robots import extract_sitemaps, parse_robots

    body = (
        b"User-agent: *\nDisallow: /priv/\n"
        b"Sitemap: http://h.example/sitemap.xml\n"
        b"sitemap: http://h.example/sitemap2.xml  # comment\n"
        b"Sitemap: http://h.example/sitemap.xml\n"  # dup → first-wins
        b"Sitemap:\n"  # empty → ignored
    )
    assert extract_sitemaps(body) == [
        "http://h.example/sitemap.xml",
        "http://h.example/sitemap2.xml",
    ]
    assert extract_sitemaps(b"User-agent: *\nDisallow: /") == []
    # rule parsing is untouched by the directive (frozen spec intact)
    r = parse_robots(body)
    assert not r.allowed("/priv/x") and r.allowed("/pub")


def test_binary_payload_hygiene():
    """PDF/PNG/JPEG/GIF payloads classify as 'binary': no text, no
    links — never shredded through the HTML parser."""
    from opps_feedcrawler_ray.functions.extract import (
        detect_kind,
        extract_page,
        extract_text,
        parse_links,
    )

    cases = [
        b"%PDF-1.7\n1 0 obj <a href=http://x/>",
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 16,
        b"\xff\xd8\xff\xe0JFIF",
        b"GIF89a\x00\x01",
    ]
    for body in cases:
        assert detect_kind("http://h/file", body) == "binary"
        assert extract_text("http://h/file", body) == ""
        assert parse_links("http://h/file", body) == []
        assert extract_page("http://h/file", body) == ("", [])
    # text payloads unaffected
    assert detect_kind("http://h/x", b"<html><p>hi</p></html>") == "html"


def test_warc_framing_robustness(tmp_path):
    """Content-Length framing must survive payloads that CONTAIN the
    record separator bytes, empty bodies, and unicode URLs — a find-based
    splitter would corrupt all three."""
    import datetime as dt

    import pyarrow as pa

    from opps_feedcrawler_ray.sources.io import parse_warc_records, write_pages_warc

    rows = [
        ("http://h.example/adversarial", b"<p>pre</p>\r\n\r\nWARC/1.0\r\n\r\n<p>post</p>"),
        ("http://h.example/empty", b""),
        ("http://h.example/unicode/é", b"<p>caf\xc3\xa9</p>"),
        ("http://h.example/binaryish", bytes(range(256))),
    ]
    t = pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "warc_ts": pa.array([dt.datetime(2024, 1, 2, 3, 4, 5)] * len(rows), pa.timestamp("us")),
            "html": pa.array([r[1] for r in rows], pa.binary()),
            "text": pa.array([""] * len(rows)),
            "lang": pa.array(["en"] * len(rows)),
        }
    )
    for gz in (True, False):
        p = str(tmp_path / (f"t{gz}.warc" + (".gz" if gz else "")))
        write_pages_warc(t, p, member_gzip=gz)
        back = parse_warc_records(open(p, "rb").read())
        assert back.num_rows == len(rows)
        assert back["url"].to_pylist() == [r[0] for r in rows]
        assert back["html"].to_pylist() == [r[1] for r in rows]
        assert back["warc_ts"][0].as_py() == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_extract_canonical_matrix():
    """rel=canonical parsing: attribute order, quoting styles, relative
    resolution, first-declaration-wins, non-HTML kinds → None."""
    from opps_feedcrawler_ray.functions.extract import extract_canonical

    u = "http://h.example/dir/page"
    cases = [
        (b'<link rel="canonical" href="http://x.example/c">', "http://x.example/c"),
        (b"<link href='/c' rel='canonical'>", "http://h.example/c"),
        (b"<LINK REL=CANONICAL HREF=other>", "http://h.example/dir/other"),
        (b'<link rel="stylesheet" href="/s.css"><link rel=canonical href="/c2">',
         "http://h.example/c2"),
        (b'<link rel="canonical" href="/first"><link rel="canonical" href="/second">',
         "http://h.example/first"),
        (b'<link rel="canonical" href="/c#frag">', "http://h.example/c"),
        (b'<link rel="canonical" href="ftp://x/c">', None),
        (b'<link data-href="/wrong" rel="canonical" href="/right">',
         "http://h.example/right"),
        (b'<link rel=canonical data-href="/x">', None),
        (b'<link rel="alternate canonical" href="/c3">', "http://h.example/c3"),
        # ">" inside a quoted attribute must not truncate the tag
        (b'<link title="a>b" rel="canonical" href="/c4">', "http://h.example/c4"),
        # raw absolute form, like hrefs elsewhere — the offer path's
        # canonicalizer percent-encodes later
        (b'<link rel="canonical" href="/a>b">', "http://h.example/a>b"),
        (b'<link rel="canonical">', None),
        (b"<p>no links at all</p>", None),
    ]
    for body, want in cases:
        html = b"<html><head>" + body + b"</head><body>x</body></html>"
        assert extract_canonical(u, html) == want, body
    assert extract_canonical(u, b'<rss version="2.0"><channel><link>http://x/c</link></channel></rss>') is None


def test_extract_meta_refresh_matrix():
    """WHATWG refresh pragma parsing: quoting, attribute order, case,
    comma separator, delay gating, self-target, entity quoting, non-HTML."""
    from opps_feedcrawler_ray.functions.extract import extract_meta_refresh as f

    u = "http://a.com/x"
    assert f(u, b'<html><meta http-equiv="refresh" content="0; url=/y"></html>') == "http://a.com/y"
    # attribute order free, value case-insensitive, unquoted attrs
    assert f(u, b'<meta content="0;URL=http://b.com/z" http-equiv=Refresh>') == "http://b.com/z"
    # comma separator + spaces around url=
    assert f(u, b'<meta http-equiv="refresh" content="0,url = /comma">') == "http://a.com/comma"
    # quoted target inside the content value
    assert f(u, b"<meta http-equiv='refresh' content=\"0; url='/q'\">") == "http://a.com/q"
    # html-entity quotes around the target
    assert f(u, b'<meta http-equiv="refresh" content="0; url=&#39;/q&#39;">') == "http://a.com/q"
    # delay gating: 5s is not a redirect at max_delay=0, is at 10
    slow = b'<meta http-equiv="refresh" content="5; url=/y">'
    assert f(u, slow) is None
    assert f(u, slow, max_delay=10) == "http://a.com/y"
    # bare reload (no url) and self-target (fragment stripped) → None
    assert f(u, b'<meta http-equiv="refresh" content="0">') is None
    assert f(u, b'<meta http-equiv="refresh" content="0; url=http://a.com/x#f">') is None
    # name= meta must not match; non-http scheme rejected
    assert f(u, b'<meta name="x" content="0; url=/nope">') is None
    assert f(u, b'<meta http-equiv="refresh" content="0; url=ftp://a.com/f">') is None
    # first declaration in document order wins
    two = (b'<meta http-equiv="refresh" content="0; url=/first">'
           b'<meta http-equiv="refresh" content="0; url=/second">')
    assert f(u, two) == "http://a.com/first"
    # non-HTML kinds never redirect
    assert f("http://a.com/robots.txt", b"User-agent: *\n") is None


def test_strip_query_params_unit():
    from opps_feedcrawler_ray.functions.urlnorm import (
        compile_param_rules,
        strip_query_params,
    )

    ex, px = compile_param_rules(["utm_*", "gclid", "fbclid"])
    f = lambda u: strip_query_params(u, ex, px)
    assert f("http://a.com/p?utm_source=x&id=1") == "http://a.com/p?id=1"
    assert f("http://a.com/p?id=1&utm_medium=m&gclid=g") == "http://a.com/p?id=1"
    # all params stripped → '?' dropped
    assert f("http://a.com/p?utm_a=1&utm_b=2") == "http://a.com/p"
    # no query / no match → unchanged
    assert f("http://a.com/p") == "http://a.com/p"
    assert f("http://a.com/p?keep=1&also=2") == "http://a.com/p?keep=1&also=2"
    # exact match is not a prefix match: 'gclid2' survives 'gclid'
    assert f("http://a.com/p?gclid2=x") == "http://a.com/p?gclid2=x"
    # remaining order preserved; valueless params handled
    assert f("http://a.com/p?b=2&utm_x&a=1") == "http://a.com/p?b=2&a=1"


def test_extract_robots_directives_matrix():
    from opps_feedcrawler_ray.functions.extract import extract_robots_directives as f

    u = "http://h.example/dir/"
    # meta robots: comma list, case-insensitive name/content, whitespace
    assert f(u, b'<html><head><meta name=robots content="noindex, nofollow">'
                b"</head></html>") == (True, True, frozenset())
    assert f(u, b'<html><head><meta name="ROBOTS" content=" NOINDEX ">'
                b"</head></html>") == (True, False, frozenset())
    # none == noindex + nofollow
    assert f(u, b"<html><head><meta name=robots content=none></head></html>") == (
        True, True, frozenset())
    # attribute order free; multiple metas union (most restrictive wins)
    assert f(u, b'<html><head><meta content="noindex" name="robots">'
                b'<meta name="robots" content="nofollow"></head></html>') == (
        True, True, frozenset())
    # data-name decoy must NOT match; unrelated meta names ignored
    assert f(u, b'<html><head><meta data-name=robots content=noindex>'
                b'<meta name=viewport content=noindex></head></html>') == (
        False, False, frozenset())
    # rel=nofollow: token list, relative href resolution, unquoted attrs
    ni, nf, s = f(u, b'<html><body><a rel="external nofollow" href="/a">x</a>'
                     b'<a href="b">y</a><a rel=nofollow href=c>z</a></body></html>')
    assert (ni, nf) == (False, False)
    assert s == frozenset({"http://h.example/a", "http://h.example/dir/c"})
    # rel without nofollow, and href-less anchors, contribute nothing
    assert f(u, b'<html><body><a rel="external" href="/a">x</a>'
                b"<a rel=nofollow>bare</a></body></html>") == (
        False, False, frozenset())
    # page-level nofollow short-circuits the per-link scan
    assert f(u, b'<html><head><meta name=robots content=nofollow></head>'
                b'<body><a rel=nofollow href="/a">x</a></body></html>') == (
        False, True, frozenset())
    # non-HTML kinds never carry directives
    assert f("http://h.example/robots.txt", b"User-agent: *\nDisallow: /x") == (
        False, False, frozenset())
    # quoted '>' inside attribute values does not truncate the tag
    ni, nf, s = f(u, b'<html><body><a title="a > b" rel="nofollow" href="/q">'
                     b"x</a></body></html>")
    assert s == frozenset({"http://h.example/q"})
