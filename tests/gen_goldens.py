"""Golden-fixture generator (FIXTURES.md F3; SURVEY.md §5.3).

Writes tests/golden/: once generated, the files are COMMITTED and become
the frozen spec — tests diff current behavior against the committed
bytes, never against re-generation.  Regenerating and committing new
goldens is a breaking spec change and must be deliberate.

Run: python tests/gen_goldens.py   (needs Ray for the e2e crawl digest)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opps_feedcrawler_ray.functions.extract import extract_text
from opps_feedcrawler_ray.functions.hashing import fingerprint64
from opps_feedcrawler_ray.functions.robots import parse_robots
from opps_feedcrawler_ray.functions.urlnorm import canonicalize_url, surt_form

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

URL_CASES = [
    "HTTP://www.EXAMPLE.com/",
    "http://example.com",
    "http://example.com:80/a",
    "https://example.com:443/a",
    "http://example.com:8080/a",
    "http://example.com/a/./b/../c",
    "http://example.com/%7Euser",
    "http://example.com/a%2fb",
    "http://example.com/a#frag",
    "http://example.com/a?",
    "http://example.com/a?q=1&b=2",
    "http://user:pw@example.com/a",
    "http://example.com./a",
    "http://example.com/../../a",
    "http://example.com/%41%42%63",
    "http://example.com/100%",
    "http://EXAMPLE.com/p/%31%32?x=%41",
    "https://sub.domain.example.co.uk:443/deep/./path/../q?a=b&c=%64",
    "ftp://example.com/a",
    "mailto:user@example.com",
    "not a url",
]

HASH_CASES = [
    "",
    "a",
    "http://example.com/",
    "http://host0.example/p/0",
    "The quick brown fox jumps over the lazy dog",
    "ünïcødé ✓ 中文",
]

EXTRACT_CASES = {
    "001_basic": b"<html><head><title>T</title><script>var x;</script></head>"
    b"<body><p>Hello &amp; welcome</p><div>World</div></body></html>",
    "002_nested_drop": b"<body><style>p{}</style><p>keep</p>"
    b"<script>a</script><noscript>no</noscript><template><p>tpl</p></template>"
    b"<div>end</div></body>",
    "003_entities": b"<body><p>&lt;tag&gt; &quot;q&quot; &#65; &euro;</p></body>",
    "004_whitespace": b"<body><p>  a \t b  </p>\n\n<p>\nc\n</p><br><p>d</p></body>",
    "005_malformed": b"<p>unclosed <div>nested <b>deep</p> text",
    "006_rss": b'<?xml version="1.0"?><rss version="2.0"><channel>'
    b"<title>Feed &amp; Title</title>"
    b"<item><title>I1</title><description>D1 desc</description></item>"
    b"<item><title>I2</title><description>D2 &lt;b&gt;</description></item>"
    b"</channel></rss>",
    "007_atom": b'<feed xmlns="http://www.w3.org/2005/Atom"><title>AF</title>'
    b"<entry><title>E1</title><summary>S1</summary></entry>"
    b"<entry><title>E2</title><summary>S2</summary></entry></feed>",
    "008_lists_tables": b"<body><ul><li>one</li><li>two</li></ul>"
    b"<table><tr><td>c1</td><td>c2</td></tr><tr><td>c3</td></tr></table></body>",
    "009_inline_anchors": b'<body><p>see <a href="/x">link one</a> and '
    b'<a href="/y">two</a>.</p></body>',
    "010_unicode": "<body><p>中文段落 — ünïcødé ✓</p></body>".encode(),
}

ROBOTS_BODY = (
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/ok.html\n"
    "Disallow: /tmp$\n"
    "Disallow: /*.pdf$\n"
    "Allow: /a\n"
    "Disallow: /a/b\n"
    "Crawl-delay: 2.5\n"
    "\n"
    "User-agent: otherbot\n"
    "Disallow: /\n"
)

ROBOTS_PATHS = [
    "/", "/public", "/private/x", "/private/ok.html", "/tmp", "/tmp/x",
    "/doc/file.pdf", "/doc/file.pdfx", "/a", "/a/b", "/a/bc", "/robots.txt",
]


def write_urlnorm() -> None:
    with open(f"{GOLD}/urlnorm_cases.tsv", "w") as f:
        f.write("raw\tcanon\tsurt\n")
        for raw in URL_CASES:
            c = canonicalize_url(raw)
            s = surt_form(c) if c else ""
            f.write(f"{raw}\t{c or ''}\t{s}\n")


def write_hashes() -> None:
    with open(f"{GOLD}/hash_cases.tsv", "w") as f:
        f.write("input\tfingerprint64\n")
        for s in HASH_CASES:
            f.write(f"{s}\t{fingerprint64(s)}\n")


def write_extract() -> None:
    d = f"{GOLD}/extract_cases"
    os.makedirs(d, exist_ok=True)
    for name, html in EXTRACT_CASES.items():
        url = "http://h.example/feed.xml" if name in ("006_rss", "007_atom") else "http://h.example/x"
        with open(f"{d}/{name}.html", "wb") as f:
            f.write(html)
        with open(f"{d}/{name}.txt", "wb") as f:
            f.write(extract_text(url, html).encode("utf-8"))


def write_robots() -> None:
    rules = parse_robots(ROBOTS_BODY)
    with open(f"{GOLD}/robots_cases.tsv", "w") as f:
        f.write("path\tallowed\n")
        for p in ROBOTS_PATHS:
            f.write(f"{p}\t{int(rules.allowed(p))}\n")
    with open(f"{GOLD}/robots_body.txt", "w") as f:
        f.write(ROBOTS_BODY)


def e2e_digest() -> dict:
    """Full e2e crawl on the committed-spec corpus → digests of the log
    and seen set (canonical row serialization, order by fetch_seq)."""
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    from opps_feedcrawler_ray.pipelines.crawl import CrawlConfig, crawl
    from opps_feedcrawler_ray.sources.corpus import generate_corpus

    work = "/tmp/opps_feedcrawler_ray/golden-e2e"
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    corpus = generate_corpus(f"{work}/corpus", n_hosts=20, n_pages=2000)
    cfg = CrawlConfig(
        pages_path=corpus["pages"], seeds_path=corpus["seeds"],
        out_dir=f"{work}/out", num_frontier_actors=4, politeness_budget=16,
        num_buckets=16, checkpoint_every=8,
    )
    stats = crawl(cfg)
    files = sorted(glob.glob(f"{work}/out/crawl_log/round=*/*.parquet"))
    log = pa.concat_tables([pq.read_table(f) for f in files]).sort_by("fetch_seq")
    h = hashlib.sha256()
    for row in log.to_pylist():
        h.update(
            json.dumps(
                {k: (str(v) if v is not None else None) for k, v in sorted(row.items())},
                ensure_ascii=False,
            ).encode()
        )
    seen = pq.read_table(f"{work}/out/seen_set")
    hs = hashlib.sha256()
    for uh, u in zip(seen["url_hash"].to_pylist(), seen["url"].to_pylist()):
        hs.update(f"{uh}\x1f{u}\x1e".encode())
    return {
        "config": {"n_hosts": 20, "n_pages": 2000, "actors": 4, "budget": 16, "buckets": 16},
        "rows": log.num_rows,
        "rounds": stats["rounds"],
        "fetched": stats["fetched"],
        "not_found": stats["not_found"],
        "seen_rows": seen.num_rows,
        "log_sha256": h.hexdigest(),
        "seen_sha256": hs.hexdigest(),
    }


if __name__ == "__main__":
    os.makedirs(GOLD, exist_ok=True)
    write_urlnorm()
    write_hashes()
    write_extract()
    write_robots()
    d = e2e_digest()
    with open(f"{GOLD}/e2e_crawl_digest.json", "w") as f:
        json.dump(d, f, indent=1)
    print("goldens written:", d)
