"""Golden-fixture conformance (SURVEY.md §5.2 layer 1 + §5.3).

Tests diff current behavior against the COMMITTED golden bytes in
tests/golden/ — never against re-generation.  A failure here means the
frozen spec changed; fix the code, don't regenerate, unless the change
is a deliberate spec break.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

from opps_feedcrawler_ray.functions.extract import extract_text
from opps_feedcrawler_ray.functions.hashing import fingerprint64
from opps_feedcrawler_ray.functions.robots import parse_robots
from opps_feedcrawler_ray.functions.urlnorm import canonicalize_url, surt_form

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _tsv(path):
    with open(path) as f:
        header = f.readline().rstrip("\n").split("\t")
        for line in f:
            yield dict(zip(header, line.rstrip("\n").split("\t")))


def test_urlnorm_goldens():
    n = 0
    for row in _tsv(f"{GOLD}/urlnorm_cases.tsv"):
        c = canonicalize_url(row["raw"])
        assert (c or "") == row["canon"], row
        if c:
            assert surt_form(c) == row["surt"], row
        n += 1
    assert n >= 20


def test_hash_goldens():
    n = 0
    for row in _tsv(f"{GOLD}/hash_cases.tsv"):
        assert fingerprint64(row["input"]) == int(row["fingerprint64"]), row
        n += 1
    assert n >= 6


def test_extract_goldens():
    cases = sorted(glob.glob(f"{GOLD}/extract_cases/*.html"))
    assert len(cases) >= 10
    for html_path in cases:
        name = os.path.basename(html_path)[:-5]
        with open(html_path, "rb") as f:
            html = f.read()
        with open(html_path[:-5] + ".txt", "rb") as f:
            expected = f.read()
        url = (
            "http://h.example/feed.xml"
            if name in ("006_rss", "007_atom")
            else "http://h.example/x"
        )
        got = extract_text(url, html).encode("utf-8")
        assert got == expected, f"extractor drift on {name}"


def test_robots_goldens():
    with open(f"{GOLD}/robots_body.txt") as f:
        rules = parse_robots(f.read())
    for row in _tsv(f"{GOLD}/robots_cases.tsv"):
        assert rules.allowed(row["path"]) == bool(int(row["allowed"])), row


def test_textops_goldens():
    """Pinned langid + doc_fingerprint outputs over the sf0.001 documents
    (VERDICT r1 item 7: rows-only ops get committed goldens)."""
    import pyarrow.parquet as pq

    from opps_feedcrawler_ray.functions.text import detect_lang, doc_fingerprint

    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    with open(f"{GOLD}/textops_sf0001.json") as f:
        golden = json.load(f)
    texts = t["text"].to_pylist()
    langs = detect_lang(texts)
    fps = doc_fingerprint(texts)
    assert len(golden) == t.num_rows
    for i, lang, fp in zip(t["doc_id"].to_pylist(), langs, fps):
        g = golden[str(i)]
        assert lang == g["lang"], f"langid drift on doc {i}"
        assert f"{int(fp):016x}" == g["fp_hex"], f"fingerprint drift on doc {i}"


@pytest.mark.slow
def test_e2e_crawl_digest(ray_session):
    """Full e2e crawl reproduces the committed log + seen-set digests
    byte-for-byte (ordering rule §2.12 + extractor + dedup + robots)."""
    from tests.gen_goldens import e2e_digest

    with open(f"{GOLD}/e2e_crawl_digest.json") as f:
        golden = json.load(f)
    got = e2e_digest()
    assert got == golden
