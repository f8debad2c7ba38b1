"""Deterministic synthetic fixture corpus (FIXTURES.md F1/F2; SURVEY.md §7 M0).

Generates a Common-Crawl-style pages table in EXACTLY the input_hint shape
``(url, warc_ts, html binary, text, lang)`` plus a seed list.  Everything is
a pure function of the page id — no wall clock, no Python ``hash()``, no
shared RNG state — so generation parallelizes over Ray Data ``range`` →
``map_batches`` at bench scale and any sub-batch regenerates identically.

The golden ``text`` column is produced by running the FROZEN extractor
(functions/extract.py) on the generated ``html`` at generation time
(SURVEY.md §5.3): the crawl-pipeline invariant "extracted text is
byte-identical per url" is checked against this column.

Corpus structure, per host ``i`` (``host{i}.example``):
  * a root page  ``/``            (links into the id space)
  * a robots.txt ``/robots.txt``  (``Disallow: /priv/``)
and per global page id ``k`` in ``range(n_pages)``:
  * host = Zipf(a=1.3)-quantile of a mixed ``k`` (mega-host skew exists);
    with ``skew=True`` host0 additionally owns ~50% of ids
  * path ``/p/{k}``, or ``/priv/{k}`` when ``k % 17 == 13``
    (robots-blocked), or an RSS feed document when ``k % 20 == 5``
  * outlinks: 6 deterministic targets in messy non-canonical forms
    (uppercase host, ``:80``, ``/./``, percent-encoded digit) so the
    canonicalizer is exercised on every page.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_text
from ..schemas import PAGES, SEEDS

ZIPF_A = 1.3
N_LINKS = 6
EPOCH_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds

# Page-weight profile (module-level so map_batches workers share it after
# set_profile in generate_corpus; id-pure generation is unaffected).
# n_paras × words_per_para sets html/text size: the default ~1 KB pages are
# the unit/e2e profile; bench uses ~8 KB pages (realistic web-page weight)
# and a mild Zipf so politeness doesn't serialize the throughput measure.
PROFILE = {"n_paras": 3, "words_per_para": 12, "n_links": N_LINKS, "zipf_a": ZIPF_A, "seed_frac": 0.05}

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident"
).split()

_LANGS = ["en", "de", "es", "fr", "zh"]


def _mix(x: int) -> int:
    x = (x * 0x9E3779B97F4A7C15 + 0x123456789) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    x = (x * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 27
    return x


def _zipf_cdf(n_hosts: int) -> np.ndarray:
    w = 1.0 / np.arange(1, n_hosts + 1) ** PROFILE["zipf_a"]
    return np.cumsum(w / w.sum())


def host_of(page_id: int, n_hosts: int, cdf: np.ndarray, skew: bool) -> int:
    m = _mix(page_id)
    if skew and (m & 1):
        return 0
    u = ((m >> 1) & 0x7FFFFFFFFFFF) / float(1 << 47)
    return int(np.searchsorted(cdf, u, side="right"))


def path_of(page_id: int) -> str:
    return f"/priv/{page_id}" if page_id % 17 == 13 else f"/p/{page_id}"


def url_of(page_id: int, n_hosts: int, cdf: np.ndarray, skew: bool) -> str:
    return f"http://host{host_of(page_id, n_hosts, cdf, skew)}.example{path_of(page_id)}"


def _messy_link(target_id: int, n_hosts: int, cdf: np.ndarray, skew: bool, variant: int) -> str:
    """A non-canonical form of the target URL that canonicalizes back to it."""
    h = host_of(target_id, n_hosts, cdf, skew)
    p = path_of(target_id)
    v = variant % 4
    if v == 0:
        return f"HTTP://HOST{h}.EXAMPLE{p}"
    if v == 1:
        return f"http://host{h}.example:80{p}"
    if v == 2:
        return f"http://host{h}.example/.{p}"
    # percent-encode the last character of the path (always an unreserved digit)
    return f"http://host{h}.example{p[:-1]}%{ord(p[-1]):02X}"


def _targets(page_id: int, n_pages: int) -> list[int]:
    return [
        (page_id * 1_000_003 + 7_919 * k + 1) % n_pages
        for k in range(PROFILE["n_links"])
    ]


def _para(page_id: int, j: int, n_words: int | None = None) -> str:
    w = _WORDS
    if n_words is None:
        n_words = PROFILE["words_per_para"]
    return " ".join(w[(page_id * 3 + j * 7 + t * 11) % len(w)] for t in range(n_words))


def build_page_html(page_id: int, n_hosts: int, n_pages: int, cdf: np.ndarray, skew: bool) -> bytes:
    tids = _targets(page_id, n_pages)
    links = [_messy_link(t, n_hosts, cdf, skew, page_id + k) for k, t in enumerate(tids)]
    if page_id % 20 == 5:  # RSS feed document
        items = []
        for k, (t, link) in enumerate(zip(tids[:3], links[:3])):
            items.append(
                f"<item><title>Item {page_id}-{k}</title>"
                f"<description>{_para(page_id, k)}</description>"
                f"<link>{link}</link></item>"
            )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?><rss version="2.0"><channel>'
            f"<title>Feed of page {page_id}</title>{''.join(items)}</channel></rss>"
        )
        return xml.encode()
    paras = "".join(f"<p>{_para(page_id, j)}</p>" for j in range(PROFILE["n_paras"]))
    anchors = "".join(f'<a href="{ln}">link {k}</a>' for k, ln in enumerate(links))
    html = (
        f"<html><head><title>Page {page_id}</title>"
        f"<script>var tracker = {page_id};</script></head>"
        f"<body><h1>Page {page_id} &amp; friends</h1>{paras}"
        f"<div>{anchors}</div></body></html>"
    )
    return html.encode()


def build_root_html(host: int, n_hosts: int, n_pages: int, cdf: np.ndarray, skew: bool) -> bytes:
    tids = [(host * 31 + k * 101 + 3) % n_pages for k in range(N_LINKS)]
    links = [_messy_link(t, n_hosts, cdf, skew, host + k) for k, t in enumerate(tids)]
    anchors = "".join(f'<a href="{ln}">hub {k}</a>' for k, ln in enumerate(links))
    return (
        f"<html><head><title>Host {host} home</title></head>"
        f"<body><h1>host{host}.example</h1><p>{_para(host, 0)}</p>"
        f"<div>{anchors}</div></body></html>"
    ).encode()


ROBOTS_BODY = b"User-agent: *\nDisallow: /priv/\n"


def build_pages_batch(
    ids: np.ndarray, n_hosts: int, n_pages: int, skew: bool = False,
    profile: dict | None = None,
) -> pa.Table:
    """Pages rows for global ids; ids >= n_pages encode root/robots pages:
    id = n_pages + 2*h  → root of host h;  n_pages + 2*h + 1 → its robots.txt.

    ``profile`` MUST be passed explicitly when calling from a Ray worker:
    this function executes in the real module namespace, so updating
    PROFILE here reaches every helper (a cloudpickled closure mutating
    PROFILE would only mutate its own pickled copy of the globals).
    """
    if profile:
        PROFILE.update(profile)
    cdf = _zipf_cdf(n_hosts)
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for pid in (int(x) for x in ids):
        if pid < n_pages:
            url = url_of(pid, n_hosts, cdf, skew)
            html = build_page_html(pid, n_hosts, n_pages, cdf, skew)
        else:
            h, is_robots = divmod(pid - n_pages, 2)
            url = f"http://host{h}.example" + ("/robots.txt" if is_robots else "/")
            html = ROBOTS_BODY if is_robots else build_root_html(h, n_hosts, n_pages, cdf, skew)
        urls.append(url)
        tss.append(EPOCH_US + pid * 1_000_000)
        htmls.append(html)
        texts.append(extract_text(url, html))
        langs.append(_LANGS[pid % len(_LANGS)])
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES,
    )


def build_seeds(
    n_hosts: int, n_pages: int, skew: bool = False, profile: dict | None = None
) -> pa.Table:
    """Seed list (F2): every host root + 5% non-root pages + 2 dups + 1 missing."""
    if profile:
        PROFILE.update(profile)
    cdf = _zipf_cdf(n_hosts)
    urls = [f"http://host{h}.example/" for h in range(n_hosts)]
    n_extra = max(1, int(n_pages * PROFILE.get("seed_frac", 0.05)))
    extra = [url_of((j * 104_729 + 11) % n_pages, n_hosts, cdf, skew) for j in range(n_extra)]
    urls += sorted(set(extra))
    urls += [urls[0], f"HTTP://HOST0.EXAMPLE:80/"]  # two duplicates of root 0
    urls += [f"http://host0.example/definitely-missing-{n_pages}"]  # not in pages
    return pa.table(
        {"url": pa.array(urls, pa.string()),
         "priority": pa.array([1.0] * len(urls), pa.float64())},
        schema=SEEDS,
    )


def generate_corpus(
    out_dir: str,
    n_hosts: int,
    n_pages: int,
    skew: bool = False,
    use_ray: bool = False,
    profile: dict | None = None,
) -> dict[str, str]:
    """Write pages.parquet + seeds.parquet under out_dir; returns their paths.

    ``use_ray=True`` parallelizes page building over Ray Data (bench scale);
    both paths produce identical bytes-per-row (generation is id-pure).
    """
    if profile:
        PROFILE.update(profile)
    os.makedirs(out_dir, exist_ok=True)
    pages_path = os.path.join(out_dir, "pages.parquet")
    seeds_path = os.path.join(out_dir, "seeds.parquet")
    total = n_pages + 2 * n_hosts
    if use_ray:
        import ray.data as rd

        prof = dict(PROFILE)

        def build(batch: pa.Table) -> pa.Table:
            return build_pages_batch(
                batch["id"].to_numpy(), n_hosts, n_pages, skew, profile=prof
            )

        # the corpus stays a DIRECTORY of part files (row content is id-pure
        # and joins go by url, so physical order is irrelevant; compacting a
        # multi-GB binary column into one table would overflow 32-bit Arrow
        # offsets and would not scale anyway)
        pages_path = os.path.join(out_dir, "pages_parquet")
        import shutil

        shutil.rmtree(pages_path, ignore_errors=True)
        (
            rd.range(total)
            .map_batches(build, batch_format="pyarrow", batch_size=4096)
            .write_parquet(pages_path)
        )
    else:
        t = build_pages_batch(np.arange(total), n_hosts, n_pages, skew)
        pq.write_table(t, pages_path)
    pq.write_table(build_seeds(n_hosts, n_pages, skew, profile=dict(PROFILE)), seeds_path)
    return {"pages": pages_path, "seeds": seeds_path}


BENCH_PROFILE = {"n_paras": 40, "words_per_para": 40, "n_links": 12, "zipf_a": 0.7, "seed_frac": 0.05}

SCALES = {
    "smoke": dict(n_hosts=1, n_pages=50),
    "e2e": dict(n_hosts=20, n_pages=2000),
    "skew": dict(n_hosts=20, n_pages=2000, skew=True),
    "bench": dict(n_hosts=500, n_pages=200_000, profile=BENCH_PROFILE),
}
