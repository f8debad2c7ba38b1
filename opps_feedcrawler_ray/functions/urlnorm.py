"""URL canonicalization, SURT form, host extraction (SURVEY.md §2.2 M1/M2/M4).

FROZEN SPEC — goldens in ``tests/golden/urlnorm_cases.tsv`` pin every rule.
Changing any rule is a breaking spec change (SURVEY.md §2.12 note).

Canonicalization (RFC 3986 §6 syntax-based normalization, crawler profile):

1. scheme lowercased; only ``http``/``https`` URLs are canonicalizable —
   anything else returns ``None`` (dropped by the frontier).
2. userinfo is dropped (crawler profile: credentials never form identity).
3. host lowercased; a single trailing dot is stripped; default ports
   (``:80`` http, ``:443`` https) stripped, other ports kept.
4. path: dot-segments resolved (RFC 3986 §5.2.4); percent-encoding
   normalized — unreserved characters (ALPHA / DIGIT / ``-._~``) decoded,
   all remaining ``%XX`` uppercased, bare ``%`` not followed by two hex
   digits encoded as ``%25``; empty path becomes ``/``.
5. query: kept verbatim apart from percent-normalization (no parameter
   re-ordering, no tracker stripping — not in the north rule); an empty
   query (``?`` alone) is dropped.
6. fragment dropped.

SURT (Sorted URL Reordering Transform, Heritrix/web-archive convention):
``http://www.Example.com:8080/a?q=1`` → ``com,example,www:8080)/a?q=1``
(host labels reversed and comma-joined, non-default port kept after
``:``, scheme omitted, then ``)`` + path + optional ``?query``).

Host (M4): the netloc sans port/userinfo of the canonical URL.  No
public-suffix list ships in this environment, so "registered host" ==
full lowercased hostname (documented deviation, SURVEY.md §2.2 M4).
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_HEX = set("0123456789abcdefABCDEF")
_PCT_RE = re.compile(r"%(?:[0-9a-fA-F]{2})?")
_DEFAULT_PORT = {"http": "80", "https": "443"}


def _pct_normalize(s: str) -> str:
    """Normalize percent-encoding per rule 4/5 of the module spec."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c != "%":
            out.append(c)
            i += 1
            continue
        hx = s[i + 1 : i + 3]
        if len(hx) == 2 and hx[0] in _HEX and hx[1] in _HEX:
            ch = chr(int(hx, 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + hx.upper())
            i += 3
        else:
            out.append("%25")  # bare '%' → encoded
            i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    output: list[str] = []
    while path:
        if path.startswith("../"):
            path = path[3:]
        elif path.startswith("./"):
            path = path[2:]
        elif path.startswith("/./"):
            path = "/" + path[3:]
        elif path == "/.":
            path = "/"
        elif path.startswith("/../"):
            path = "/" + path[4:]
            if output:
                output.pop()
        elif path == "/..":
            path = "/"
            if output:
                output.pop()
        elif path in (".", ".."):
            path = ""
        else:
            if path.startswith("/"):
                j = path.find("/", 1)
            else:
                j = path.find("/")
            if j == -1:
                output.append(path)
                path = ""
            else:
                output.append(path[:j])
                path = path[j:]
    return "".join(output)


def _canon_parts(url: str) -> tuple[str, str, str, str] | None:
    """ONE-parse canonicalization core: (scheme, host, port, tail) of the
    canonical form, or None.  ``tail`` = path + optional ?query.  Both
    ``canonicalize_url`` and the batch fast path build their outputs from
    this, so the URL is urlsplit exactly once (surt/host used to re-split
    the canonical string — 2× the parse cost on the crawl's hot path)."""
    if not url:
        return None
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc
    # drop userinfo
    if "@" in netloc:
        netloc = netloc.rsplit("@", 1)[1]
    # split host / port (IPv6 bracket-aware)
    if netloc.startswith("["):
        j = netloc.find("]")
        if j == -1:
            return None
        host, rest = netloc[: j + 1].lower(), netloc[j + 1 :]
        port = rest[1:] if rest.startswith(":") else ""
    elif ":" in netloc:
        host, port = netloc.rsplit(":", 1)
        host = host.lower()
    else:
        host, port = netloc.lower(), ""
    if not host:
        return None
    if host.endswith(".") and len(host) > 1:
        host = host[:-1]
    port = port.lstrip("0") or port  # "0080" → "80" (leading zeros dropped; "" stays "")
    if port == _DEFAULT_PORT[scheme]:
        port = ""
    path = _pct_normalize(_remove_dot_segments(parts.path)) or "/"
    if not path.startswith("/"):
        path = "/" + path
    query = _pct_normalize(parts.query)
    tail = f"{path}?{query}" if query else path
    return scheme, host, port, tail


def canonicalize_url(url: str) -> str | None:
    """Canonical form per the module spec, or None if not canonicalizable."""
    p = _canon_parts(url)
    if p is None:
        return None
    scheme, host, port, tail = p
    if port:
        return f"{scheme}://{host}:{port}{tail}"
    return f"{scheme}://{host}{tail}"


def _full_canon(url: str) -> tuple[str, str, str] | None:
    """(canon, surt, host) from ONE parse — byte-identical to
    ``(canonicalize_url(u), surt_form(c), extract_host(c))`` (pinned by
    the full-vs-composed property test)."""
    p = _canon_parts(url)
    if p is None:
        return None
    scheme, host, port, tail = p
    if host.startswith("["):
        # IPv6: not reversible label-wise; extract_host keeps the brackets
        surt_host = f"{host}:{port}" if port else host
    else:
        surt_host = ",".join(reversed(host.split(".")))
        if port:
            surt_host += f":{port}"
    canon = f"{scheme}://{host}:{port}{tail}" if port else f"{scheme}://{host}{tail}"
    return canon, surt_host + ")" + tail, host


def surt_form(canon_url: str) -> str:
    """SURT of an ALREADY-canonical URL (call canonicalize_url first)."""
    parts = urlsplit(canon_url)
    netloc = parts.netloc
    if netloc.startswith("["):  # IPv6: not reversible label-wise; keep as-is
        hostport = netloc
        surt_host = hostport
    else:
        if ":" in netloc:
            host, port = netloc.rsplit(":", 1)
        else:
            host, port = netloc, ""
        surt_host = ",".join(reversed(host.split(".")))
        if port:
            surt_host += f":{port}"
    s = surt_host + ")" + (parts.path or "/")
    if parts.query:
        s += "?" + parts.query
    return s


def extract_host(canon_url: str) -> str:
    """Host (no port, no userinfo) of an already-canonical URL."""
    netloc = urlsplit(canon_url).netloc
    if netloc.startswith("["):
        return netloc.split("]")[0] + "]"
    return netloc.rsplit(":", 1)[0] if ":" in netloc else netloc


# Fast path for ALREADY-CANONICAL URLs (the overwhelmingly common case on
# a crawl frontier: seed lists and re-offered canonical links).  A single
# compiled-regex match replaces three ``urlsplit`` calls + two char loops
# (~10× per URL, measured).  The match conditions are chosen so the fast
# result is PROVABLY byte-identical to the full path:
#   * scheme literally ``http``/``https`` (already lowercase);
#   * host only ``[a-z0-9_-]`` labels joined by single dots — no userinfo,
#     port, brackets, uppercase, or leading/trailing dot (so lowercasing,
#     port-stripping and dot-stripping are all no-ops);
#   * path absent or ``/``-rooted with no ``%`` (pct-normalize no-op), no
#     whitespace (urlsplit strips \t\n\r anywhere — excluded wholesale),
#     and no ``/.`` substring (every dot-segment form contains it, so
#     remove_dot_segments is a no-op; ``/a.html`` stays fast);
#   * query absent or non-empty with no ``%``/whitespace; no fragment.
# Anything else falls back to the full RFC 3986 path.  Equivalence is
# pinned by tests/test_properties.py (fast-vs-full property) and the
# frozen goldens.
_FAST_RE = re.compile(
    r"^(https?)://"
    r"([a-z0-9_\-]+(?:\.[a-z0-9_\-]+)*)"
    r"((?:/[^?#%\t\n\r ]*)?)"
    r"(\?[^#%\t\n\r ]+)?$"
)


def _fast_canon(url: str) -> tuple[str, str, str] | None:
    """(canon, surt, host) for a trivially-canonical URL, else None."""
    m = _FAST_RE.match(url)
    if m is None:
        return None
    # The path/query classes exclude space/\t\n\r but admit other unicode
    # whitespace (\x0c, \xa0,  , ...) that the full path's url.strip()
    # removes when trailing — fall back so both paths stay byte-identical.
    # (Leading is impossible: the regex anchors at ^https?://.)
    if url[-1].isspace():
        return None
    scheme, host, path, q = m.groups()
    if "/." in path:
        return None
    if not path:
        path = "/"
    tail = path + (q or "")
    return (
        f"{scheme}://{host}{tail}",
        ",".join(reversed(host.split("."))) + ")" + tail,
        host,
    )


# Per-process memo for canonicalize_batch: web outlinks repeat heavily
# (nav/footer links recur on every page of a host), and the functions are
# pure, so caching url → (canon, surt, host) is semantics-free.  Wholesale
# clear at capacity keeps eviction O(1) amortized.
_CANON_CACHE: dict[str, tuple] = {}
_CANON_CACHE_CAP = 1 << 17


def canonicalize_batch(urls: list[str | None]) -> tuple[list[str | None], list[str | None], list[str | None]]:
    """Batch helper: urls → (canon, surt, host) parallel lists.

    Non-canonicalizable entries yield None in all three outputs — callers
    filter them with an Arrow ``is_valid`` mask.
    """
    cache = _CANON_CACHE
    canons: list[str | None] = []
    surts: list[str | None] = []
    hosts: list[str | None] = []
    for u in urls:
        if u is not None:
            hit = cache.get(u)
            if hit is not None:
                canons.append(hit[0])
                surts.append(hit[1])
                hosts.append(hit[2])
                continue
        if u is not None:
            f = _fast_canon(u)
            if f is not None:
                if len(cache) >= _CANON_CACHE_CAP:
                    cache.clear()
                cache[u] = f
                canons.append(f[0])
                surts.append(f[1])
                hosts.append(f[2])
                continue
        t = _full_canon(u) if u is not None else None
        if t is None:
            if u is not None:
                if len(cache) >= _CANON_CACHE_CAP:
                    cache.clear()
                cache[u] = (None, None, None)
            canons.append(None)
            surts.append(None)
            hosts.append(None)
        else:
            c, s, h = t
            if len(cache) >= _CANON_CACHE_CAP:
                cache.clear()
            cache[u] = (c, s, h)
            canons.append(c)
            surts.append(s)
            hosts.append(h)
    return canons, surts, hosts


def trap_mask(
    urls,
    max_url_len: int = 2048,
    max_path_depth: int = 32,
    max_segment_repeat: int = 3,
):
    """Crawler-trap guard (IRLbot-style URL hygiene — public literature:
    Lee et al. 2009 identify unbounded-depth and repeating-segment loops
    as the dominant frontier polluters): boolean KEEP mask over an Arrow
    string array of CANONICAL urls.  A URL is rejected when it exceeds
    ``max_url_len`` bytes, has more than ``max_path_depth`` non-empty
    PATH segments, or repeats any single path segment more than
    ``max_segment_repeat`` times (calendar/session-id loops like
    /a/b/a/b/a/b/a/b — four repeats each at the default limit of 3).
    The query string is excluded: depth and repeats are path properties,
    and a ``?next=/x/y/x/y`` return-url parameter must not condemn a
    depth-1 redirect link.  Vectorized: one binary_length + one
    strip-query + one split per batch, repeat detection via a grouped
    pandas count over the exploded segments — no per-URL Python
    parsing."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    n = len(urls)
    if n == 0:
        return np.zeros(0, dtype=bool)
    keep = pc.less_equal(pc.binary_length(urls), max_url_len).to_numpy(
        zero_copy_only=False
    )
    # path-only view: everything before the first '?' (canonical form is
    # scheme://host/path[?q]; '?' in a path percent-encodes, so the first
    # literal '?' starts the query)
    path_part = pc.list_element(pc.split_pattern(urls, "?", max_splits=1), 0)
    parts = pc.split_pattern(path_part, "/")
    flat = np.asarray(pc.list_flatten(parts).to_pylist(), dtype=object)
    lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
    idx = np.repeat(np.arange(n), lens)
    off = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = np.arange(len(flat)) - np.repeat(off, lens)
    m = (pos >= 3) & (flat != "")  # skip scheme, '', host; drop empties
    seg = pd.DataFrame({"i": idx[m], "s": flat[m]})
    if len(seg):
        per = seg.groupby(["i", "s"]).size()
        depth = per.groupby("i").sum()
        deep = depth.index.to_numpy()[depth.to_numpy() > max_path_depth]
        keep[deep] = False
        rep = per.groupby("i").max()
        bad = rep.index.to_numpy()[rep.to_numpy() > max_segment_repeat]
        keep[bad] = False
    return keep


def scope_mask(urls, allow: list[str] | None = None, deny: list[str] | None = None):
    """Crawl-scope filter (Heritrix/Nutch-style allow/deny rules —
    public crawler convention: regex url filters decide whether a
    DISCOVERED url is in scope): boolean KEEP mask over an Arrow string
    array of canonical urls.

    * ``allow`` — list of regexes; when non-empty a url must match AT
      LEAST ONE to be kept (whitelist scope, e.g. stay on two hosts).
    * ``deny`` — list of regexes; a url matching ANY is dropped
      (blacklist, e.g. ``\\.(jpg|css)$`` or ``/calendar/``), applied
      AFTER allow — deny wins on conflict.

    Vectorized: the pattern lists are OR-folded into one RE2 alternation
    each and evaluated with a single ``pc.match_substring_regex`` call
    per list (Arrow's re2 engine, no per-url Python).  Patterns are
    unanchored (match anywhere in the url) per the Nutch/Heritrix
    convention — anchor explicitly with ``^``/``$`` when needed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    n = len(urls)
    if n == 0:
        return np.zeros(0, dtype=bool)
    keep = np.ones(n, dtype=bool)
    if allow:
        pat = "|".join(f"(?:{p})" for p in allow)
        keep &= pc.match_substring_regex(urls, pat).to_numpy(zero_copy_only=False)
    if deny:
        pat = "|".join(f"(?:{p})" for p in deny)
        keep &= ~pc.match_substring_regex(urls, pat).to_numpy(zero_copy_only=False)
    return keep


def compile_param_rules(names: list[str]) -> tuple[frozenset, tuple]:
    """Pre-split exact names and ``foo*`` wildcard prefixes for
    :func:`strip_query_params` (compiled ONCE per stage, not per URL)."""
    exact = frozenset(n for n in names if not n.endswith("*"))
    prefixes = tuple(n[:-1] for n in names if n.endswith("*"))
    return exact, prefixes


def strip_query_params(
    canon_url: str, exact: frozenset, prefixes: tuple
) -> str:
    """Remove query parameters whose NAME matches an exact rule or a
    ``prefix*`` wildcard from an already-CANONICAL url (the tracking-
    param scrub: utm_*, fbclid, gclid...).  Remaining parameters keep
    their original order; an emptied query drops its '?'.  The result
    is still canonical — parameter removal never un-normalizes
    percent-encoding or paths — so re-hashing it is valid."""
    i = canon_url.find("?")
    if i < 0:
        return canon_url
    kept = []
    for p in canon_url[i + 1:].split("&"):
        name = p.split("=", 1)[0]
        if name in exact or any(name.startswith(px) for px in prefixes):
            continue
        kept.append(p)
    return canon_url[:i] + ("?" + "&".join(kept) if kept else "")
