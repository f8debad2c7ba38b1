"""Content-kind detection, text extraction, outlink parsing (SURVEY.md M5–M7).

FROZEN EXTRACTOR SPEC — this module defines the byte-identical ``text``
invariant of the whole engine (BASELINE.json input_hint: "byte-identical
extracted text per url").  The fixture generator calls THESE functions to
populate the pages table's golden ``text`` column (SURVEY.md §5.3), and
``tests/golden/extract_cases/`` pins html→text pairs byte-for-byte.
Any change here is a breaking spec change.

Reference parity: the upstream app (`opps/opps-feedcrawler`, empty
checkout — SURVEY.md §0) normalized RSS/Atom entries via feedparser into
title/summary rows; ``extract_feed_text`` reproduces that
title+summary-per-entry semantics with stdlib ``xml.etree``.  HTML pages
(which the upstream never handled itself) use the documented
stdlib-``html.parser`` visible-text spec below.

HTML → text spec:
  * bytes are decoded per the sniffed charset (BOM → XML encoding decl →
    ``<meta charset>`` in the first 1024 bytes → UTF-8 fallback), always
    with ``errors="replace"`` — identical to the original UTF-8-replace
    spec for any page without a contrary declaration;
  * content inside ``script style template head noscript svg`` is dropped
    (the whole ``<head>``, including ``<title>``, is dropped);
  * entering or leaving a block-level element emits a newline
    (p div li ul ol h1–h6 tr table thead tbody section article header
    footer blockquote pre hr br nav aside main figure figcaption dl dt dd
    form fieldset address);
  * character/entity references are unescaped (``html.parser``
    convert_charrefs);
  * whitespace normalization: runs of blanks/tabs collapse to one space,
    each line is stripped, empty lines are removed, lines join with
    ``"\n"``, result has no leading/trailing whitespace.

RSS/Atom → text spec: feed title first, then per entry/item:
``title`` line then ``summary``/``description``/``content`` line, in
document order; same whitespace normalization applied to the joined text.
"""

from __future__ import annotations

import html as _html
import re
import xml.etree.ElementTree as ET
from html.parser import HTMLParser
from urllib.parse import urljoin

DROP_TAGS = frozenset({"script", "style", "template", "head", "noscript", "svg"})
BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 tr table thead tbody section article "
    "header footer blockquote pre hr br nav aside main figure figcaption "
    "dl dt dd form fieldset address".split()
)
VOID_TAGS = frozenset("br hr img input meta link area base col embed source track wbr".split())

_WS_RUN = re.compile(r"[ \t\r\f\v]+")


def normalize_ws(s: str) -> str:
    """The frozen whitespace normalization (last step of every extractor).

    Fast path (byte-identical, property-tested): when the text has no
    exotic ASCII blanks, collapsing space runs via C-speed ``str.split``
    replaces the regex sub (~2× on page-sized text).  Unicode whitespace
    is deliberately untouched mid-line and stripped at line edges by
    ``strip()`` — exactly like the regex path."""
    if "\t" not in s and "\r" not in s and "\f" not in s and "\v" not in s:
        out = []
        for ln in s.split("\n"):
            # single-spaced line (the overwhelming case on real text):
            # join-of-split is the identity minus edge whitespace, so
            # C-speed strip() alone is byte-identical — property-tested
            if "  " not in ln:
                t = ln.strip()
            else:
                t = " ".join(filter(None, ln.split(" "))).strip()
            if t:
                out.append(t)
        return "\n".join(out)
    s = _WS_RUN.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    return "\n".join(ln for ln in lines if ln)


class _TextExtractor(HTMLParser):
    """One-pass text + href collector.  Text semantics are the FROZEN
    module spec; hrefs are a free byproduct of the same event stream
    (pinned by the parse_links goldens)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.hrefs: list[str] = []
        self._drop_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
        if tag in DROP_TAGS:
            if tag not in VOID_TAGS:
                self._drop_depth += 1
            return
        if tag in BLOCK_TAGS:
            self.parts.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in DROP_TAGS:
            if tag not in VOID_TAGS and self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag in BLOCK_TAGS:
            self.parts.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
        if tag in BLOCK_TAGS:
            self.parts.append("\n")

    def handle_data(self, data: str) -> None:
        if self._drop_depth == 0:
            self.parts.append(data)


class _LinkExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list[str] = []

    def _grab(self, tag: str, attrs) -> None:
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)

    handle_starttag = _grab
    handle_startendtag = _grab


_CHARSET_META = re.compile(rb"<meta[^>]+charset\s*=\s*[\"']?\s*([a-zA-Z0-9_\-:.]+)", re.I)
_XML_DECL = re.compile(rb"^<\?xml[^>]*encoding\s*=\s*[\"']([a-zA-Z0-9_\-:.]+)[\"']", re.I)


def sniff_charset(b: bytes) -> str:
    """Charset sniff (round-2 spec extension, feedparser-equivalent
    behavior): BOM first, then the XML encoding declaration, then a
    ``<meta charset>`` / ``http-equiv`` charset within the first 1024
    bytes; unknown or absent → ``utf-8``.  Decoding always uses
    ``errors="replace"``, so the old UTF-8-replace behavior is preserved
    verbatim for every page without a contrary declaration (goldens
    unchanged — verified by the committed byte-identical corpus)."""
    if b.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if b.startswith(b"\xff\xfe") or b.startswith(b"\xfe\xff"):
        return "utf-16"
    head = b[:1024]
    m = _XML_DECL.match(head.lstrip())
    if m is None:
        m = _CHARSET_META.search(head)
    if m is None:
        return "utf-8"
    name = m.group(1).decode("ascii", "replace")
    import codecs

    try:
        codecs.lookup(name)
    except LookupError:
        return "utf-8"
    return name


def decode_bytes(b: bytes | str) -> str:
    if isinstance(b, str):
        return b
    return b.decode(sniff_charset(b), "replace")


def detect_kind(url: str, body: bytes | str) -> str:
    """Classify page bytes: 'robots' | 'rss' | 'atom' | 'sitemap' |
    'binary' | 'html' (M7).  Sitemaps (sitemaps.org protocol) are
    detected by their root element — <urlset> or <sitemapindex> — never
    by URL, matching the content-first rss/atom rule.  Well-known binary
    magics (PDF, PNG, JPEG, GIF) classify as 'binary': no text, no
    links — a real crawl hits them constantly and must not shred them
    through an HTML parser."""
    if url.endswith("/robots.txt"):
        return "robots"
    if isinstance(body, (bytes, bytearray)) and body[:4] in (
        b"%PDF", b"\x89PNG", b"GIF8",
    ) or (isinstance(body, (bytes, bytearray)) and body[:3] == b"\xff\xd8\xff"):
        return "binary"
    head = decode_bytes(body[:512] if isinstance(body, (bytes, bytearray)) else body[:512])
    head = head.lstrip("﻿ \t\r\n").lower()
    if head.startswith("<?xml"):
        j = head.find("?>")
        head = head[j + 2 :].lstrip() if j != -1 else head
    if head.startswith("<rss"):
        return "rss"
    if head.startswith("<feed"):
        return "atom"
    if head.startswith(("<urlset", "<sitemapindex")):
        return "sitemap"
    return "html"


# --- fast HTML tokenizer (round-3 perf path; byte-identical subset) ---
#
# html.parser costs ~1.2 ms/page and dominates round CPU (~68% measured).
# For PROVABLY-SIMPLE documents a single compiled-regex token scan
# reproduces _TextExtractor's event stream exactly; anything outside the
# subset falls back to html.parser, so output is always byte-identical
# (pinned by the fast-vs-full property test and the frozen goldens).
#
# Fast-path preconditions (checked before scanning):
#   * no "<!" / "<?" — no comments, doctypes, CDATA sections, PIs;
#   * every "<" and ">" belongs to a STRICTLY well-formed tag
#     (`</name >` end tags, `<name a=b c="d" ... /?>` start tags with
#     quoted values free of <>); any stray bracket, exotic tag name, or
#     tolerant-parsing corner (html.parser accepts far more) → fallback.
#     Enforced positionally: any inter-tag gap containing "<" or ">"
#     aborts the scan.
#
# In-subset equivalences replicated exactly:
#   * character references: html.parser (convert_charrefs=True) passes
#     each text run up to the next "<" through ``html.unescape`` and
#     unescapes attribute values the same way — the scan applies the
#     SAME function to gaps/values containing "&";
#   * <script>/<style> switch html.parser into CDATA content mode; the
#     scan skips to the first well-formed matching end tag and treats
#     everything between as raw data (always inside a dropped region,
#     since both tags are DROP_TAGS).  A malformed/absent closer → fallback.
#
# Replicated _TextExtractor subtleties (deliberate, see its handlers):
# <a href> values are collected even inside dropped regions; block-tag
# newlines are emitted inside dropped regions too; a self-closing tag
# emits ONE newline and never touches the drop depth.
_FAST_TAG_RE = re.compile(
    r"<(?:"
    r"/(?P<ename>[a-zA-Z][a-zA-Z0-9]*)\s*"
    r"|"
    r"(?P<name>[a-zA-Z][a-zA-Z0-9]*)"
    r"(?P<attrs>(?:\s+[a-zA-Z_:][\-a-zA-Z0-9_:.]*"
    r"(?:\s*=\s*(?:\"[^\"<>]*\"|'[^'<>]*'|[^\s\"'<>`=]+))?)*)"
    r"\s*(?P<selfclose>/?)"
    r")>"
)
_FAST_HREF_RE = re.compile(
    r"([a-zA-Z_:][\-a-zA-Z0-9_:.]*)"
    r"(?:\s*=\s*(?:\"([^\"<>]*)\"|'([^'<>]*)'|([^\s\"'<>`=]+)))?"
)
_FAST_CDATA_END = {
    "script": re.compile(r"</\s*script\s*>", re.I),
    "style": re.compile(r"</\s*style\s*>", re.I),
}


def _fast_extract_html(s: str) -> tuple[list[str], list[str]] | None:
    """(parts, hrefs) identical to _TextExtractor for the simple subset,
    or None to request the full html.parser path.

    The loop is the extractor's innermost kernel (~120 tags/page on a
    web-shaped corpus): locals are pre-bound and all four groups are
    fetched in ONE ``m.group(1, 2, 3, 4)`` C call (named lookups and
    separate start()/end() calls were ~25% of extract CPU)."""
    if "<!" in s or "<?" in s:
        return None
    parts: list[str] = []
    hrefs: list[str] = []
    append = parts.append
    unescape = _html.unescape
    drop_tags, block_tags, void_tags = DROP_TAGS, BLOCK_TAGS, VOID_TAGS
    search = _FAST_TAG_RE.search
    drop = 0
    pos = 0
    m = search(s, pos)
    while m is not None:
        mstart, mend = m.span()
        gap = s[pos:mstart]
        if "<" in gap or ">" in gap:
            return None
        if drop == 0 and gap:
            append(unescape(gap) if "&" in gap else gap)
        pos = mend
        ename, name, attrs, selfclose = m.group(1, 2, 3, 4)
        if ename is not None:
            tag = ename.lower()
            if tag in drop_tags:
                if tag not in void_tags and drop > 0:
                    drop -= 1
            elif tag in block_tags:
                append("\n")
            m = search(s, pos)
            continue
        tag = name.lower()
        if tag == "a":
            for am in _FAST_HREF_RE.finditer(attrs):
                if am.group(1).lower() == "href":
                    v = am.group(2)
                    if v is None:
                        v = am.group(3)
                    if v is None:
                        v = am.group(4)
                    if v:
                        hrefs.append(unescape(v) if "&" in v else v)
        if selfclose:
            if tag in block_tags:
                append("\n")
            m = search(s, pos)
            continue
        if tag in drop_tags:
            if tag not in void_tags:
                drop += 1
        elif tag in block_tags:
            append("\n")
        if tag in _FAST_CDATA_END:
            # CDATA content mode: raw data (no tag parsing, no charref
            # conversion) up to the first WELL-FORMED matching end tag;
            # the content is always suppressed (drop > 0 — both tags are
            # DROP_TAGS).  html.parser tolerates mismatched "</script…"
            # lookalikes by emitting them as (suppressed) data and
            # scanning on, which skipping to the full match reproduces.
            em = _FAST_CDATA_END[tag].search(s, pos)
            if em is None:
                return None  # unterminated CDATA → EOF semantics: fallback
            if drop == 0:  # unreachable for script/style; keep faithful
                raw = s[pos : em.start()]
                if raw:
                    parts.append(raw)
            # the end tag itself: handle_endtag(script|style) → drop -= 1
            if drop > 0:
                drop -= 1
            pos = em.end()
        m = search(s, pos)
    tail = s[pos:]
    if "<" in tail or ">" in tail:
        return None
    if drop == 0 and tail:
        parts.append(_html.unescape(tail) if "&" in tail else tail)
    return parts, hrefs


def extract_html_text(body: bytes | str) -> str:
    s = decode_bytes(body)
    fast = _fast_extract_html(s)
    if fast is not None:
        return normalize_ws("".join(fast[0]))
    p = _TextExtractor()
    p.feed(s)
    p.close()
    return normalize_ws("".join(p.parts))


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1] if "}" in tag else tag


def _parse_xml(body: bytes | str) -> ET.Element | None:
    """Decode per the sniffed charset, then parse.  The XML declaration is
    stripped before ET.fromstring — ET rejects already-decoded strings
    that still carry an encoding declaration (ValueError, not
    ParseError), which made such feeds crash rather than extract."""
    s = decode_bytes(body)
    head = s.lstrip()
    if head.startswith("<?xml"):
        j = head.find("?>")
        if j != -1:
            head = head[j + 2 :]
    try:
        return ET.fromstring(head)
    except (ET.ParseError, ValueError):
        return None


def extract_feed_text(body: bytes | str) -> str:
    """RSS 2.0 / Atom → text per the module spec; malformed XML → ''."""
    root = _parse_xml(body)
    if root is None:
        return ""
    parts: list[str] = []
    kind = _local(root.tag).lower()
    if kind == "rss":
        channel = next((c for c in root if _local(c.tag) == "channel"), None)
        if channel is not None:
            for c in channel:
                if _local(c.tag) == "title" and c.text:
                    parts.append(c.text)
                    break
            for item in channel:
                if _local(item.tag) != "item":
                    continue
                for want in ("title", "description"):
                    for c in item:
                        if _local(c.tag) == want and c.text:
                            parts.append(c.text)
                            break
    elif kind == "feed":  # Atom
        for c in root:
            if _local(c.tag) == "title" and c.text:
                parts.append(c.text)
                break
        for entry in root:
            if _local(entry.tag) != "entry":
                continue
            for want in ("title", "summary", "content"):
                for c in entry:
                    if _local(c.tag) == want and c.text:
                        parts.append(c.text)
                        break
    return normalize_ws("\n".join(_html.unescape(p) for p in parts))


# --- extension surface (SURVEY.md §2.10): pluggable per-kind extractors ---
# Maps content kind → fn(url, body) -> text.  Registering a new kind (or
# overriding one) is the engine's analog of the reference's
# ``FeedType.processor`` dotted-path plugin.  The built-in entries are
# the FROZEN defaults; replacing them invalidates goldens.
EXTRACTOR_REGISTRY: dict[str, "object"] = {}


def register_extractor(kind: str, fn) -> None:
    """Plug in ``fn(url, body) -> str`` for a content kind (M6 plugin)."""
    EXTRACTOR_REGISTRY[kind] = fn


def extract_text(url: str, body: bytes | str, kind: str | None = None) -> str:
    """THE extractor (M6): dispatch on kind; robots bodies extract to ''."""
    if kind is None:
        kind = detect_kind(url, body)
    custom = EXTRACTOR_REGISTRY.get(kind)
    if custom is not None:
        return custom(url, body)
    if kind in ("robots", "sitemap", "binary"):
        return ""  # machine-readable / non-text payloads carry no text
    if kind in ("rss", "atom"):
        return extract_feed_text(body)
    return extract_html_text(body)


# absolute hrefs for which ``urljoin(base, href) == href`` PROVABLY holds
# (fuzz-verified + property-tested): lowercase http(s) scheme, plain
# domain-ish netloc, no whitespace/backslash (urlsplit strips \t\n\r), no
# "#" (no fragment to drop), no ";" (urljoin's params round-trip drops a
# trailing empty param), query non-empty if present (a bare trailing "?"
# is dropped by the round-trip).  ~35 µs of urllib per link → one regex.
_ABS_HREF_RE = re.compile(
    r"^https?://[A-Za-z0-9._\-]+(?::[0-9]+)?"
    r"(?:/[^\\\s?#;]*)?(?:\?[^\\\s#;]+)?$"
)
# mixed-case scheme variant of the same SAFE shape: urljoin's ONLY effect
# here is lowercasing the scheme — and only when the lowered scheme
# equals the base's (a cross-scheme absolute href is returned RAW by
# urljoin, uppercase scheme and all).  Netloc case is preserved either
# way.  Fuzz-verified byte-identical alongside _ABS_HREF_RE.
_ABS_HREF_ANYCASE_RE = re.compile(
    r"^([Hh][Tt][Tt][Pp][Ss]?)(://[A-Za-z0-9._\-]+(?::[0-9]+)?"
    r"(?:/[^\\\s?#;]*)?(?:\?[^\\\s#;]+)?)$"
)


def _finalize_links(url: str, raw: list[str]) -> list[str]:
    out: list[str] = []
    seen: set[str] = set()
    if url.startswith("http://"):
        base_scheme = "http"
    elif url.startswith("https://"):
        base_scheme = "https"
    else:
        base_scheme = None
    for href in raw:
        href = href.strip()
        if not href or href.startswith("#"):
            continue
        if _ABS_HREF_RE.match(href):
            absu = href
        else:
            m = _ABS_HREF_ANYCASE_RE.match(href) if base_scheme else None
            if m and m.group(1).lower() == base_scheme:
                absu = base_scheme + m.group(2)
            else:
                absu = urljoin(url, href).split("#", 1)[0]
                if not absu.startswith(("http://", "https://")):
                    continue
        if absu not in seen:
            seen.add(absu)
            out.append(absu)
    return out


def extract_page(url: str, body: bytes | str, kind: str | None = None) -> tuple[str, list[str]]:
    """Fused M6+M5: ONE parse yields (text, links) — byte-identical to
    calling extract_text and parse_links separately (golden-pinned), at
    half the parse cost.  This is the hot-path entry used by the crawl's
    ExtractStage."""
    if kind is None:
        kind = detect_kind(url, body)
    custom = EXTRACTOR_REGISTRY.get(kind)
    if custom is not None:
        return custom(url, body), []
    if kind in ("robots", "binary"):
        return "", []
    if kind == "sitemap":
        root = _parse_xml(body)
        if root is None:
            return "", []
        raw = [
            el.text.strip()
            for el in root.iter()
            if _local(el.tag) == "loc" and el.text and el.text.strip()
        ]
        return "", _finalize_links(url, raw)
    if kind in ("rss", "atom"):
        text = extract_feed_text(body)
        raw: list[str] = []
        root = _parse_xml(body)
        if root is None:
            return text, []
        for el in root.iter():
            if _local(el.tag) == "link":
                href = el.get("href") or (el.text or "").strip()
                if href:
                    raw.append(href)
        return text, _finalize_links(url, raw)
    s = decode_bytes(body)
    fast = _fast_extract_html(s)
    if fast is not None:
        return normalize_ws("".join(fast[0])), _finalize_links(url, fast[1])
    p = _TextExtractor()
    p.feed(s)
    p.close()
    return normalize_ws("".join(p.parts)), _finalize_links(url, p.hrefs)


def parse_links(url: str, body: bytes | str, kind: str | None = None) -> list[str]:
    """Outlink extraction (M5): absolute http(s) URLs, document order,
    de-duplicated first-occurrence-wins within the page."""
    if kind is None:
        kind = detect_kind(url, body)
    raw: list[str] = []
    if kind in ("robots", "binary"):
        return []
    text = decode_bytes(body)
    if kind == "sitemap":
        # sitemaps.org: <urlset><url><loc>…</loc></url></urlset> and
        # <sitemapindex><sitemap><loc>…</loc></sitemap></sitemapindex>;
        # both feed discovered URLs back into the frontier like any page
        root = _parse_xml(body)
        if root is None:
            return []
        for el in root.iter():
            if _local(el.tag) == "loc" and el.text and el.text.strip():
                raw.append(el.text.strip())
    elif kind in ("rss", "atom"):
        root = _parse_xml(body)
        if root is None:
            return []
        for el in root.iter():
            if _local(el.tag) == "link":
                href = el.get("href") or (el.text or "").strip()
                if href:
                    raw.append(href)
    else:
        fast = _fast_extract_html(text)
        if fast is not None:
            raw = fast[1]
        else:
            p = _LinkExtractor()
            p.feed(text)
            p.close()
            raw = p.hrefs
    return _finalize_links(url, raw)


# --- rel=canonical (RFC 6596) -------------------------------------------
# quoted attribute values may legally contain ">" — skip over them so the
# tag match never truncates mid-attribute and corrupts the href
_LINK_TAG_RE = re.compile(r"""<link\b(?:[^>"']|"[^"]*"|'[^']*')*>""", re.I)
# rel is a space-separated link-type token LIST (HTML spec): capture the
# whole value, then membership-test the "canonical" token
_REL_ATTR_RE = re.compile(
    r"""(?<![-\w])rel\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)
# left boundary: 'data-href=' / 'xhref=' must not match as href
_HREF_ATTR_RE = re.compile(
    r"""(?<![-\w])href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)


def extract_canonical(url: str, body: bytes | str, kind: str | None = None) -> str | None:
    """``<link rel="canonical" href=...>`` → absolute http(s) URL
    (RFC 6596), or None.  First declaration in document order wins;
    relative hrefs resolve against the fetched URL; attribute order
    inside the tag is free.  Only HTML pages carry the annotation —
    feeds/sitemaps/robots/binary return None.  Deliberately a separate
    scan: the fused text+link extractor is frozen byte-identical, so
    this opt-in feature must not touch it."""
    if kind is None:
        kind = detect_kind(url, body)
    if kind != "html":
        return None
    text = decode_bytes(body)
    for m in _LINK_TAG_RE.finditer(text):
        tag = m.group(0)
        rm = _REL_ATTR_RE.search(tag)
        if rm is not None:
            rel = next(g for g in rm.groups() if g is not None)
            if "canonical" not in rel.lower().split():
                continue
            hm = _HREF_ATTR_RE.search(tag)
            if hm is None:
                continue
            href = _html.unescape(next(g for g in hm.groups() if g is not None)).strip()
            if not href:
                continue
            absu = urljoin(url, href).split("#", 1)[0]
            if absu.split(":", 1)[0].lower() in ("http", "https"):
                return absu
    return None


# --- meta refresh (WHATWG pragma directive; the hermetic 3xx analogue) ---
_META_TAG_RE = re.compile(r"""<meta\b(?:[^>"']|"[^"]*"|'[^']*')*>""", re.I)
_HTTP_EQUIV_RE = re.compile(
    r"""(?<![-\w])http-equiv\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)
_CONTENT_ATTR_RE = re.compile(
    r"""(?<![-\w])content\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)
# WHATWG refresh value: delay digits, then ';' or ',' separator, optional
# case-insensitive "url=", the target (optionally quoted)
_REFRESH_VALUE_RE = re.compile(
    r"""^\s*(\d+)(?:\.\d*)?\s*[;,]\s*(?:url\s*=\s*)?(.+?)\s*$""", re.I | re.S
)


def extract_meta_refresh(
    url: str, body: bytes | str, kind: str | None = None, max_delay: int = 0
) -> str | None:
    """``<meta http-equiv="refresh" content="N; url=...">`` → absolute
    http(s) redirect target, or None.  The pages table has no HTTP
    status line, so the WHATWG refresh pragma is the corpus's redirect
    representation; crawler convention (documented by Google Search
    Central) treats an immediate refresh as a permanent-redirect
    analogue.  Rules: first declaration in document order wins; the
    delay must be ≤ ``max_delay`` seconds (default 0 — immediate only);
    relative targets resolve against the fetched URL; a self-target is
    a reload, not a redirect → None.  Separate scan, same reason as
    rel=canonical: the fused extractor is frozen byte-identical."""
    if kind is None:
        kind = detect_kind(url, body)
    if kind != "html":
        return None
    text = decode_bytes(body)
    for m in _META_TAG_RE.finditer(text):
        tag = m.group(0)
        hm = _HTTP_EQUIV_RE.search(tag)
        if hm is None:
            continue
        if next(g for g in hm.groups() if g is not None).strip().lower() != "refresh":
            continue
        cm = _CONTENT_ATTR_RE.search(tag)
        if cm is None:
            continue
        val = _html.unescape(next(g for g in cm.groups() if g is not None))
        vm = _REFRESH_VALUE_RE.match(val)
        if vm is None:
            continue
        if int(vm.group(1)) > max_delay:
            continue
        target = vm.group(2)
        if len(target) >= 2 and target[0] == target[-1] and target[0] in "\"'":
            target = target[1:-1].strip()
        if not target:
            continue
        absu = urljoin(url, target).split("#", 1)[0]
        if absu.split(":", 1)[0].lower() not in ("http", "https"):
            continue
        if absu == url:
            return None  # self-refresh = reload, not a redirect
        return absu
    return None


# --- robots meta + rel=nofollow (REP HTML bindings) -----------------------
# <a ...> tag matcher with the same quoted-attribute skip as _LINK_TAG_RE
_A_TAG_RE = re.compile(r"""<a\b(?:[^>"']|"[^"]*"|'[^']*')*>""", re.I)
# left boundary: 'data-name=' must not match as name
_NAME_ATTR_RE = re.compile(
    r"""(?<![-\w])name\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I
)


def extract_robots_directives(
    url: str, body: bytes | str, kind: str | None = None
) -> tuple[bool, bool, frozenset[str]]:
    """HTML bindings of the Robots Exclusion Protocol (meta robots +
    rel=nofollow, per the Google Search Central / WHATWG conventions):
    returns ``(noindex, nofollow_page, nofollow_targets)``.

    - ``<meta name="robots" content="...">``: comma-separated directive
      list; ``noindex`` suppresses indexing the page's content,
      ``nofollow`` suppresses following ALL its outlinks, ``none`` is
      shorthand for both.  Multiple meta tags union (most restrictive
      wins); name/content order inside the tag is free.
    - ``<a rel="nofollow" href=...>``: rel is a space-separated token
      list; a target linked with nofollow anywhere on the page lands in
      ``nofollow_targets``, finalized through the SAME pipeline as
      :func:`parse_links` so set membership matches the extractor's
      links column exactly.

    Deliberately a separate scan (the rel=canonical / meta-refresh
    precedent): the fused text+link extractor is frozen byte-identical,
    so this opt-in feature must not touch it."""
    if kind is None:
        kind = detect_kind(url, body)
    if kind != "html":
        return False, False, frozenset()
    text = decode_bytes(body)
    noindex = nofollow = False
    for m in _META_TAG_RE.finditer(text):
        tag = m.group(0)
        nm = _NAME_ATTR_RE.search(tag)
        if nm is None:
            continue
        if next(g for g in nm.groups() if g is not None).strip().lower() != "robots":
            continue
        cm = _CONTENT_ATTR_RE.search(tag)
        if cm is None:
            continue
        val = _html.unescape(next(g for g in cm.groups() if g is not None)).lower()
        toks = {t.strip() for t in val.split(",")}
        if "none" in toks:
            noindex = nofollow = True
        if "noindex" in toks:
            noindex = True
        if "nofollow" in toks:
            nofollow = True
    raw: list[str] = []
    if not nofollow:  # page-level nofollow suppresses every link anyway
        for m in _A_TAG_RE.finditer(text):
            tag = m.group(0)
            rm = _REL_ATTR_RE.search(tag)
            if rm is None:
                continue
            if "nofollow" not in next(
                g for g in rm.groups() if g is not None
            ).lower().split():
                continue
            hm = _HREF_ATTR_RE.search(tag)
            if hm is None:
                continue
            raw.append(_html.unescape(next(g for g in hm.groups() if g is not None)))
    return noindex, nofollow, frozenset(_finalize_links(url, raw))


# --- soft-404 detection ---------------------------------------------------
# An HTTP-200 page whose CONTENT says "not found" (Bar-Yossef, Broder,
# Kumar & Tomkins, WWW 2004 "Sic transit gloria telae").  The published
# method probes a random sibling URL over live HTTP; a batch engine over
# an archived pages table uses the standard signature heuristic instead:
# a SHORT page whose opening text carries a not-found marker.  The rule
# is FROZEN (status values feed the crawl log contract):
#   soft404(text) ⇔ len(text) ≤ 512 and the first 256 chars (lowercased)
#   match _SOFT404_RE.
_SOFT404_RE = re.compile(
    r"(?:\b404\b|page not found|file not found|document not found"
    r"|does not exist|no longer (?:available|exists)|cannot be found)"
)


def detect_soft404(text: str | None, max_chars: int = 512) -> bool:
    """Frozen soft-404 signature heuristic (see module comment above).
    Long pages never match — real content can mention '404'."""
    if text is None or len(text) > max_chars:
        return False
    return _SOFT404_RE.search(text[:256].lower()) is not None
