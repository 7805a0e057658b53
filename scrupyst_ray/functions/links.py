"""Link extraction — reference ``LxmlLinkExtractor`` semantics without lxml.

Reimplements the follow-all configuration of the reference link extractor
(``scrapy/linkextractors/lxmlhtml.py:60-284`` + defaults
``linkextractors/__init__.py:18-133``) on the stdlib ``html.parser`` (lxml is
not installed in this environment):

per <a>/<area> href, in document order:
  strip_html5_whitespace → urljoin(base_url, href) → safe_url_string(url,
  encoding=response_encoding) → urljoin(response_url, url)
  → Link(url, text=subtree string content, nofollow=rel contains "nofollow")
filters (``_link_allowed``):
  scheme ∈ {http, https, file, ftp} · allow/deny regex · allow/deny domains ·
  IGNORED_EXTENSIONS (url_has_any_extension) · restrict_text
region restriction (``restrict_regions``): the ``restrict_xpaths`` /
  ``restrict_css`` analog (``lxmlhtml.py:88-101,217-249``) expressible on
  ``html.parser``:
  - CSS subset: ``tag`` / ``#id`` / ``.class`` / ``tag#id`` / ``tag.class``
    single steps, plus DESCENDANT chains (``div#main p``) — the common
    ``restrict_css`` shapes (the ``>`` child combinator stays unsupported —
    it needs adjacency, raise rather than silently approximate);
  - XPath subset: ``//tag``, ``//*`` steps with one optional predicate —
    ``[@id='v']``, ``[@class='v']`` (EXACT attribute equality, lxml
    semantics), ``[contains(@class,'v')]`` (substring on the class string,
    lxml semantics) — and ``//``-separated descendant chains
    (``//div[@id='main']//a``), the common ``restrict_xpaths`` shapes.
  An anchor qualifies when it or an open ancestor COMPLETES a chain matched
  as an ordered subsequence of the ancestor path (greedy prefix automaton on
  the element stack, void elements skipped).  Covers the reference's own
  restrict test fixtures (``tests/test_linkextractors.py:226-292``, ported);
  full XPath (axes, functions, positional predicates) remains env-blocked
  on lxml/parsel, COVERAGE.md.
dedup: first occurrence per ``canonicalize_url(url, keep_fragments=True)``
  (``lxmlhtml.py:56-57,154-157``, unique=True default)
base_url: first ``<base href>`` in the first 4096 characters of the decoded
  body, resolved against the response URL (w3lib ``get_base_url`` semantics,
  used at ``scrapy/utils/response.py`` / ``lxmlhtml.py:141-145``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser
from urllib.parse import urljoin

import pyarrow as pa

from scrupyst_ray.functions.urlnorm import (
    canonicalize_url,
    make_joiner,
    safe_url_string,
    strip_html5_whitespace,
    url_has_any_extension,
    url_is_from_any_domain,
)

# reference linkextractors/__init__.py:18-116 (verbatim list, public constant)
IGNORED_EXTENSIONS = frozenset(
    [
        # archives
        "7z", "7zip", "bz2", "rar", "tar", "tar.gz", "xz", "zip",
        # images
        "mng", "pct", "bmp", "gif", "jpg", "jpeg", "png", "pst", "psp",
        "tif", "tiff", "ai", "drw", "dxf", "eps", "ps", "svg", "cdr",
        "ico", "webp",
        # audio
        "mp3", "wma", "ogg", "wav", "ra", "aac", "mid", "au", "aiff",
        # video
        "3gp", "asf", "asx", "avi", "mov", "mp4", "mpg", "qt", "rm",
        "swf", "wmv", "m4a", "m4v", "flv", "webm",
        # office suites
        "xls", "xlsm", "xlsx", "xltm", "xltx", "potm", "potx", "ppt",
        "pptm", "pptx", "pps", "doc", "docb", "docm", "docx", "dotm",
        "dotx", "odt", "ods", "odg", "odp",
        # other
        "css", "pdf", "exe", "bin", "rss", "dmg", "iso", "apk", "jar",
        "sh", "rb", "js", "hta", "bat", "cpl", "msi", "msp", "py",
    ]
)

_VALID_SCHEMES = frozenset(["http", "https", "file", "ftp"])

_BASEURL_RE = re.compile(r"<base\s[^>]*href\s*=\s*[\"']?([^\"'\s>]+)", re.I)


def get_base_url(text: str, response_url: str) -> str:
    """First <base href> in the first 4 KiB of *text*, joined to the response
    URL (w3lib ``get_base_url``)."""
    m = _BASEURL_RE.search(text[:4096])
    if m:
        return urljoin(safe_url_string(response_url), safe_url_string(m.group(1)))
    return safe_url_string(response_url)


def _rel_has_nofollow(rel: str | None) -> bool:
    return rel is not None and "nofollow" in rel.replace(",", " ").split()


# elements that never take an end tag (HTML5 void elements) — not pushed on
# the ancestor stack
_VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_SELECTOR_RE = re.compile(r"^([a-zA-Z][\w-]*)?(?:#([\w-]+)|\.([\w-]+))?$")


def parse_region_selector(sel: str) -> tuple[str | None, str | None, str | None]:
    """``tag`` / ``#id`` / ``.class`` / ``tag#id`` / ``tag.class`` →
    (tag, id, class); raises on anything outside the subset."""
    m = _SELECTOR_RE.match(sel.strip())
    if m is None or not any(m.groups()):
        raise ValueError(f"unsupported region selector: {sel!r}")
    tag, id_, cls = m.groups()
    return (tag.lower() if tag else None, id_, cls)


def _element_matches(
    sel: tuple[str | None, str | None, str | None],
    tag: str,
    attrs: dict[str, str | None],
) -> bool:
    stag, sid, scls = sel
    if stag is not None and tag != stag:
        return False
    if sid is not None and attrs.get("id") != sid:
        return False
    if scls is not None and scls not in (attrs.get("class") or "").split():
        return False
    return True


# one step of a region chain: tag/None, id, class-TOKEN (CSS .class),
# class-EXACT ([@class='v']), class-SUBSTRING ([contains(@class,'v')])
_XPATH_STEP_RE = re.compile(
    r"^([a-zA-Z][\w-]*|\*)"
    r"(?:\[(?:"
    r"@id\s*=\s*(?P<q1>['\"])(?P<id>[^'\"]*)(?P=q1)"
    r"|@class\s*=\s*(?P<q2>['\"])(?P<cls>[^'\"]*)(?P=q2)"
    r"|contains\(\s*@class\s*,\s*(?P<q3>['\"])(?P<sub>[^'\"]*)(?P=q3)\s*\)"
    r")\])?$"
)


def _xpath_step(step: str) -> tuple:
    m = _XPATH_STEP_RE.match(step.strip())
    if m is None:
        raise ValueError(f"unsupported region xpath step: {step!r}")
    tag = m.group(1)
    return (
        None if tag == "*" else tag.lower(),
        m.group("id"),
        None,
        m.group("cls"),
        m.group("sub"),
    )


def parse_region_expr(expr: str) -> list[tuple]:
    """One restrict expression → a DESCENDANT chain of element predicates
    ``(tag, id, cls_token, cls_exact, cls_substr)``:

    - ``//``-prefixed: XPath subset, steps split on ``//``;
    - otherwise CSS subset, steps split on whitespace (descendant
      combinator); ``>`` raises (child adjacency is not approximated).
    """
    expr = expr.strip()
    if expr.startswith("//"):
        return [_xpath_step(s) for s in expr[2:].split("//")]
    if ">" in expr:
        raise ValueError(f"unsupported region selector: {expr!r}")
    steps = expr.split()
    if not steps:
        raise ValueError(f"unsupported region selector: {expr!r}")
    return [parse_region_selector(s) + (None, None) for s in steps]


def _pred_matches(pred: tuple, tag: str, attrs: dict[str, str | None]) -> bool:
    ptag, pid, pcls_tok, pcls_exact, pcls_sub = pred
    if ptag is not None and tag != ptag:
        return False
    if pid is not None and attrs.get("id") != pid:
        return False
    if pcls_tok is not None and pcls_tok not in (attrs.get("class") or "").split():
        return False
    if pcls_exact is not None and (attrs.get("class") or "") != pcls_exact:
        return False
    if pcls_sub is not None and pcls_sub not in (attrs.get("class") or ""):
        return False
    return True


@dataclass
class Link:
    url: str
    text: str = ""
    nofollow: bool = False


class _AnchorParser(HTMLParser):
    """Collect (href, rel, subtree-text, in_region) for <a>/<area>, in
    document order.

    *collect_text=False* skips anchor-text accumulation (the crawl hot path
    never reads it; only the edges query surface and ``restrict_text`` do).
    *regions* (parsed selectors) restrict anchors to matching elements or
    their descendants; with no regions every anchor is in-region."""

    def __init__(
        self,
        collect_text: bool = True,
        regions: list[tuple[str | None, str | None, str | None]] | None = None,
        tags: tuple[str, ...] = ("a", "area"),
        attrs: tuple[str, ...] = ("href",),
    ) -> None:
        super().__init__(convert_charrefs=True)
        self.anchors: list[list] = []  # [href, rel, [text chunks], in_region]
        self._open: list[list] = []  # stack of currently-open anchor entries
        self._collect_text = collect_text
        # regions: list of chains; a legacy 3-tuple selector is a 1-chain
        self._regions: list[list[tuple]] = [
            [r + (None, None)] if isinstance(r, tuple) else list(r)
            for r in (regions or [])
        ]
        # greedy prefix automaton per chain: _prefix[i] = longest prefix of
        # chain i matched as an ordered subsequence of the open-element path
        self._prefix: list[int] = [0] * len(self._regions)
        # stack entry: (tag, [(chain_idx, old_prefix)...], n_completed_here)
        self._stack: list[tuple[str, list[tuple[int, int]], int]] = []
        self._region_depth = 0
        self._tags = tags
        self._attrs = attrs

    def _in_region(self, tag: str, d: dict[str, str | None]) -> bool:
        if not self._regions:
            return True
        if self._region_depth > 0:
            return True
        # the element itself may complete a chain (e.g. '//a', 'a.nav')
        return any(
            self._prefix[i] == len(c) - 1 and _pred_matches(c[-1], tag, d)
            for i, c in enumerate(self._regions)
        )

    def _emit(
        self, tag: str, attrs: list[tuple[str, str | None]], d: dict
    ) -> list | None:
        """Append one entry per scanned attribute present on the element
        (reference ``_iter_links`` scans attributes in element order); all
        entries of one <a> share the text-chunk list.  Returns the shared
        text entry to push on the open stack (or None)."""
        rel = d.get("rel")
        in_region = self._in_region(tag, d)
        chunks: list[str] = []
        first = None
        for name, value in attrs:
            if name in self._attrs and value is not None:
                entry = [value, rel, chunks, in_region]
                self.anchors.append(entry)
                if first is None:
                    first = entry
        return first

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        d = dict(attrs)
        if tag in self._tags:
            entry = self._emit(tag, attrs, d)
            if entry is not None and tag == "a" and self._collect_text:
                self._open.append(entry)
        if self._regions and tag not in _VOID_ELEMENTS:
            deltas: list[tuple[int, int]] = []
            completed = 0
            for i, chain in enumerate(self._regions):
                p = self._prefix[i]
                if p < len(chain) and _pred_matches(chain[p], tag, d):
                    deltas.append((i, p))
                    self._prefix[i] = p + 1
                    if p + 1 == len(chain):
                        completed += 1
            self._stack.append((tag, deltas, completed))
            self._region_depth += completed

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        if tag in self._tags:
            self._emit(tag, attrs, dict(attrs))

    def handle_endtag(self, tag: str) -> None:
        if tag == "a" and self._open:
            self._open.pop()
        if self._regions and tag not in _VOID_ELEMENTS:
            # lenient recovery: close up to the nearest matching open tag,
            # restoring chain-prefix state innermost-first
            for i in range(len(self._stack) - 1, -1, -1):
                if self._stack[i][0] == tag:
                    for _, deltas, completed in reversed(self._stack[i:]):
                        self._region_depth -= completed
                        for ci, old_p in deltas:
                            self._prefix[ci] = old_p
                    del self._stack[i:]
                    break

    def handle_data(self, data: str) -> None:
        for entry in self._open:
            entry[2].append(data)


@dataclass
class LinkExtractorConfig:
    """Follow-all defaults of the reference ``LxmlLinkExtractor``."""

    allow: list[str] = field(default_factory=list)  # regex whitelist
    deny: list[str] = field(default_factory=list)  # regex blacklist
    allow_domains: list[str] = field(default_factory=list)
    deny_domains: list[str] = field(default_factory=list)
    deny_extensions: frozenset[str] = IGNORED_EXTENSIONS
    restrict_text: list[str] = field(default_factory=list)
    # restrict_xpaths/css analog: CSS-subset selectors (tag/#id/.class)
    restrict_regions: list[str] = field(default_factory=list)
    unique: bool = True
    # reference LxmlLinkExtractor extras (lxmlhtml.py:102-160):
    tags: tuple[str, ...] = ("a", "area")  # elements scanned for links
    attrs: tuple[str, ...] = ("href",)  # attributes read off those elements
    # href hook applied BEFORE joining (None ⇒ drop the link) — the
    # reference's process_value (e.g. pull a URL out of a javascript: href)
    process_value: object = None
    # emit canonicalized URLs (dedup always keys on the canonical form)
    canonicalize: bool = False

    def __post_init__(self) -> None:
        self._allow_res = [re.compile(r) for r in self.allow]
        self._deny_res = [re.compile(r) for r in self.deny]
        self._restrict_res = [re.compile(r) for r in self.restrict_text]
        self._region_sels = [parse_region_expr(s) for s in self.restrict_regions]

    def link_allowed(self, link: Link) -> bool:
        # mirrors LxmlLinkExtractor._link_allowed (lxmlhtml.py:217-249)
        scheme = link.url.split("://", 1)[0]
        if scheme not in _VALID_SCHEMES:
            return False
        if self._allow_res and not any(r.search(link.url) for r in self._allow_res):
            return False
        if self._deny_res and any(r.search(link.url) for r in self._deny_res):
            return False
        if self.allow_domains and not url_is_from_any_domain(
            link.url, self.allow_domains
        ):
            return False
        if self.deny_domains and url_is_from_any_domain(link.url, self.deny_domains):
            return False
        if self.deny_extensions and url_has_any_extension(
            link.url, self.deny_extensions
        ):
            return False
        if self._restrict_res and not any(
            r.search(link.text) for r in self._restrict_res
        ):
            return False
        return True


DEFAULT_EXTRACTOR = LinkExtractorConfig()


def extract_links(
    text: str,
    response_url: str,
    response_encoding: str = "utf-8",
    config: LinkExtractorConfig = DEFAULT_EXTRACTOR,
    collect_text: bool = True,
) -> list[Link]:
    """All followable links of one decoded page, reference order & filters.

    *collect_text=False* returns links with empty ``text`` (crawl hot path;
    incompatible with a ``restrict_text`` config, which reads the text)."""
    if config._restrict_res:
        collect_text = True
    parser = _AnchorParser(
        collect_text=collect_text,
        regions=config._region_sels,
        tags=config.tags,
        attrs=config.attrs,
    )
    try:
        parser.feed(text)
        parser.close()
    except Exception:
        pass  # recover what was parsed so far (lxml is similarly lenient)
    base_url = get_base_url(text, response_url)
    response_url_safe = safe_url_string(response_url)
    join_base = make_joiner(base_url)

    links: list[Link] = []
    for href, rel, chunks, in_region in parser.anchors:
        if not in_region:
            continue
        try:
            attr_val = strip_html5_whitespace(href)
            if config.process_value is not None:
                attr_val = config.process_value(attr_val)  # type: ignore[operator]
                if attr_val is None:
                    continue  # hook dropped the link (reference process_attr)
            attr_val = join_base(attr_val)
        except ValueError:
            continue  # bogus link
        try:
            url = safe_url_string(attr_val, encoding=response_encoding)
        except ValueError:
            continue
        # urljoin with an absolute reference (scheme + netloc) is the
        # identity (Python does not dot-normalize absolute refs), so skip
        # the re-parse for the common case — verified in test_links parity
        if not (
            (url.startswith("http://") or url.startswith("https://"))
            and url[url.index("//") + 2 : url.index("//") + 3] not in ("", "/", "?", "#")
        ):
            url = urljoin(response_url_safe, url)
        if config.canonicalize:
            url = canonicalize_url(url)
        link = Link(url, "".join(chunks), nofollow=_rel_has_nofollow(rel))
        if config.link_allowed(link):
            links.append(link)

    if config.unique:
        seen: set[str] = set()
        deduped: list[Link] = []
        for link in links:
            key = canonicalize_url(link.url, keep_fragments=True)
            if key not in seen:
                seen.add(key)
                deduped.append(link)
        return deduped
    return links


_EDGE_SCHEMA = pa.schema(
    [
        ("src", pa.string()),
        ("dst", pa.string()),
        ("anchor", pa.string()),
        ("nofollow", pa.bool_()),
        ("link_idx", pa.int32()),
    ]
)


def extract_links_batch(
    texts: list[str],
    urls: list[str],
    encodings: list[str],
    config: LinkExtractorConfig = DEFAULT_EXTRACTOR,
) -> pa.Table:
    """Explode pages → edges table ``(src, dst, anchor, nofollow, link_idx)``.
    ``link_idx`` is the per-page document-order index (deterministic seq
    tiebreaker for frontier ordering parity, SURVEY.md §4.2)."""
    src: list[str] = []
    dst: list[str] = []
    anchor: list[str] = []
    nofollow: list[bool] = []
    link_idx: list[int] = []
    for text, url, enc in zip(texts, urls, encodings):
        for i, link in enumerate(extract_links(text, url, enc, config)):
            src.append(url)
            dst.append(link.url)
            anchor.append(link.text)
            nofollow.append(link.nofollow)
            link_idx.append(i)
    return pa.table(
        {
            "src": pa.array(src, pa.string()),
            "dst": pa.array(dst, pa.string()),
            "anchor": pa.array(anchor, pa.string()),
            "nofollow": pa.array(nofollow, pa.bool_()),
            "link_idx": pa.array(link_idx, pa.int32()),
        },
        schema=_EDGE_SCHEMA,
    )
