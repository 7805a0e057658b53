"""Property test: the streaming NFA region matcher equals a brute-force
DOM evaluator on random trees and random selector chains.

The brute-force side builds the element tree explicitly and evaluates a
chain by recursive search (descendant steps may skip levels, child steps
must not), marking every element inside (or at) a chain-completing element
as in-region — the declarative spec the one-pass stack NFA implements."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scrupyst_ray.functions.links import (
    LinkExtractorConfig,
    extract_links,
    parse_region_expr,
    _pred_matches,
)

TAGS = ["div", "p", "span", "ul", "li", "section"]
CLASSES = [None, "a", "b", "c"]
IDS = [None, "m", "x"]


@st.composite
def tree(draw, depth=0):
    """A random element subtree as (tag, cls, id_, children, anchor_name)."""
    tag = draw(st.sampled_from(TAGS))
    cls = draw(st.sampled_from(CLASSES))
    id_ = draw(st.sampled_from(IDS))
    n_children = draw(
        st.integers(min_value=0, max_value=0 if depth >= 3 else 3)
    )
    children = [draw(tree(depth=depth + 1)) for _ in range(n_children)]
    return (tag, cls, id_, children, None)


@st.composite
def chain_expr(draw):
    """A random CSS chain of 1-3 steps with random > combinators."""
    n = draw(st.integers(min_value=1, max_value=3))
    parts = []
    for i in range(n):
        tag = draw(st.sampled_from(TAGS + [""]))
        cls = draw(st.sampled_from(CLASSES))
        sel = tag + (f".{cls}" if cls else "")
        if not sel:
            sel = draw(st.sampled_from(TAGS))
        parts.append(sel)
        if i < n - 1:
            parts.append(draw(st.sampled_from([" ", " > "])))
    return "".join(parts)


def number_anchors(roots):
    """Pre-order anchor index per element (shared by render + collect, so
    hrefs are unique and positions comparable)."""
    ids: dict[int, int] = {}

    def walk(node):
        ids[id(node)] = len(ids)
        for ch in node[3]:
            walk(ch)

    for r in roots:
        walk(r)
    return ids


def render(node, out, ids):
    tag, cls, id_, children, _ = node
    attrs = ""
    if cls:
        attrs += f" class='{cls}'"
    if id_:
        attrs += f" id='{id_}'"
    out.append(f"<{tag}{attrs}>")
    out.append(f"<a href='/l{ids[id(node)]}.html'>t</a>")
    for ch in children:
        render(ch, out, ids)
    out.append(f"</{tag}>")


def brute_force_in_region(roots, chains, ids):
    """Set of anchor names inside (or at) any chain-completing element."""
    completing: set[int] = set()  # id() of completing element nodes

    def attrs_of(node):
        tag, cls, id_, _, _ = node
        d = {}
        if cls is not None:
            d["class"] = cls
        if id_ is not None:
            d["id"] = id_
        return tag, d

    def walk(node, states):
        # states: list of (chain, p) meaning p steps matched at ancestors,
        # with a flag for whether the advance element was the DIRECT parent
        tag, d = attrs_of(node)
        new_states = []
        for chain in chains:
            if _pred_matches(chain[0], tag, d):
                new_states.append((chain, 1, True))
        for chain, p, at_parent in states:
            if p < len(chain):
                nxt = chain[p]
                if nxt[6] and not at_parent:
                    continue
                if _pred_matches(nxt, tag, d):
                    new_states.append((chain, p + 1, True))
        for chain, p, _ in new_states:
            if p == len(chain):
                completing.add(id(node))
        # descend: states created here are at_parent for children; states
        # inherited stay valid for descendant steps but not child steps
        child_states = new_states + [
            (c, p, False) for c, p, _ in states
        ]
        for ch in node[3]:
            walk(ch, child_states)

    for r in roots:
        walk(r, [])

    out: set[int] = set()

    def collect(node, inside):
        inside = inside or id(node) in completing
        if inside:
            out.add(ids[id(node)])
        for ch in node[3]:
            collect(ch, inside)

    for r in roots:
        collect(r, False)
    return out


@settings(max_examples=150, deadline=None)
@given(
    roots=st.lists(tree(), min_size=1, max_size=3),
    exprs=st.lists(chain_expr(), min_size=1, max_size=2),
)
def test_nfa_matches_brute_force(roots, exprs):
    chains = [parse_region_expr(e) for e in exprs]
    ids = number_anchors(roots)
    expected = brute_force_in_region(roots, chains, ids)

    parts: list[str] = ["<html><body>"]
    for r in roots:
        render(r, parts, ids)
    parts.append("</body></html>")
    html = "".join(parts)

    cfg = LinkExtractorConfig(restrict_regions=exprs)
    got = {
        int(l.url.rsplit("/l", 1)[1].split(".")[0])
        for l in extract_links(html, "http://x.test/", config=cfg)
    }
    assert got == expected, (exprs, html)
