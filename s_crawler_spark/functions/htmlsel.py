"""Minimal DOM + CSS-selector engine (stdlib-only) for the extraction kernels.

The reference crawler locates page elements with Selenium CSS selectors
(reference: src/config.py:41-48, src/link_collector.py:148-240,
src/pdf_processor.py:79-208,332-342). This module re-implements exactly the
selector grammar that selector inventory requires — nothing more:

- compound selectors: ``tag``, ``#id``, ``.class`` (multiple), ``[attr='v']``,
  ``[attr*='v']`` (and ``^=`` / ``$=`` for completeness)
- combinators: descendant (whitespace), child (``>``), adjacent sibling (``+``)
- selector lists (``,``)

Matching semantics mirror Selenium/querySelector:

- ``find_element`` → first match in document (pre-)order, or ``None``
- ``find_elements`` → all matches in document order
- both are scoped to the subtree of the context node (like
  ``card.find_element(...)`` in src/link_collector.py:159)

``Element.text`` approximates Selenium's rendered ``.text`` (innerText): all
descendant text, whitespace runs collapsed to single spaces, stripped. The
synthetic corpus keeps one text node per leaf element, where this definition
coincides byte-for-byte with Selenium's.

This runs *inside* Arrow-batched pandas UDFs only (the slow path is per-HTML
parse, amortized over Arrow batches); nothing here touches Spark APIs.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_WS_RE = re.compile(r"\s+")


class Element:
    __slots__ = ("tag", "attrs", "children", "parent", "_texts")

    def __init__(self, tag, attrs, parent):
        self.tag = tag
        self.attrs = attrs
        self.children = []
        self.parent = parent
        self._texts = []  # interleaved raw text chunks

    @property
    def classes(self):
        return self.attrs.get("class", "").split()

    def iter(self):
        """Pre-order (document-order) traversal including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            stack.extend(reversed(node.children))

    def _collect_text(self, out):
        out.extend(self._texts)
        for ch in self.children:
            ch._collect_text(out)

    @property
    def text(self):
        out = []
        self._collect_text(out)
        return _WS_RE.sub(" ", "".join(out)).strip()

    def get_attribute(self, name):
        return self.attrs.get(name)

    def prev_element_sibling(self):
        if self.parent is None:
            return None
        sibs = self.parent.children
        idx = sibs.index(self)
        return sibs[idx - 1] if idx > 0 else None


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", {}, None)
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(el)
        if tag not in _VOID_TAGS:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        el = Element(tag, dict(attrs), self._stack[-1])
        self._stack[-1].children.append(el)

    def handle_endtag(self, tag):
        # close the nearest open element with this tag (forgiving parse)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1]._texts.append(data)


def parse_html(html):
    """Parse an HTML string (or utf-8 bytes) into a DOM root Element."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


# --------------------------------------------------------------------------
# CSS selector subset
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
    (?P<combinator>\s*[>+]\s*|\s+)
  | (?P<tag>\*|[a-zA-Z][\w-]*)
  | \#(?P<id>[\w-]+)
  | \.(?P<cls>[\w-]+)
  | \[(?P<attr>[\w-]+)(?:(?P<op>[*^$]?=)(?P<q>['"]?)(?P<val>[^\]'"]*)(?P=q))?\]
    """,
    re.VERBOSE,
)


class _Compound:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self):
        self.tag = None
        self.id = None
        self.classes = []
        self.attrs = []  # (name, op, value) — op None means presence

    def matches(self, el):
        if el.parent is None:  # document root never matches
            return False
        if self.tag is not None and self.tag != "*" and el.tag != self.tag:
            return False
        if self.id is not None and el.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = el.classes
            for c in self.classes:
                if c not in have:
                    return False
        for name, op, val in self.attrs:
            got = el.attrs.get(name)
            if got is None:
                return False
            if op == "=" and got != val:
                return False
            if op == "*=" and val not in got:
                return False
            if op == "^=" and not got.startswith(val):
                return False
            if op == "$=" and not got.endswith(val):
                return False
        return True


def _compile_one(selector):
    """Compile a single (comma-free) selector into [(combinator, compound)].

    combinator is one of None (first), ' ', '>', '+'.
    """
    parts = []
    cur = None
    pending_comb = None
    pos = 0
    selector = selector.strip()
    while pos < len(selector):
        m = _TOKEN_RE.match(selector, pos)
        if not m:
            raise ValueError(f"unsupported selector syntax at {selector[pos:]!r}")
        pos = m.end()
        if m.group("combinator") is not None:
            comb = m.group("combinator").strip() or " "
            if cur is not None:
                parts.append((pending_comb, cur))
                cur = None
            pending_comb = comb
            continue
        if cur is None:
            cur = _Compound()
        if m.group("tag"):
            cur.tag = m.group("tag")
        elif m.group("id"):
            cur.id = m.group("id")
        elif m.group("cls"):
            cur.classes.append(m.group("cls"))
        elif m.group("attr"):
            cur.attrs.append((m.group("attr"), m.group("op"), m.group("val")))
    if cur is not None:
        parts.append((pending_comb, cur))
    if not parts:
        raise ValueError(f"empty selector: {selector!r}")
    return parts


_COMPILE_CACHE = {}


def compile_selector(selector):
    key = selector
    got = _COMPILE_CACHE.get(key)
    if got is None:
        got = [_compile_one(s) for s in selector.split(",") if s.strip()]
        _COMPILE_CACHE[key] = got
    return got


def _matches_chain(el, chain, idx):
    """el matches chain[idx]; check the left context up the tree.

    Like querySelectorAll-on-an-element (what Selenium's find-element-from-
    element uses), combinator context may reach *above* the scope node; only
    the candidate itself is restricted to the scope's subtree.
    """
    if idx == 0:
        return True
    comb, _ = chain[idx]
    _, left = chain[idx - 1]
    if comb == ">":
        p = el.parent
        return p is not None and left.matches(p) and _matches_chain(p, chain, idx - 1)
    if comb == "+":
        s = el.prev_element_sibling()
        return s is not None and left.matches(s) and _matches_chain(s, chain, idx - 1)
    # descendant
    p = el.parent
    while p is not None:
        if left.matches(p) and _matches_chain(p, chain, idx - 1):
            return True
        p = p.parent
    return False


def _iter_matches(scope, compiled):
    last_idx = {id(chain): len(chain) - 1 for chain in compiled}
    for node in scope.iter():
        if node is scope:
            continue
        for chain in compiled:
            li = last_idx[id(chain)]
            if chain[li][1].matches(node) and _matches_chain(node, chain, li):
                yield node
                break


def find_elements(scope, selector):
    """All matches in document order within scope's subtree (scope excluded)."""
    return list(_iter_matches(scope, compile_selector(selector)))


def find_element(scope, selector):
    """First match in document order, or None (Selenium find_element analogue)."""
    for node in _iter_matches(scope, compile_selector(selector)):
        return node
    return None
