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
import types
from html.parser import HTMLParser

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

_WS_RE = re.compile(r"\s+")


class Element:
    # children/_texts are LAZY (None until first append): most elements are
    # leaves and most carry no text, so eagerly allocating two lists per
    # element doubles the parser's allocation rate — pure memory-bandwidth
    # cost on Common-Crawl-weight pages (the 4→16-core scaling limiter on a
    # single box). Use ``el.children or ()`` to iterate. _texts holds the
    # SINGLE chunk as a bare str (the overwhelmingly common case — one text
    # run per element) and promotes to a list only on a second chunk, so a
    # text-bearing element costs zero extra allocations, not one list.
    __slots__ = ("tag", "attrs", "children", "parent", "_texts", "_classes",
                 "_ord", "_ord_end", "_indexes")

    def __init__(self, tag, attrs, parent, classes=None):
        self.tag = tag
        self.attrs = attrs
        self.children = None
        self.parent = parent
        self._texts = None   # interleaved raw text chunks (lazy)
        self._classes = classes  # memoized split class list (fast parser)
        self._ord = 0        # document-order number (index pass)
        self._ord_end = 0    # max _ord in this subtree (index pass)
        self._indexes = None  # on the root: (class_idx, tag_idx, id_idx)

    @property
    def classes(self):
        # a bare `class` attribute parses to None (stdlib semantics) —
        # selector queries must treat it as class-less, not crash. The fast
        # parser hands in the split memoized with the attrs string; other
        # construction paths compute it on demand.
        c = self._classes
        if c is not None:
            return c
        return (self.attrs.get("class") or "").split()

    def iter(self):
        """Pre-order (document-order) traversal including self."""
        stack = [self]
        while stack:
            node = stack.pop()
            yield node
            if node.children:
                stack.extend(reversed(node.children))

    def _collect_text(self, out):
        t = self._texts
        if t is not None:
            if type(t) is str:
                out.append(t)
            else:
                out.extend(t)
        if self.children:
            for ch in self.children:
                ch._collect_text(out)

    @property
    def text(self):
        if self.children is None:  # leaf fast path: no accumulator list
            t = self._texts
            if t is None:
                return ""
            if type(t) is str:
                return _WS_RE.sub(" ", t).strip()
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

    def _append_child(self, el):
        parent = self._stack[-1]
        if parent.children is None:
            parent.children = []
        parent.children.append(el)

    def handle_starttag(self, tag, attrs):
        el = Element(tag, dict(attrs), self._stack[-1])
        self._append_child(el)
        if tag not in _VOID_TAGS:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self._append_child(Element(tag, dict(attrs), self._stack[-1]))

    def handle_endtag(self, tag):
        # close the nearest open element with this tag (forgiving parse)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            _add_text(self._stack[-1], data)


def parse_html_stdlib(html):
    """Reference parse path via stdlib HTMLParser (kept as the equivalence
    oracle for the fast tokenizer — tests/test_htmlsel.py compares the two
    tree-for-tree over the whole corpus)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    b = _DomBuilder()
    b.feed(html)
    b.close()
    return b.root


# Fast tokenizer: one regex scan instead of HTMLParser's char-by-char state
# machine (~4-5x on Common-Crawl-weight pages). Semantics mirror
# HTMLParser(convert_charrefs=True): lowercased tag/attr names, entity
# unescape in text and attribute values, last duplicate attribute wins,
# forgiving unmatched end tags, script/style/comment contents skipped.
_FAST_TAG_RE = re.compile(
    r"""<(?:
        (?P<comment>!--)
      | (?P<decl>[!?][^>]*)>
      | (?P<end>/)\s*(?P<endtag>[a-zA-Z][a-zA-Z0-9-]*)[^>]*>
      | (?P<tag>[a-zA-Z][a-zA-Z0-9-]*)
        (?P<attrs>(?:"[^"]*"|'[^']*'|[^>"'])*)>
    )""",
    re.VERBOSE | re.DOTALL,
)
# Char-dispatched split of _FAST_TAG_RE (parse_html peeks at html[lt+1] and
# picks the branch directly): the big alternation tried-and-failed 3
# branches per start tag and extracted 4+ discriminator groups per match —
# these two patterns have the same accept/reject language per branch, one
# group call each. _FAST_TAG_RE stays as the documented combined grammar.
_START_TAG_RE = re.compile(
    r"<([a-zA-Z][a-zA-Z0-9-]*)((?:\"[^\"]*\"|'[^']*'|[^>\"'])*)>")
_END_TAG_RE = re.compile(r"</\s*([a-zA-Z][a-zA-Z0-9-]*)[^>]*>")
_FAST_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)
        (?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]*)))?""",
    re.VERBOSE,
)
_RAWTEXT_CLOSE = {
    "script": re.compile(r"</script", re.IGNORECASE),
    "style": re.compile(r"</style", re.IGNORECASE),
}

from html import unescape as _unescape
from sys import intern as _intern


def _parse_attrs_uncached(s):
    """attrs dict + self-close flag. The attrs capture consumes any '/'
    before '>', so self-closing is decided here: a trailing '/' NOT consumed
    by an attribute match marks the tag self-closing (stdlib semantics — '/'
    may appear inside an unquoted attr *value* like href=http://x/, but
    never in an attribute name)."""
    if not s or s.isspace():
        return {}, s.endswith("/") if s else False
    out = {}
    last_end = 0
    for m in _FAST_ATTR_RE.finditer(s):
        last_end = m.end()
        name = m.group(1).lower()
        val = m.group(2)
        if val is None:
            val = m.group(3)
        if val is None:
            val = m.group(4)
        # groups 2-4 all absent ⇔ no '=': bare attribute stays None,
        # matching HTMLParser (regardless of the attribute's case)
        if val is not None and "&" in val:
            val = _unescape(val)
        out[name] = val
    return out, s.endswith("/") and last_end < len(s)


# Real pages repeat the same attribute strings thousands of times
# (class="card", class="rr-item", ...): memoizing the parse converts the
# per-tag regex scan — ~35% of parse_html time on Common-Crawl-weight
# markup — into one dict lookup. The cached mapping is SHARED across
# elements, so it is wrapped in MappingProxyType: any future caller that
# tried to mutate el.attrs (pop/setdefault/assignment) raises immediately
# instead of silently corrupting every other element and later document
# sharing the same attrs string in the worker. Near-zero cost (one proxy
# object per distinct attrs string, reads are plain dict reads).
_ATTRS_CACHE: dict = {}
_ATTRS_CACHE_MAX = 100_000

# str.lower() allocates a NEW string even when the input is already
# lowercase (CPython never returns self), so every start/end tag costs one
# short-string allocation. Real markup draws from a tiny tag vocabulary:
# memoize rawtag -> interned lowercase once, and every element with the
# same tag shares ONE string object — which also turns the end-tag
# `stack[i].tag == tag` scans into pointer-identity fast paths.
_TAG_CACHE: dict = {}
_TAG_CACHE_MAX = 10_000


def _parse_attrs(s):
    """Memoized (attrs, selfclose, classes, id): the class-list split and
    the id value are derived from the same string, so they are cached
    alongside — elements sharing an attrs string also share one class list
    (and skip the per-element id dict probe) instead of re-deriving per
    selector probe / index build."""
    hit = _ATTRS_CACHE.get(s)
    if hit is None:
        if len(_ATTRS_CACHE) >= _ATTRS_CACHE_MAX:
            _ATTRS_CACHE.clear()
        attrs, selfclose = _parse_attrs_uncached(s)
        # tuple, not list: the cached split is SHARED by every element with
        # this attrs string (and returned directly by Element.classes) —
        # the same aliasing hazard MappingProxyType guards on attrs; a
        # caller mutating el.classes must raise, not corrupt the cache.
        # Selector code only iterates / membership-tests it.
        classes = tuple((attrs.get("class") or "").split())
        hit = (types.MappingProxyType(attrs), selfclose, classes,
               attrs.get("id"))
        _ATTRS_CACHE[s] = hit
    return hit


def _add_text(el, text):
    t = el._texts
    if t is None:
        el._texts = text          # single chunk: bare str, no list
    elif type(t) is str:
        el._texts = [t, text]     # second chunk: promote
    else:
        t.append(text)


def parse_html(html):
    """Parse an HTML string (or utf-8 bytes) into a DOM root Element.

    The selector candidate index (class/tag/id → elements, plus the
    (_ord, _ord_end) subtree intervals) is built INSIDE this same pass:
    ords are assigned as tags open, subtree ends stamped as they close —
    one traversal of the document instead of parse + re-walk
    (_ensure_index remains for trees built by other constructors)."""
    if isinstance(html, (bytes, bytearray)):
        html = html.decode("utf-8", errors="replace")
    root = Element("#document", {}, None)
    root._ord = 1
    stack = [root]
    class_idx, tag_idx, id_idx = {}, {}, {}
    counter = 1
    pos = 0
    n = len(html)
    find = html.find
    # hot-loop bindings (the list/dict OBJECTS are never replaced, only
    # mutated, so the bound methods stay valid across del stack[i:] etc.)
    start_match = _START_TAG_RE.match
    end_match = _END_TAG_RE.match
    # get-then-branch instead of setdefault(tag, []): setdefault allocates
    # a throwaway empty list on EVERY call (once per element plus per class
    # occurrence) — pure allocator pressure on the memory-bandwidth-bound
    # path; get() allocates only on first occurrence of a key.
    tag_get = tag_idx.get
    class_get = class_idx.get
    id_get = id_idx.get
    attrs_cache_get = _ATTRS_CACHE.get
    tag_cache = _TAG_CACHE
    while pos < n:
        lt = find("<", pos)
        if lt < 0:
            text = html[pos:]
            if text:
                _add_text(stack[-1],
                          _unescape(text) if "&" in text else text)
            break
        if lt > pos:
            text = html[pos:lt]
            if "&" in text:
                text = _unescape(text)
            top = stack[-1]  # inlined _add_text (hottest call site)
            t = top._texts
            if t is None:
                top._texts = text
            elif type(t) is str:
                top._texts = [t, text]
            else:
                t.append(text)
        # dispatch on the char after '<' instead of a 4-branch alternation
        c = html[lt + 1] if lt + 1 < n else ""
        if "a" <= c <= "z" or "A" <= c <= "Z":
            m = start_match(html, lt)
            if m is None:  # unterminated tag — HTMLParser-style recovery
                _add_text(stack[-1], "<")
                pos = lt + 1
                continue
            pos = m.end()
            rawtag, rawattrs = m.group(1, 2)
            tag = tag_cache.get(rawtag)
            if tag is None:
                if len(tag_cache) >= _TAG_CACHE_MAX:  # adversarial markup
                    tag_cache.clear()                 # can mint tags freely
                tag = tag_cache[rawtag] = _intern(rawtag.lower())
            # inlined _parse_attrs cache hit (2M calls/corpus-slice: the
            # function-call overhead alone is measurable; miss path stays
            # in the function)
            hit = attrs_cache_get(rawattrs)
            if hit is None:
                hit = _parse_attrs(rawattrs)
            attrs, selfclose, classes, idval = hit
            parent = stack[-1]
            el = Element(tag, attrs, parent, classes)
            if parent.children is None:
                parent.children = [el]
            else:
                parent.children.append(el)
            counter += 1
            el._ord = counter
            lst = tag_get(tag)
            if lst is None:
                tag_idx[tag] = [el]
            else:
                lst.append(el)
            for cl in classes:
                lst = class_get(cl)
                if lst is None:
                    class_idx[cl] = [el]
                else:
                    lst.append(el)
            if idval is not None:
                lst = id_get(idval)
                if lst is None:
                    id_idx[idval] = [el]
                else:
                    lst.append(el)
            if selfclose or tag in _VOID_TAGS:
                el._ord_end = counter  # leaf: subtree is itself
                continue
            raw = _RAWTEXT_CLOSE.get(tag)
            if raw is not None:
                # script/style: raw text until the matching close tag
                mc = raw.search(html, pos)
                end = mc.start() if mc else n
                _add_text(el, html[pos:end])
                el._ord_end = counter
                gt = find(">", mc.end()) if mc else -1
                pos = n if gt < 0 else gt + 1
                continue
            stack.append(el)
        elif c == "/":
            m = end_match(html, lt)
            if m is None:  # '</>' or unterminated — stray-text recovery
                _add_text(stack[-1], "<")
                pos = lt + 1
                continue
            pos = m.end()
            rawtag = m.group(1)
            tag = tag_cache.get(rawtag)
            if tag is None:
                if len(tag_cache) >= _TAG_CACHE_MAX:
                    tag_cache.clear()
                tag = tag_cache[rawtag] = _intern(rawtag.lower())
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == tag:
                    for closed in stack[i:]:
                        closed._ord_end = counter
                    del stack[i:]
                    break
        elif c == "!" or c == "?":
            if html.startswith("!--", lt + 1):
                close = find("-->", lt + 4)
                pos = n if close < 0 else close + 3
            else:
                gt = find(">", lt + 1)  # decl/PI: skip to '>'
                if gt < 0:
                    _add_text(stack[-1], "<")
                    pos = lt + 1
                else:
                    pos = gt + 1
        else:
            # stray '<' — treat as text, like HTMLParser's recovery
            _add_text(stack[-1], "<")
            pos = lt + 1
    for el in stack:  # implicitly-closed tail, including the root
        el._ord_end = counter
    root._indexes = (class_idx, tag_idx, id_idx)
    return root


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
            if name not in el.attrs:
                return False
            # bare attributes parse to None; browsers/Selenium expose them
            # as "" for value comparisons ([disabled=""] matches <x disabled>)
            got = el.attrs[name]
            if got is None:
                got = ""
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


def _ensure_index(root):
    """Lazy per-document candidate index: class/tag/id → elements in document
    order, plus (_ord, _ord_end) intervals for O(1) subtree-membership tests.
    The DOM is immutable after parse, so the index is built at most once.

    This is the hot-path optimization for Common-Crawl-weight pages: a
    selector probe touches only elements sharing its rightmost compound's
    class/tag instead of walking the whole (mostly-ballast) DOM once per
    cascade entry.
    """
    if root._indexes is not None:
        return root._indexes
    class_idx, tag_idx, id_idx = {}, {}, {}
    counter = 0
    stack = [(root, False)]
    while stack:
        el, done = stack.pop()
        if done:
            el._ord_end = counter
            continue
        counter += 1
        el._ord = counter
        stack.append((el, True))
        for ch in reversed(el.children or ()):
            stack.append((ch, False))
        if el.parent is not None:
            tag_idx.setdefault(el.tag, []).append(el)
            for c in el.classes:
                class_idx.setdefault(c, []).append(el)
            i = el.attrs.get("id")
            if i is not None:
                id_idx.setdefault(i, []).append(el)
    root._indexes = (class_idx, tag_idx, id_idx)
    return root._indexes


def _candidate_list(compound, class_idx, tag_idx, id_idx):
    """Document-ordered superset of elements that can match ``compound``, or
    None when the compound is unindexable (bare ``*`` / attr-only)."""
    if compound.id is not None:
        return id_idx.get(compound.id, ())
    if compound.classes:
        return min((class_idx.get(c, ()) for c in compound.classes), key=len)
    if compound.tag is not None and compound.tag != "*":
        return tag_idx.get(compound.tag, ())
    return None


def _iter_matches(scope, compiled):
    root = scope
    while root.parent is not None:
        root = root.parent
    class_idx, tag_idx, id_idx = _ensure_index(root)
    lo, hi = scope._ord, scope._ord_end

    if len(compiled) == 1:
        # single-chain probe (the extraction cascades are all single
        # selectors): skip the plans list + per-chain tuple allocations —
        # probes run once per card per cascade entry, so the per-probe
        # constant rides the hot path
        chain = compiled[0]
        lst = _candidate_list(chain[-1][1], class_idx, tag_idx, id_idx)
        if lst is not None:
            li = len(chain) - 1
            last = chain[li][1]
            for el in lst:
                if lo < el._ord <= hi and last.matches(el) \
                        and _matches_chain(el, chain, li):
                    yield el
            return

    plans = []
    for chain in compiled:
        lst = _candidate_list(chain[-1][1], class_idx, tag_idx, id_idx)
        if lst is None:
            plans = None  # unindexable compound → full-walk fallback
            break
        plans.append((chain, lst))

    if plans is None:
        last_idx = {id(chain): len(chain) - 1 for chain in compiled}
        for node in scope.iter():
            if node is scope:
                continue
            for chain in compiled:
                li = last_idx[id(chain)]
                if chain[li][1].matches(node) and _matches_chain(node, chain, li):
                    yield node
                    break
        return

    # selector list (the single-chain case returned above, either via the
    # fast path or the full-walk fallback, so len(plans) >= 2 here):
    # merge candidates, dedupe, emit in document order
    merged = {}
    for chain, lst in plans:
        li = len(chain) - 1
        last = chain[li][1]
        for el in lst:
            if lo < el._ord <= hi and el._ord not in merged \
                    and last.matches(el) and _matches_chain(el, chain, li):
                merged[el._ord] = el
    for k in sorted(merged):
        yield merged[k]


def find_elements(scope, selector):
    """All matches in document order within scope's subtree (scope excluded)."""
    return list(_iter_matches(scope, compile_selector(selector)))


def find_element(scope, selector):
    """First match in document order, or None (Selenium find_element analogue)."""
    for node in _iter_matches(scope, compile_selector(selector)):
        return node
    return None
