"""Property-based tests over the container/codec kernels and the selector
engine's index fast path — the pure-Python surfaces whose failure mode is
silent data corruption rather than a crashed task.

Three families, all Spark-free:

- WARC framing (sources/warc.py): a concatenation of records round-trips
  exactly even when payloads embed "WARC/1.0" / CRLF-CRLF sequences
  (Content-Length framing must never split on payload bytes), and the
  stats surface truncation instead of hiding it.
- Media header codecs (functions/mediahdr.py): every encoder's output
  parses back to the same fields even when the BODY starts with another
  format's magic (the header parser must frame by structure, not by
  scanning the body).
- HTML: the fast tokenizer stays tree-equivalent to the stdlib oracle on
  a richer grammar than test_properties.html_fragment (comments, decls,
  terminated script/style raw text, mixed-case tags, unquoted and bare
  attributes, entities); the index-backed selector engine returns exactly
  the naive full-walk match set on random DOMs and selectors (the
  candidate-index subtree intervals are the load-bearing trick).
"""

import string
from datetime import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from s_crawler_spark.functions import htmlsel, mediahdr
from s_crawler_spark.sources import warc

# ---------------------------------------------------------------------------
# WARC framing
# ---------------------------------------------------------------------------

# payloads drawn to collide with the framing delimiters on purpose
_payload = st.one_of(
    st.binary(max_size=120),
    st.binary(max_size=40).map(
        lambda b: b + b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n" + b),
)
_url = st.text(alphabet=string.ascii_lowercase + string.digits,
               min_size=1, max_size=12).map(lambda s: "http://ex.com/" + s)
_ts = st.datetimes(min_value=datetime(2000, 1, 1),
                   max_value=datetime(2035, 1, 1)).map(
    lambda d: d.replace(microsecond=0))
_records = st.lists(st.tuples(_url, _ts, _payload), min_size=1, max_size=6)


@given(_records, st.binary(max_size=8))
@settings(max_examples=200, deadline=None)
def test_warc_roundtrip_exact_despite_adversarial_payloads(recs, trailing):
    blob = b"".join(warc.warc_record(u, t, p) for u, t, p in recs)
    out, stats = warc.parse_warc_full(blob + trailing)
    assert out == recs
    assert stats["n_records"] == len(recs)
    assert stats["n_skipped"] == 0
    # framing consumed every record; only the injected tail can remain
    assert stats["trailing_bytes"] <= len(trailing)


@given(_records, st.integers(min_value=1, max_value=10))
@settings(max_examples=100, deadline=None)
def test_warc_mid_payload_truncation_surfaces_in_stats(recs, cut_into):
    # force a non-empty final payload, then cut INTO it: the partial record
    # must NOT be emitted (a silently short page body is corruption), every
    # earlier record must round-trip, and trailing_bytes must surface the
    # truncated tail — this pinned a real gap where the short body was
    # emitted with trailing_bytes = 0
    u, t, p = recs[-1]
    recs = recs[:-1] + [(u, t, p + b"x" * cut_into)]
    blob = b"".join(warc.warc_record(u, t, p) for u, t, p in recs)
    cut = blob[:-(4 + cut_into - 1) - 1]  # ends cut_into bytes into payload
    out, stats = warc.parse_warc_full(cut)
    assert out == recs[:-1]
    assert stats["n_records"] == len(recs) - 1
    assert stats["trailing_bytes"] > 0


@given(_records)
@settings(max_examples=50, deadline=None)
def test_warc_terminator_only_cut_loses_nothing(recs):
    # cutting inside the final record TERMINATOR (after a complete payload)
    # loses no data: every record round-trips, nothing is flagged
    blob = b"".join(warc.warc_record(u, t, p) for u, t, p in recs)
    out, stats = warc.parse_warc_full(blob[:-3])
    assert out == recs
    assert stats["n_records"] == len(recs)


# ---------------------------------------------------------------------------
# Media header codecs
# ---------------------------------------------------------------------------

# bodies prefixed with ANOTHER format's magic: the parser must read the
# declared header structure, never scan into the body
_magic = st.sampled_from(
    [b"", mediahdr.PNG_MAGIC, b"BM", b"RIFF", b"\xff\xd8\xff", b"GIF89a"])
_body = st.tuples(_magic, st.binary(max_size=60)).map(lambda t: t[0] + t[1])
_dim = st.integers(min_value=1, max_value=65535)


@given(_dim, _dim, _body)
@settings(max_examples=200, deadline=None)
def test_image_header_roundtrip(w, h, body):
    for enc, codec in ((mediahdr.png_bytes, "png"),
                       (mediahdr.jpeg_bytes, "jpeg"),
                       (mediahdr.gif_bytes, "gif"),
                       (mediahdr.bmp_bytes, "bmp")):
        got = mediahdr.parse_header(enc(w, h, body), "image")
        assert got is not None and got["codec"] == codec
        assert (got["width"], got["height"]) == (w, h)
        assert got["sample_rate"] is None


@given(st.integers(min_value=1, max_value=384000), _body)
@settings(max_examples=200, deadline=None)
def test_wav_header_roundtrip(rate, body):
    got = mediahdr.parse_header(mediahdr.wav_bytes(rate, body), "audio")
    assert got is not None and got["codec"] == "wav"
    assert got["sample_rate"] == rate
    # mono 16-bit PCM: frames = data bytes / block align (2)
    assert got["n_frames"] == len(body) // 2


@given(_dim, _dim, st.binary(max_size=40))
@settings(max_examples=100, deadline=None)
def test_family_gate_blocks_cross_family_sniff(w, h, body):
    # a declared-audio payload must never be claimed by an image parser
    # (and vice versa), no matter what magic its bytes start with
    assert mediahdr.parse_header(mediahdr.png_bytes(w, h, body), "audio") is None
    assert mediahdr.parse_header(mediahdr.wav_bytes(8000, body), "image") is None
    assert mediahdr.parse_header(mediahdr.png_bytes(w, h, body), "video") is None


# ---------------------------------------------------------------------------
# HTML: richer-grammar equivalence + unterminated-rawtext divergence pin
# ---------------------------------------------------------------------------

_tags = st.sampled_from(["div", "span", "p", "a", "li", "ul", "td", "DIV",
                         "Time", "h2"])
_void = st.sampled_from(["br", "img", "IMG"])
_text = st.sampled_from(["hello", "a&amp;b", "x &lt; y", "&#65;bc",
                         "tail  space", "&nbsp;.", "100%", ""])
_attr_vals = st.sampled_from(["v1", "a b", "x&amp;y",
                              "http://e.com/p?a=1", ""])


@st.composite
def _attrs(draw):
    out = ""
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        name = draw(st.sampled_from(
            ["class", "id", "href", "data-x", "CLASS", "disabled"]))
        style = draw(st.integers(min_value=0, max_value=3))
        val = draw(_attr_vals)
        if style == 0:
            out += f' {name}="{val}"'
        elif style == 1:
            out += f" {name}='{val}'"
        elif style == 2 and val and " " not in val:
            out += f" {name}={val}"  # unquoted
        else:
            out += f" {name}"        # bare
    return out


@st.composite
def _rich_fragment(draw, depth=0):
    kind = draw(st.integers(min_value=0, max_value=9))
    if depth >= 3 or kind <= 2:
        return draw(_text)
    if kind == 3:
        return f"<!-- comment {draw(_text)} -->"
    if kind == 4:
        return "<!DOCTYPE html>"
    if kind == 5:
        # TERMINATED rawtext (the unterminated case intentionally diverges
        # from the stdlib oracle — pinned separately below)
        t = draw(st.sampled_from(["script", "style", "Script"]))
        return f"<{t}>var x = '<div>' + 1 < 2;</{t}>"
    if kind == 6:
        return f"<{draw(_void)}{draw(_attrs())}>"
    tag = draw(_tags)
    attrs = draw(_attrs())
    inner = "".join(draw(_rich_fragment(depth=depth + 1))
                    for _ in range(draw(st.integers(min_value=0, max_value=3))))
    close = draw(st.sampled_from([f"</{tag}>", f"</{tag}   >", f"</{tag}>"]))
    return f"<{tag}{attrs}>{inner}{close}"


def _sig(el):
    t = el._texts
    txt = "".join(t) if isinstance(t, list) else (t or "")
    return (el.tag, sorted(el.attrs.items()), txt,
            [_sig(c) for c in (el.children or ())])


@given(st.lists(_rich_fragment(), min_size=1, max_size=4))
@settings(max_examples=300, deadline=None)
def test_fast_parser_equivalence_rich_grammar(frags):
    html = "<html><body>" + "".join(frags) + "</body></html>"
    assert _sig(htmlsel.parse_html(html)) == _sig(htmlsel.parse_html_stdlib(html))


def test_unterminated_script_keeps_tail_browser_style():
    """Documented divergence from the stdlib oracle, pinned: an unterminated
    <script> swallows the rest of the document as raw text (browser/Selenium
    semantics — the byte-parity contract's authority). stdlib HTMLParser
    instead buffers the tail in CDATA mode and close() DROPS it, so the two
    parsers are only compared on terminated-rawtext inputs above."""
    root = htmlsel.parse_html("<div><Script>x</div>")
    div = root.children[0]
    script = div.children[0]
    assert script.tag == "script"
    assert script.text == "x</div>"
    # and the stdlib oracle's lossy behavior is what it is (guard so a
    # future stdlib change re-converging the two surfaces loudly)
    std = htmlsel.parse_html_stdlib("<div><Script>x</div>")
    assert _sig(std) != _sig(root)


# ---------------------------------------------------------------------------
# Selector engine: index fast path ≡ naive full walk
# ---------------------------------------------------------------------------

_sel_tags = ["div", "span", "p", "a", "li", "ul"]
_sel_classes = ["c1", "c2", "c3", "card", "x-y"]
_sel_ids = ["i1", "i2", "i3"]


@st.composite
def _dom_fragment(draw, depth=0):
    tag = draw(st.sampled_from(_sel_tags))
    attrs = ""
    if draw(st.booleans()):
        cs = draw(st.lists(st.sampled_from(_sel_classes),
                           min_size=1, max_size=2, unique=True))
        attrs += f' class="{" ".join(cs)}"'
    if draw(st.integers(min_value=0, max_value=4)) == 0:
        attrs += f' id="{draw(st.sampled_from(_sel_ids))}"'
    if draw(st.booleans()):
        attrs += f' href="/{draw(st.sampled_from(_sel_classes))}"'
    if depth >= 3:
        return f"<{tag}{attrs}>txt</{tag}>"
    inner = "".join(draw(_dom_fragment(depth=depth + 1))
                    for _ in range(draw(st.integers(min_value=0, max_value=3))))
    return f"<{tag}{attrs}>{inner}</{tag}>"


@st.composite
def _selector(draw):
    def compound():
        kind = draw(st.integers(min_value=0, max_value=4))
        if kind == 0:
            return draw(st.sampled_from(_sel_tags))
        if kind == 1:
            return "." + draw(st.sampled_from(_sel_classes))
        if kind == 2:
            return (draw(st.sampled_from(_sel_tags))
                    + "." + draw(st.sampled_from(_sel_classes)))
        if kind == 3:
            return "#" + draw(st.sampled_from(_sel_ids))
        return f"[href*='{draw(st.sampled_from(_sel_classes))}']"

    sel = compound()
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        sel += draw(st.sampled_from([" ", " > ", " + "])) + compound()
    if draw(st.integers(min_value=0, max_value=2)) == 0:
        sel += (", " + draw(st.sampled_from(_sel_tags))
                + "." + draw(st.sampled_from(_sel_classes)))
    return sel


def _naive_matches(scope, compiled):
    out = []
    for node in scope.iter():
        if node is scope:
            continue
        for chain in compiled:
            li = len(chain) - 1
            if chain[li][1].matches(node) \
                    and htmlsel._matches_chain(node, chain, li):
                out.append(node)
                break
    return out


@given(st.lists(_dom_fragment(), min_size=1, max_size=3),
       st.lists(_selector(), min_size=1, max_size=6),
       st.integers(min_value=0, max_value=10 ** 6))
@settings(max_examples=200, deadline=None)
def test_indexed_selector_matches_naive_walk(frags, sels, scope_pick):
    html = "<html><body>" + "".join(frags) + "</body></html>"
    root = htmlsel.parse_html(html)
    els = list(root.iter())
    for scope in (root, els[scope_pick % len(els)]):
        for sel in sels:
            compiled = htmlsel.compile_selector(sel)
            fast = htmlsel.find_elements(scope, sel)
            naive = _naive_matches(scope, compiled)
            assert [id(e) for e in fast] == [id(e) for e in naive], (
                sel, scope.tag)
