"""Unit tests for the stdlib HTML main-text extractor — edge cases the
deterministic query fixture cannot reach (nested skip tags, entities in
skipped regions, malformed nesting, block tags inside nav)."""

from __future__ import annotations

from pasardassist_spark.operators.htmltext import extract_page


def test_basic_blocks_and_title():
    title, blocks, links = extract_page(
        "<html><head><title>T</title></head><body>"
        "<h1>Head</h1><p>one two</p><p>three</p></body></html>"
    )
    assert title == "T"
    assert blocks == ["Head", "one two", "three"]
    assert links == 0


def test_skip_tags_drop_content_even_with_blocks_inside():
    _, blocks, links = extract_page(
        "<body><nav><p>menu item</p><a href='/'>home</a></nav>"
        "<p>real</p></body>"
    )
    assert blocks == ["real"]
    assert links == 1  # <a> tags are counted even inside skipped regions


def test_nested_skip_regions():
    _, blocks, _ = extract_page(
        "<body><nav>outer <nav>inner</nav> tail<p>hidden</p></nav>"
        "<p>kept</p></body>"
    )
    assert blocks == ["kept"]


def test_script_and_style_content_dropped():
    _, blocks, _ = extract_page(
        "<body><script>var p = '<p>not a block</p>';</script>"
        "<style>p{color:red}</style><p>visible</p></body>"
    )
    assert blocks == ["visible"]


def test_inline_children_flatten_into_block():
    _, blocks, links = extract_page(
        "<p>See <a href='/x'>here</a> and <b>bold</b> text</p>"
    )
    assert blocks == ["See here and bold text"]
    assert links == 1


def test_entity_decode_and_whitespace_collapse():
    _, blocks, _ = extract_page("<p>  Q&amp;A \n\t x &lt;y&gt;  </p>")
    assert blocks == ["Q&A x <y>"]


def test_empty_blocks_dropped():
    _, blocks, _ = extract_page("<p>  </p><p></p><p>x</p>")
    assert blocks == ["x"]


def test_text_outside_blocks_ignored():
    _, blocks, _ = extract_page("<body>stray text<p>in block</p>tail</body>")
    assert blocks == ["in block"]


def test_unclosed_skip_tag_never_unskips():
    _, blocks, _ = extract_page("<body><script>junk<p>never</p></body>")
    assert blocks == []


def test_stray_end_tags_do_not_underflow():
    _, blocks, _ = extract_page(
        "</nav></script><p>fine</p></nav><p>also fine</p>"
    )
    assert blocks == ["fine", "also fine"]


# ----------------------------------------------------- property testing

from hypothesis import given, settings, strategies as st  # noqa: E402

_TAGS = ["p", "div", "nav", "script", "b", "a", "li", "title", "style", "h1"]
_frag = st.one_of(
    st.text(alphabet="ab &<>=\"'/x\n\t", max_size=12),
    st.sampled_from(
        [f"<{t}>" for t in _TAGS]
        + [f"</{t}>" for t in _TAGS]
        + ["&amp;", "&lt;", "&#65;", "<!-- c -->", "<p class='x y>"]
    ),
)


@given(parts=st.lists(_frag, max_size=40))
@settings(deadline=None, max_examples=200)
def test_extractor_total_on_arbitrary_html(parts):
    """The parser is total: any byte soup (unclosed tags, stray entities,
    nested/unbalanced skip regions, attribute garbage) yields a
    well-formed result with the structural invariants intact."""
    from pasardassist_spark.operators.htmltext import extract_page

    title, blocks, n_links = extract_page("".join(parts))
    assert isinstance(title, str)
    assert n_links >= 0
    for b in blocks:
        assert b == b.strip() and b != ""
        assert "\n" not in b and "\t" not in b
        assert "  " not in b  # whitespace fully collapsed
