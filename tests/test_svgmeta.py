"""SVG metadata extraction — operators/svgmeta.py (r15)."""

from __future__ import annotations

import pytest

from pasardassist_spark.operators.svgmeta import (
    encode_svg,
    parse_svg_meta,
    sniff_svg,
)


def test_unit_resolution_all_absolute_units():
    for unit, factor in (
        ("px", 1.0), ("pt", 4 / 3), ("pc", 16.0),
        ("in", 96.0), ("cm", 96 / 2.54), ("mm", 96 / 25.4),
    ):
        m = parse_svg_meta(encode_svg(width=f"12{unit}", height=f"6{unit}"))
        assert m.width_px == round(12 * factor, 2), unit
        assert m.height_px == round(6 * factor, 2), unit


def test_percent_has_no_intrinsic_size():
    m = parse_svg_meta(encode_svg(width="100%", height="50%"))
    assert m.width_px is None and m.height_px is None


def test_viewbox_fallback_only_when_attr_missing():
    m = parse_svg_meta(encode_svg(width=None, height=None, view_box="0,0,64,32"))
    assert (m.width_px, m.height_px) == (64.0, 32.0)
    # a % width does NOT fall back (attribute present)
    m2 = parse_svg_meta(encode_svg(width="100%", view_box="0 0 64 32"))
    assert m2.width_px is None and m2.view_w == 64.0


def test_counts_script_and_title():
    m = parse_svg_meta(encode_svg(n_paths=4, n_texts=2, n_images=3,
                                  script=True, title="Logo"))
    assert (m.n_paths, m.n_texts, m.n_images) == (4, 2, 3)
    assert m.has_script and m.title == "Logo"
    m2 = parse_svg_meta(encode_svg(onload=True))
    assert m2.has_script  # event-handler attribute counts as active
    assert not parse_svg_meta(encode_svg()).has_script


def test_dtd_entity_rejected():
    with pytest.raises(ValueError, match="entity-expansion"):
        parse_svg_meta(
            b'<?xml version="1.0"?><!DOCTYPE svg [<!ENTITY a "b">]><svg/>'
        )


def test_malformed_and_foreign_root():
    with pytest.raises(ValueError, match="malformed SVG"):
        parse_svg_meta(b"<svg><unclosed></svg>")
    with pytest.raises(ValueError, match="not <svg>"):
        parse_svg_meta(b"<html></html>")
    with pytest.raises(ValueError, match="bad SVG length"):
        parse_svg_meta(b'<svg xmlns="http://www.w3.org/2000/svg" width="12em"/>')
    with pytest.raises(ValueError, match="viewBox needs 4"):
        parse_svg_meta(b'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 4"/>')
    with pytest.raises(ValueError, match="negative viewBox"):
        parse_svg_meta(
            b'<svg xmlns="http://www.w3.org/2000/svg" viewBox="0 0 -4 4"/>'
        )


def test_sniff():
    assert sniff_svg(encode_svg())
    assert sniff_svg(b"  <svg xmlns='x'/>")
    assert not sniff_svg(b"<html><svg/></html>")
