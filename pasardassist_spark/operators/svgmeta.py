"""SVG document metadata — intrinsic dimensions (with CSS unit
resolution), viewBox, structural element counts, and the script-bearing
flag — WITHOUT rasterizing anything.

Reference parity: SVG is the one first-class web image format the
codec family (JPEG/PNG/GIF/TIFF/WebP/BMP/ICO/HEIF) did not cover — a
crawl indexes it by intrinsic size and by whether it carries active
content (``<script>``/event handlers make an SVG a security-relevant
document, not an image).  From the public SVG 1.1/2 + CSS specs:

- ``width``/``height`` attributes accept a number plus an absolute
  CSS unit — px (default), pt (4/3 px), pc (16 px), in (96 px),
  cm (96/2.54), mm (96/25.4) — resolved here to exact-arithmetic px
  rounded to 2 dp; percentages have no intrinsic resolution and
  yield NULL;
- a missing width/height falls back to the ``viewBox`` extent (the
  browser rule for intrinsic aspect);
- ``viewBox`` is four whitespace/comma-separated numbers (min-x,
  min-y, width, height) — negative extents are malformed;
- element counts walk the tree namespace-agnostically (path/text/
  image/use), and ``has_script`` is true for <script> elements OR
  on* event-handler attributes.

Hardening: payloads carrying a DOCTYPE/ENTITY declaration are
REJECTED before parsing (billion-laughs / external-entity classes —
crawled SVGs legitimately never need a DTD); malformed XML raises
ValueError.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from typing import NamedTuple

__all__ = ["SvgMeta", "parse_svg_meta", "encode_svg", "sniff_svg"]


class SvgMeta(NamedTuple):
    width_px: float | None  # resolved intrinsic width (2 dp), None if %
    height_px: float | None
    view_w: float | None  # viewBox extent
    view_h: float | None
    n_paths: int
    n_texts: int
    n_images: int
    has_script: bool
    title: str | None


_UNIT_PX = {
    "": 1.0,
    "px": 1.0,
    "pt": 4.0 / 3.0,
    "pc": 16.0,
    "in": 96.0,
    "cm": 96.0 / 2.54,
    "mm": 96.0 / 25.4,
}

_LENGTH_RE = re.compile(r"^\s*([+-]?\d*\.?\d+)(px|pt|pc|in|cm|mm|%)?\s*$")


def sniff_svg(payload: bytes) -> bool:
    head = payload[:512].lstrip()
    return head.startswith(b"<svg") or (
        head.startswith(b"<?xml") and b"<svg" in payload[:512]
    )


def _resolve_length(value: str | None) -> float | None:
    if value is None:
        return None
    m = _LENGTH_RE.match(value)
    if not m:
        raise ValueError(f"bad SVG length {value!r}")
    num, unit = float(m.group(1)), m.group(2) or ""
    if unit == "%":
        return None  # no intrinsic resolution
    return round(num * _UNIT_PX[unit], 2)


def _local(tag) -> str:
    return tag.rsplit("}", 1)[-1] if isinstance(tag, str) else ""


def parse_svg_meta(payload: bytes) -> SvgMeta:
    if b"<!DOCTYPE" in payload or b"<!ENTITY" in payload:
        raise ValueError(
            "SVG carries a DTD/entity declaration (rejected: "
            "entity-expansion hardening)"
        )
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as exc:
        raise ValueError(f"malformed SVG XML: {exc}") from exc
    if _local(root.tag) != "svg":
        raise ValueError(f"root element is <{_local(root.tag)}>, not <svg>")
    w = _resolve_length(root.get("width"))
    h = _resolve_length(root.get("height"))
    vw = vh = None
    vb = root.get("viewBox")
    if vb is not None:
        parts = re.split(r"[\s,]+", vb.strip())
        if len(parts) != 4:
            raise ValueError(f"viewBox needs 4 numbers, got {vb!r}")
        try:
            _, _, vw, vh = (float(p) for p in parts)
        except ValueError as exc:
            raise ValueError(f"bad viewBox {vb!r}") from exc
        if vw < 0 or vh < 0:
            raise ValueError("negative viewBox extent")
        vw, vh = round(vw, 2), round(vh, 2)
    # the browser intrinsic-size rule: missing width/height falls back
    # to the viewBox extent
    if root.get("width") is None and vw is not None:
        w = vw
    if root.get("height") is None and vh is not None:
        h = vh
    n_paths = n_texts = n_images = 0
    has_script = False
    title = None
    for el in root.iter():
        t = _local(el.tag)
        if t == "path":
            n_paths += 1
        elif t == "text":
            n_texts += 1
        elif t == "image":
            n_images += 1
        elif t == "script":
            has_script = True
        elif t == "title" and title is None:
            title = (el.text or "").strip() or None
        if not has_script and any(
            k.lower().startswith("on") for k in el.attrib
        ):
            has_script = True
    return SvgMeta(w, h, vw, vh, n_paths, n_texts, n_images, has_script, title)


# ---------------------------------------------------------------- writer ---


def encode_svg(
    *,
    width: str | None = "100px",
    height: str | None = "50px",
    view_box: str | None = None,
    n_paths: int = 1,
    n_texts: int = 0,
    n_images: int = 0,
    script: bool = False,
    onload: bool = False,
    title: str | None = None,
) -> bytes:
    attrs = ['xmlns="http://www.w3.org/2000/svg"']
    if width is not None:
        attrs.append(f'width="{width}"')
    if height is not None:
        attrs.append(f'height="{height}"')
    if view_box is not None:
        attrs.append(f'viewBox="{view_box}"')
    if onload:
        attrs.append("onload=\"init()\"")
    body: list[str] = []
    if title is not None:
        body.append(f"<title>{title}</title>")
    body.append("<g>")
    for k in range(n_paths):
        body.append(f'<path d="M0 {k} L9 9Z"/>')
    for k in range(n_texts):
        body.append(f"<text x=\"0\" y=\"{k}\">t{k}</text>")
    for _ in range(n_images):
        body.append('<image href="#" width="1" height="1"/>')
    body.append("</g>")
    if script:
        body.append("<script>// inert</script>")
    return (
        '<?xml version="1.0" encoding="UTF-8"?>'
        f'<svg {" ".join(attrs)}>{"".join(body)}</svg>'
    ).encode("utf-8")
