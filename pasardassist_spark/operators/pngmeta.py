"""PNG textual-metadata chunks (tEXt / zTXt / iTXt) — writer + parser.

From the public PNG specification (ISO/IEC 15948 §11.3.4): ancillary
text chunks ride between IHDR and IEND and carry keyword→value pairs.
This is where real-world provenance lives — notably, AI image
generators embed their full prompt/parameter payload in a tEXt or iTXt
chunk (the `parameters` / `prompt` keywords), which makes this the
highest-value metadata read a training-data image crawl performs:
filtering or labeling generated images WITHOUT decoding a pixel.

- tEXt: keyword\\0 text, both latin-1, uncompressed.
- zTXt: keyword\\0 method(0) zlib(text) — latin-1 under the deflate.
- iTXt: keyword\\0 flag(1) method(1) language\\0 translated\\0 text,
  text UTF-8, zlib-deflated when flag=1.

The parser walks chunk headers only (IDAT bodies are skipped by
length, never inflated), so extraction is O(metadata bytes) per image.
Chunk CRCs are verified for the text chunks it reads — a crawl must
not index a torn keyword.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_text_chunk(keyword: str, text: str, kind: str = "tEXt") -> bytes:
    """One serialized text chunk of the requested kind."""
    kw = keyword.encode("latin-1")
    if not 1 <= len(kw) <= 79 or b"\x00" in kw:
        raise ValueError("PNG keyword must be 1-79 latin-1 bytes, no NUL")
    if kind == "tEXt":
        return _chunk(b"tEXt", kw + b"\x00" + text.encode("latin-1"))
    if kind == "zTXt":
        return _chunk(
            b"zTXt", kw + b"\x00\x00" + zlib.compress(text.encode("latin-1"))
        )
    if kind == "iTXt":
        return _chunk(
            b"iTXt",
            kw + b"\x00\x01\x00" + b"\x00" + b"\x00"
            + zlib.compress(text.encode("utf-8")),
        )
    raise ValueError(f"unknown PNG text chunk kind {kind!r}")


def insert_text_chunks(png: bytes, chunks: list[bytes]) -> bytes:
    """Splice serialized text chunks immediately after IHDR."""
    if png[:8] != _SIG:
        raise ValueError("not a PNG")
    (ihdr_len,) = struct.unpack_from(">I", png, 8)
    cut = 8 + 12 + ihdr_len  # signature + IHDR chunk
    return png[:cut] + b"".join(chunks) + png[cut:]


def parse_text_chunks(png: bytes) -> dict[str, str]:
    """All keyword→text pairs from tEXt/zTXt/iTXt chunks; IDAT is
    skipped by declared length, never decompressed."""
    if png[:8] != _SIG:
        raise ValueError("not a PNG")
    out: dict[str, str] = {}
    pos = 8
    while pos + 8 <= len(png):
        clen, ctype = struct.unpack_from(">I", png, pos)[0], png[pos + 4 : pos + 8]
        body = png[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError("truncated PNG chunk")
        if ctype in (b"tEXt", b"zTXt", b"iTXt"):
            # ADVICE r13: a file torn between chunk body and CRC must
            # fail with the module's ValueError contract, not struct.error
            if pos + 12 + clen > len(png):
                raise ValueError("truncated PNG chunk")
            (crc,) = struct.unpack_from(">I", png, pos + 8 + clen)
            if crc != zlib.crc32(ctype + body) & 0xFFFFFFFF:
                raise ValueError(f"bad CRC on {ctype.decode()} chunk")
            kw, _, rest = body.partition(b"\x00")
            keyword = kw.decode("latin-1")
            if ctype == b"tEXt":
                out[keyword] = rest.decode("latin-1")
            elif ctype == b"zTXt":
                if rest[:1] != b"\x00":
                    raise ValueError("unknown zTXt compression method")
                out[keyword] = zlib.decompress(rest[1:]).decode("latin-1")
            else:  # iTXt
                flag, method = rest[0], rest[1]
                tail = rest[2:]
                _lang, _, tail = tail.partition(b"\x00")
                _trans, _, text = tail.partition(b"\x00")
                if flag == 1:
                    if method != 0:
                        raise ValueError("unknown iTXt compression method")
                    text = zlib.decompress(text)
                out[keyword] = text.decode("utf-8")
        if ctype == b"IEND":
            break
        pos += 12 + clen
    return out
