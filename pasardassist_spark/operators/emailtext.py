"""RFC 5322 / MIME email text extraction — the Enron-shaped corpus
every LLM data pipeline ingests; fully stdlib-feasible so the parsing
is REAL, not a seam.

Reference parity: same transcode-stage role as operators/pdftext.py —
the reference pipeline's opaque-payload handling (src/utils/*) mapped to
a 100 TB map pass; Spark-side an Arrow-batched ``mapInPandas`` over
binary payloads (queries/documents.py precedent).

What is REAL here:

- RFC 5322 header parsing: folded (continuation) lines unfolded,
  case-insensitive field names, the header block split from the body at
  the first empty line;
- RFC 2047 encoded-words in Subject (``=?utf-8?B?…?=`` and ``?Q?…``
  forms, adjacent encoded-words joined with the whitespace between them
  removed — the rule naive decoders get wrong);
- RFC 2822 Date recovery to epoch (delegated to the battle-tested
  grammar in operators/feedtext.py, which also handles the legacy
  2-digit-year and missing-seconds forms);
- MIME multipart recursion: ``boundary=`` parameter (quoted or token),
  ``--B`` part separators / ``--B--`` terminator, preamble and epilogue
  dropped, nested multiparts recursed depth-first;
- Content-Transfer-Encoding decode: 7bit/8bit pass-through,
  quoted-printable (soft line breaks, ``=XX`` escapes, trailing-space
  protection) hand-implemented, base64 via binascii (byte codec, the
  zlib-for-Flate precedent in operators/pdftext.py);
- body selection: the first ``text/plain`` leaf in depth-first order;
  if none exists, the first ``text/html`` leaf with tags stripped.

The mboxrd layer (``encode_mbox``/``split_mbox``) carries the classic
``From ``-line message framing with reversible ``>From`` quoting: every
body line matching ``^>*From `` gains one ``>`` on write and loses one
on read, so any byte-exact message round-trips through an mbox file.

The writer ``encode_email`` synthesizes CONFORMING messages across four
structure variants (plain-8bit, plain-QP, multipart/alternative with a
base64 HTML sibling, multipart/mixed with a nested alternative and a
binary attachment), so the parser is exercised end-to-end on genuine
messages.
"""

from __future__ import annotations

import binascii
import hashlib
import re
from typing import NamedTuple

from pasardassist_spark.operators.feedtext import parse_rfc822_date

__all__ = [
    "EmailDoc",
    "encode_email",
    "encode_email_with_attachments",
    "extract_attachments",
    "parse_email",
    "encode_mbox",
    "split_mbox",
]

_DOW = ["Thu", "Fri", "Sat", "Sun", "Mon", "Tue", "Wed"]  # epoch day 0 = Thu
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

_ENCODED_WORD = re.compile(
    r"=\?([^?]+)\?([BbQq])\?([^?]*)\?="
)
_ADJACENT_EW = re.compile(
    r"(=\?[^?]+\?[BbQq]\?[^?]*\?=)[ \t]+(?==\?[^?]+\?[BbQq]\?[^?]*\?=)"
)
_TAG = re.compile(r"<[^>]*>")
_MSGID = re.compile(r"<([^<>]+)>")


class EmailDoc(NamedTuple):
    subject: str
    date_epoch: int
    text: str
    # RFC 5322 threading identity (None when the message carries none):
    # msg_id is the bare <...> Message-ID; in_reply_to the FIRST id of
    # In-Reply-To, falling back to the LAST id of References — the
    # JWZ-threading parent rule every mail client implements.
    msg_id: str | None = None
    in_reply_to: str | None = None


# ------------------------------------------------------------ RFC 2822 ---


def _civil_from_days(z: int) -> tuple[int, int, int]:
    """Inverse of feedtext._days_from_civil (Howard Hinnant)."""
    z += 719468
    era = (z if z >= 0 else z - 146096) // 146097
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + (3 if mp < 10 else -9)
    return y + (1 if m <= 2 else 0), m, d


def format_rfc2822(epoch: int) -> str:
    days, rem = divmod(epoch, 86400)
    h, rem = divmod(rem, 3600)
    mi, s = divmod(rem, 60)
    y, mo, d = _civil_from_days(days)
    dow = _DOW[days % 7]
    return f"{dow}, {d:02d} {_MONTHS[mo - 1]} {y:04d} {h:02d}:{mi:02d}:{s:02d} +0000"


# ------------------------------------------------------ quoted-printable ---


def qp_encode(data: bytes) -> str:
    """Hand-rolled RFC 2045 §6.7: literal printable ASCII (minus '='),
    =XX escapes, trailing space/tab protected, 76-char soft-wrapped."""
    out_lines: list[str] = []
    for raw_line in data.split(b"\n"):
        enc: list[str] = []
        for i, b in enumerate(raw_line):
            if b in (0x20, 0x09):
                # literal unless at end of line (would be stripped)
                enc.append(chr(b) if i < len(raw_line) - 1 else f"={b:02X}")
            elif 33 <= b <= 126 and b != 0x3D:
                enc.append(chr(b))
            else:
                enc.append(f"={b:02X}")
        # soft-wrap at 76 including the trailing '='
        line, cur = "".join(enc), []
        while len(line) > 75:
            cut = 72
            # never split an =XX escape
            if line[cut - 1] == "=":
                cut -= 1
            elif line[cut - 2] == "=":
                cut -= 2
            cur.append(line[:cut] + "=")
            line = line[cut:]
        cur.append(line)
        out_lines.extend(cur)
    return "\n".join(out_lines)


def qp_decode(text: str) -> bytes:
    t = text.replace("\r\n", "\n")
    t = re.sub(r"=\n", "", t)  # soft line breaks vanish
    out = bytearray()
    i = 0
    while i < len(t):
        ch = t[i]
        if ch == "=":
            hx = t[i + 1 : i + 3]
            if len(hx) == 2 and re.fullmatch(r"[0-9A-Fa-f]{2}", hx):
                out.append(int(hx, 16))
                i += 3
                continue
            raise ValueError(f"bad quoted-printable escape at offset {i}")
        out.extend(ch.encode("latin-1", errors="replace"))
        i += 1
    return bytes(out)


# ---------------------------------------------------------------- base64 ---


def _b64_encode(data: bytes) -> str:
    lines = []
    for i in range(0, len(data), 57):
        lines.append(
            binascii.b2a_base64(data[i : i + 57], newline=False).decode("ascii")
        )
    return "\n".join(lines) if lines else ""


def _b64_decode(text: str) -> bytes:
    compact = re.sub(r"\s+", "", text)
    if not compact:
        return b""
    try:
        return binascii.a2b_base64(compact)
    except (binascii.Error, ValueError) as exc:
        raise ValueError(f"bad base64 body: {exc}") from exc

# ------------------------------------------------------------- RFC 2047 ---


def _decode_encoded_word(charset: str, enc: str, payload: str) -> str:
    cs = charset.split("*")[0].lower()  # strip RFC 2231 language tag
    if enc.upper() == "B":
        raw = _b64_decode(payload)
    else:  # Q: like QP but '_' means space and no soft breaks
        raw = qp_decode(payload.replace("_", "=20"))
    try:
        return raw.decode(cs)
    except (LookupError, UnicodeDecodeError) as exc:
        raise ValueError(f"bad encoded-word charset {charset!r}: {exc}") from exc


def decode_header_value(value: str) -> str:
    """Unfolded header text with RFC 2047 encoded-words decoded;
    whitespace BETWEEN adjacent encoded-words is removed (§6.2)."""
    value = _ADJACENT_EW.sub(r"\1", value)
    return _ENCODED_WORD.sub(
        lambda m: _decode_encoded_word(m.group(1), m.group(2), m.group(3)),
        value,
    )


def encode_header_value(text: str, force: bool = False) -> str:
    """Subject as either plain ASCII or a chain of B-encoded words (what
    real MUAs emit for non-ASCII; `force` exercises the path on ASCII).
    Each encoded-word carries an INTEGRAL number of characters (RFC 2047
    §5: a multibyte sequence must not straddle encoded-words, or each
    word decodes to invalid utf-8 — found by the property test)."""
    if not force and all(32 <= ord(c) < 127 for c in text):
        return text
    words, chunk, size = [], [], 0
    for ch in text:
        b = len(ch.encode("utf-8"))
        if size + b > 30 and chunk:
            words.append(chunk)
            chunk, size = [], 0
        chunk.append(ch)
        size += b
    if chunk or not words:
        words.append(chunk)
    return " ".join(
        "=?utf-8?B?"
        + binascii.b2a_base64(
            "".join(w).encode("utf-8"), newline=False
        ).decode()
        + "?="
        for w in words
    )


# ------------------------------------------------------- header parsing ---


def fold_header_value(value: str) -> str:
    """RFC 5322 §2.2.3 folding for encoded-word chains: break at the
    single-space boundaries between encoded-words so no line exceeds
    ~76 chars.  Values containing anything but a chain of encoded-words
    are returned untouched (folding a plain subject with doubled spaces
    would not round-trip through unfolding)."""
    parts = value.split(" ")
    if len(parts) < 2 or not all(
        p.startswith("=?") and p.endswith("?=") for p in parts
    ):
        return value
    lines, cur = [], ""
    for p in parts:
        if cur and len(cur) + 1 + len(p) > 66:  # + 'Subject: ' stays < 78
            lines.append(cur)
            cur = p
        else:
            cur = f"{cur} {p}" if cur else p
    lines.append(cur)
    return "\n ".join(lines)


def _split_head_body(raw: str) -> tuple[str, str]:
    for sep in ("\r\n\r\n", "\n\n"):
        k = raw.find(sep)
        if k >= 0:
            return raw[:k], raw[k + len(sep):]
    return raw, ""


def _parse_headers(head: str) -> dict[str, str]:
    """Unfold continuations; last occurrence wins (sufficient here —
    the fields this extractor reads are single-valued)."""
    out: dict[str, str] = {}
    cur_name: str | None = None
    for line in head.replace("\r\n", "\n").split("\n"):
        if line[:1] in (" ", "\t") and cur_name is not None:
            out[cur_name] += " " + line.strip()
            continue
        if not line.strip():
            continue
        name, colon, val = line.partition(":")
        if not colon:
            raise ValueError(f"malformed header line {line[:40]!r}")
        cur_name = name.strip().lower()
        out[cur_name] = val.strip()
    return out


def _content_type(headers: dict[str, str]) -> tuple[str, dict[str, str]]:
    raw = headers.get("content-type", "text/plain; charset=us-ascii")
    parts = raw.split(";")
    ctype = parts[0].strip().lower()
    params: dict[str, str] = {}
    for p in parts[1:]:
        k, eq, v = p.partition("=")
        if eq:
            v = v.strip()
            if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
                v = v[1:-1]
            params[k.strip().lower()] = v
    return ctype, params


def _decode_body(body: str, headers: dict[str, str], charset: str) -> str:
    cte = headers.get("content-transfer-encoding", "7bit").strip().lower()
    if cte in ("7bit", "8bit", "binary"):
        return body
    if cte == "quoted-printable":
        raw = qp_decode(body)
    elif cte == "base64":
        raw = _b64_decode(body)
    else:
        raise ValueError(f"unknown content-transfer-encoding {cte!r}")
    try:
        return raw.decode(charset)
    except (LookupError, UnicodeDecodeError) as exc:
        raise ValueError(f"bad body charset {charset!r}: {exc}") from exc


# --------------------------------------------------------- MIME walking ---


def _disposition(headers: dict[str, str]) -> tuple[str, str | None]:
    """(disposition-type, filename) from Content-Disposition (RFC 2183);
    filename may carry RFC 2047 encoded-words (what real MUAs emit
    despite RFC 2231)."""
    raw = headers.get("content-disposition", "")
    parts = raw.split(";")
    dtype = parts[0].strip().lower()
    fname = None
    for p in parts[1:]:
        k, eq, v = p.partition("=")
        if eq and k.strip().lower() == "filename":
            v = v.strip()
            if len(v) >= 2 and v[0] == '"' and v[-1] == '"':
                v = v[1:-1]
            fname = decode_header_value(v)
    return dtype, fname


def _walk_entity(
    raw: str,
    leaves: list[tuple[str, str]],
    attachments: list[tuple[str, str, bytes]] | None = None,
) -> None:
    """Depth-first (ctype, text) leaves; when ``attachments`` is given,
    non-text leaves and Content-Disposition:attachment parts collect
    (filename, ctype, decoded bytes) instead of being dropped."""
    head, body = _split_head_body(raw)
    headers = _parse_headers(head)
    ctype, params = _content_type(headers)
    if ctype.startswith("multipart/"):
        boundary = params.get("boundary")
        if not boundary:
            raise ValueError("multipart entity without boundary parameter")
        sep = "--" + boundary
        lines = body.replace("\r\n", "\n").split("\n")
        part_lines: list[str] | None = None  # None = in preamble
        for line in lines:
            if line.rstrip() == sep + "--":
                if part_lines is not None:
                    _walk_entity("\n".join(part_lines), leaves, attachments)
                part_lines = None
                break
            if line.rstrip() == sep:
                if part_lines is not None:
                    _walk_entity("\n".join(part_lines), leaves, attachments)
                part_lines = []
                continue
            if part_lines is not None:
                part_lines.append(line)
        return
    dtype, fname = _disposition(headers)
    is_attachment = dtype == "attachment" or (
        not ctype.startswith("text/") and attachments is not None
    )
    if is_attachment:
        if attachments is not None:
            cte = headers.get(
                "content-transfer-encoding", "7bit"
            ).strip().lower()
            if cte == "base64":
                data = _b64_decode(body)
            elif cte == "quoted-printable":
                data = qp_decode(body)
            else:
                data = body.encode("utf-8")
            attachments.append((fname or "", ctype, data))
        # without a sink, an explicit Content-Disposition:attachment leaf
        # is SKIPPED, never collected as body text — a text/plain
        # attachment preceding the real body must not become the message
        return
    if ctype in ("text/plain", "text/html"):
        charset = params.get("charset", "us-ascii").lower()
        leaves.append((ctype, _decode_body(body, headers, charset)))
    # other leaf types without an attachments sink are dropped


def extract_attachments(payload: bytes) -> list[tuple[str, str, bytes]]:
    """(filename, ctype, decoded bytes) for every attachment part —
    Content-Disposition:attachment or any non-text leaf — in depth-first
    MIME order."""
    raw = payload.decode("utf-8")
    leaves: list[tuple[str, str]] = []
    atts: list[tuple[str, str, bytes]] = []
    _walk_entity(raw, leaves, atts)
    return atts


def parse_email(payload: bytes) -> EmailDoc:
    """Parse one RFC 5322 message: decoded Subject, Date as epoch, and
    the best text body (first text/plain leaf depth-first, else first
    text/html leaf with tags stripped)."""
    raw = payload.decode("utf-8")
    head, _body = _split_head_body(raw)
    headers = _parse_headers(head)
    subject = decode_header_value(headers.get("subject", ""))
    date_raw = headers.get("date")
    if date_raw is None:
        raise ValueError("message has no Date header")
    date_epoch = parse_rfc822_date(date_raw)
    leaves: list[tuple[str, str]] = []
    _walk_entity(raw, leaves)
    text = next((t for c, t in leaves if c == "text/plain"), None)
    if text is None:
        html = next((t for c, t in leaves if c == "text/html"), None)
        if html is None:
            raise ValueError("message has no text part")
        text = " ".join(_TAG.sub(" ", html).split())
    ids = _MSGID.findall(headers.get("message-id", ""))
    reply = _MSGID.findall(headers.get("in-reply-to", ""))
    refs = _MSGID.findall(headers.get("references", ""))
    # JWZ parent rule: first In-Reply-To id, else the LAST References id
    parent = reply[0] if reply else (refs[-1] if refs else None)
    return EmailDoc(
        subject, date_epoch, text, ids[0] if ids else None, parent
    )


# -------------------------------------------------------------- writer ---


def _html_wrap(text: str) -> str:
    esc = text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    return f"<html><body><p>{esc}</p></body></html>"


def encode_email(
    subject: str,
    date_epoch: int,
    body_text: str,
    structure: int,
    msg_id: str | None = None,
    in_reply_to: str | None = None,
    references: list[str] | None = None,
) -> bytes:
    """Compose a conforming message.  structure%4 selects: 0 plain-8bit,
    1 plain-QP, 2 multipart/alternative (base64 HTML first, base64 plain
    second), 3 multipart/mixed(nested alternative in QP + attachment).
    Odd structures force RFC 2047 B-encoding of the ASCII subject.
    ``msg_id``/``in_reply_to``/``references`` (bare ids, no angle
    brackets) write the RFC 5322 threading headers."""
    st = structure % 4
    subj = encode_header_value(subject, force=bool(st % 2))
    common = [
        "From: corpus-writer <writer@example.org>",
        "To: corpus <corpus@example.org>",
        f"Subject: {fold_header_value(subj)}",
        f"Date: {format_rfc2822(date_epoch)}",
        f"Message-ID: <{msg_id or f'{structure}.{date_epoch}@example.org'}>",
    ]
    if in_reply_to:
        common.append(f"In-Reply-To: <{in_reply_to}>")
    if references:
        common.append(
            "References: " + " ".join(f"<{r}>" for r in references)
        )
    common += [
        "MIME-Version: 1.0",
    ]
    data = body_text.encode("utf-8")
    if st == 0:
        lines = common + [
            'Content-Type: text/plain; charset="utf-8"',
            "Content-Transfer-Encoding: 8bit",
            "",
            body_text,
        ]
    elif st == 1:
        lines = common + [
            "Content-Type: text/plain; charset=utf-8",
            "Content-Transfer-Encoding: quoted-printable",
            "",
            qp_encode(data),
        ]
    elif st == 2:
        b = f"=_alt_{date_epoch}_="
        lines = common + [
            f'Content-Type: multipart/alternative; boundary="{b}"',
            "",
            "preamble is ignored by conforming readers",
            f"--{b}",
            "Content-Type: text/html; charset=utf-8",
            "Content-Transfer-Encoding: base64",
            "",
            _b64_encode(_html_wrap(body_text).encode("utf-8")),
            f"--{b}",
            "Content-Type: text/plain; charset=utf-8",
            "Content-Transfer-Encoding: base64",
            "",
            _b64_encode(data),
            f"--{b}--",
            "epilogue, equally ignored",
        ]
    else:
        bo, bi = f"=_mix_{date_epoch}_=", f"=_alt2_{date_epoch}_="
        att = hashlib.md5(data).digest()
        lines = common + [
            f'Content-Type: multipart/mixed; boundary="{bo}"',
            "",
            f"--{bo}",
            f'Content-Type: multipart/alternative; boundary="{bi}"',
            "",
            f"--{bi}",
            "Content-Type: text/html; charset=utf-8",
            "Content-Transfer-Encoding: quoted-printable",
            "",
            qp_encode(_html_wrap(body_text).encode("utf-8")),
            f"--{bi}",
            "Content-Type: text/plain; charset=utf-8",
            "Content-Transfer-Encoding: quoted-printable",
            "",
            qp_encode(data),
            f"--{bi}--",
            f"--{bo}",
            "Content-Type: application/octet-stream",
            "Content-Transfer-Encoding: base64",
            'Content-Disposition: attachment; filename="digest.bin"',
            "",
            _b64_encode(att),
            f"--{bo}--",
        ]
    return "\n".join(lines).encode("utf-8")


# ----------------------------------------------------------- mbox layer ---

_FROM_QUOTED = re.compile(rb"^(>*)From ", re.M)


def encode_mbox(messages: list[bytes]) -> bytes:
    """mboxrd: 'From ' separator lines, '>'-quoting of body lines
    matching ^>*From so any byte-exact message round-trips.  The
    terminator is an UNCONDITIONAL '\\n\\n' (classic mbox's
    append-newline-if-missing rule cannot represent a message that
    itself ends in a newline; the fixed frame can)."""
    out = bytearray()
    for msg in messages:
        quoted = _FROM_QUOTED.sub(rb">\1From ", msg)
        out += b"From corpus@example.org Thu Jan  1 00:00:00 1970\n"
        out += quoted
        out += b"\n\n"  # unconditional frame terminator
    return bytes(out)


def split_mbox(payload: bytes) -> list[bytes]:
    """Inverse of encode_mbox: split at ^From  lines, un-quote ^>+From,
    strip the two-byte frame terminator."""
    if payload and not payload.startswith(b"From "):
        raise ValueError("mbox does not start with a 'From ' separator line")
    lines = payload.split(b"\n")
    if lines and lines[-1] == b"":
        lines.pop()  # the artifact of splitting a newline-terminated file
    msgs: list[bytes] = []
    cur: list[bytes] | None = None
    for line in lines:
        if line.startswith(b"From "):
            if cur is not None:
                # every collected line ended with '\n' in the file,
                # including the one before this separator
                msgs.append(b"\n".join(cur) + b"\n")
            cur = []
            continue
        if cur is not None:
            if re.match(rb"^>+From ", line):
                line = line[1:]
            cur.append(line)
    if cur is not None:
        msgs.append(b"\n".join(cur) + b"\n")
    out = []
    for m in msgs:
        if m.endswith(b"\n\n"):
            m = m[:-2]  # our writer's fixed frame
        elif m.endswith(b"\n"):
            m = m[:-1]  # tolerate foreign classic-mbox framing
        out.append(m)
    return out


def encode_email_with_attachments(
    subject: str,
    date_epoch: int,
    body_text: str,
    attachments: list[tuple[str, bytes]],
    qp_body: bool = False,
) -> bytes:
    """Compose multipart/mixed: a text/plain body part (8bit or QP)
    followed by one base64 attachment part per (filename, bytes), each
    with a Content-Disposition filename (RFC 2047 B-encoded when
    non-ASCII)."""
    b = f"=_att_{date_epoch}_="
    lines = [
        "From: corpus-writer <writer@example.org>",
        "To: corpus <corpus@example.org>",
        f"Subject: {encode_header_value(subject)}",
        f"Date: {format_rfc2822(date_epoch)}",
        f"Message-ID: <att.{date_epoch}@example.org>",
        "MIME-Version: 1.0",
        f'Content-Type: multipart/mixed; boundary="{b}"',
        "",
        f"--{b}",
        "Content-Type: text/plain; charset=utf-8",
    ]
    if qp_body:
        lines += [
            "Content-Transfer-Encoding: quoted-printable",
            "",
            qp_encode(body_text.encode("utf-8")),
        ]
    else:
        lines += ["Content-Transfer-Encoding: 8bit", "", body_text]
    for fname, data in attachments:
        fn = encode_header_value(fname)
        lines += [
            f"--{b}",
            "Content-Type: application/octet-stream",
            "Content-Transfer-Encoding: base64",
            f'Content-Disposition: attachment; filename="{fn}"',
            "",
            _b64_encode(data),
        ]
    lines.append(f"--{b}--")
    return "\n".join(lines).encode("utf-8")
