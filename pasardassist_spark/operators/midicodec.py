"""Standard MIDI File (SMF) codec — the symbolic-music member of the
multimodal family (music-generation corpora ship as .mid archives; the
event stream is what tokenizers like REMI/MIDI-Like consume).

Stdlib-only and REAL:

- the MThd header (format 0/1, track count, ticks-per-quarter division;
  SMPTE divisions raise by name);
- MTrk chunks parsed event-by-event: variable-length-quantity delta
  times (the 7-bits-per-byte big-endian encoding), RUNNING STATUS (a
  channel event may omit its status byte, inheriting the previous one —
  the compression every real-world file uses), note-on/note-off with
  the note-on-velocity-0 = note-off convention, polyphonic/channel
  pressure, control change, program change, pitch bend;
- meta events (length-prefixed): end-of-track (required, 0x2F), tempo
  (0x51, microseconds per quarter), others skipped by length; sysex
  (F0/F7) skipped by length.

``parse_midi`` returns (division, tracks) where each track is a list of
(tick, kind, channel, a, b) tuples with absolute ticks accumulated from
the deltas.  Malformed chunks, truncated VLQs, and missing end-of-track
raise ``ValueError``.

The writer synthesizes conforming format-1 files (VLQ deltas crossing
the 1/2-byte boundary, running status on consecutive same-channel
events, interleaved tempo metas) so every parser path runs on genuine
bytes.
"""

from __future__ import annotations

import struct

__all__ = ["encode_midi", "parse_midi", "sniff_midi"]


def sniff_midi(payload: bytes) -> bool:
    return payload[:4] == b"MThd"


def _read_vlq(buf: bytes, pos: int) -> tuple[int, int]:
    val = 0
    for _ in range(4):
        if pos >= len(buf):
            raise ValueError("truncated MIDI variable-length quantity")
        b = buf[pos]
        pos += 1
        val = (val << 7) | (b & 0x7F)
        if not b & 0x80:
            return val, pos
    raise ValueError("MIDI variable-length quantity exceeds 4 bytes")


def _write_vlq(val: int) -> bytes:
    if val < 0:
        raise ValueError("negative MIDI delta")
    out = [val & 0x7F]
    val >>= 7
    while val:
        out.append((val & 0x7F) | 0x80)
        val >>= 7
    return bytes(reversed(out))


# event kinds with (status-high, number of data bytes)
_CHANNEL_EVENTS = {
    0x80: ("note_off", 2),
    0x90: ("note_on", 2),
    0xA0: ("poly_pressure", 2),
    0xB0: ("control", 2),
    0xC0: ("program", 1),
    0xD0: ("channel_pressure", 1),
    0xE0: ("pitch_bend", 2),
}


def parse_midi(payload: bytes) -> tuple[int, list[list[tuple]]]:
    try:
        return _parse_midi(payload)
    except struct.error as exc:
        raise ValueError(f"malformed MIDI payload: {exc}") from exc


def _parse_midi(payload: bytes) -> tuple[int, list[list[tuple]]]:
    if not sniff_midi(payload):
        raise ValueError("not a Standard MIDI File")
    if len(payload) < 14:
        raise ValueError("truncated MIDI header")
    hlen, fmt, ntrks, division = struct.unpack(">IHHH", payload[4:14])
    if hlen < 6:
        raise ValueError("bad MThd length")
    if fmt not in (0, 1):
        raise NotImplementedError(f"MIDI format {fmt} unsupported (0/1 only)")
    if division & 0x8000:
        raise NotImplementedError("SMPTE time division unsupported")
    pos = 8 + hlen
    tracks: list[list[tuple]] = []
    for _ in range(ntrks):
        if payload[pos : pos + 4] != b"MTrk":
            raise ValueError(f"expected MTrk chunk at offset {pos}")
        (tlen,) = struct.unpack(">I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + tlen]
        if len(body) != tlen:
            raise ValueError("truncated MTrk chunk")
        pos += 8 + tlen
        tracks.append(_parse_track(body))
    return division, tracks


def _parse_track(body: bytes) -> list[tuple]:
    events: list[tuple] = []
    tick = 0
    i = 0
    status: int | None = None
    ended = False
    n = len(body)
    while i < n:
        delta, i = _read_vlq(body, i)
        tick += delta
        if i >= n:
            raise ValueError("MIDI track ends mid-event")
        b = body[i]
        if b & 0x80:
            status = b
            i += 1
        elif status is None:
            raise ValueError("MIDI running status without a prior status byte")
        if status == 0xFF:  # meta
            if i >= n:
                raise ValueError("truncated MIDI meta event")
            mtype = body[i]
            length, j = _read_vlq(body, i + 1)
            data = body[j : j + length]
            if len(data) != length:
                raise ValueError("truncated MIDI meta payload")
            i = j + length
            if mtype == 0x2F:
                ended = True
                break
            if mtype == 0x51:
                if length != 3:
                    raise ValueError("bad MIDI tempo meta length")
                events.append(
                    (tick, "tempo", -1, int.from_bytes(data, "big"), 0)
                )
            # other metas (name, time signature, ...) carry no note info
            status = None  # meta/sysex clear running status
            continue
        if status in (0xF0, 0xF7):  # sysex
            length, j = _read_vlq(body, i)
            i = j + length
            status = None
            continue
        hi = status & 0xF0
        ch = status & 0x0F
        if hi not in _CHANNEL_EVENTS:
            raise ValueError(f"bad MIDI status byte {status:#x}")
        kind, ndata = _CHANNEL_EVENTS[hi]
        if i + ndata > n:
            raise ValueError("truncated MIDI channel event")
        a = body[i]
        bb = body[i + 1] if ndata == 2 else 0
        if a & 0x80 or bb & 0x80:
            raise ValueError("MIDI data byte with high bit set")
        i += ndata
        if kind == "note_on" and bb == 0:
            kind = "note_off"  # velocity-0 convention
        events.append((tick, kind, ch, a, bb))
    if not ended:
        raise ValueError("MIDI track missing end-of-track meta")
    return events


# --------------------------------------------------------------- writer ---


def encode_midi(
    tracks: list[list[tuple]], division: int = 480, tempo_us: int = 500000
) -> bytes:
    """Format-1 writer: each track is a list of (delta, kind, channel,
    a, b); running status is emitted for consecutive same-status events
    (exercising the parser's inheritance path); a tempo meta leads the
    first track."""
    out = bytearray(b"MThd" + struct.pack(">IHHH", 6, 1, len(tracks), division))
    kind_to_hi = {k: hi for hi, (k, _) in _CHANNEL_EVENTS.items()}
    for ti, track in enumerate(tracks):
        body = bytearray()
        if ti == 0:
            body += _write_vlq(0) + b"\xff\x51\x03" + tempo_us.to_bytes(3, "big")
        last_status: int | None = None
        for delta, kind, ch, a, b in track:
            body += _write_vlq(delta)
            hi = kind_to_hi[kind]
            st = hi | ch
            if st != last_status:
                body.append(st)
                last_status = st
            body.append(a)
            if _CHANNEL_EVENTS[hi][1] == 2:
                body.append(b)
        body += _write_vlq(0) + b"\xff\x2f\x00"
        out += b"MTrk" + struct.pack(">I", len(body)) + body
    return bytes(out)
