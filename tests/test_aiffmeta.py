"""AIFF / AIFF-C metadata walk — operators/aiffmeta.py (r15)."""

from __future__ import annotations

import struct

import pytest

from pasardassist_spark.operators.aiffmeta import (
    _read_extended80,
    _write_extended80,
    encode_aiff_meta,
    parse_aiff_meta,
    sniff_aiff,
)


@pytest.mark.parametrize("rate", [8000, 11025, 22050, 44100, 48000, 96000])
def test_extended80_roundtrip(rate):
    assert _read_extended80(_write_extended80(float(rate))) == float(rate)


def test_extended80_known_bytes():
    """44100 Hz is the canonical spec example: exponent 0x400E,
    mantissa 0xAC44000000000000."""
    b = _write_extended80(44100.0)
    assert b == bytes.fromhex("400e" + "ac44000000000000")
    assert _read_extended80(b) == 44100.0
    with pytest.raises(ValueError, match="NaN/Inf"):
        _read_extended80(bytes.fromhex("7fff" + "8000000000000000"))


@pytest.mark.parametrize("form", ["aiff", "aifc"])
def test_roundtrip_both_forms(form):
    p = encode_aiff_meta(
        form=form, channels=2, sample_rate=48000, bits=16,
        n_frames=48000 * 3 + 7, name="odd", author="A",
    )
    assert sniff_aiff(p)
    m = parse_aiff_meta(p)
    assert (m.form, m.channels, m.sample_rate, m.bits_per_sample) == (
        form, 2, 48000, 16,
    )
    assert m.duration_ms == (48000 * 3 + 7) * 1000 // 48000
    assert m.name == "odd" and m.author == "A"  # odd NAME exercises pad


def test_aifc_codec_raises_by_name():
    p = encode_aiff_meta(form="aifc", compression=b"ima4")
    with pytest.raises(NotImplementedError, match="ima4"):
        parse_aiff_meta(p)


def test_torn_and_malformed():
    p = encode_aiff_meta()
    # a blunt tail cut trips the FORM-size gate first; a cut WITH the
    # FORM size patched down lands in the chunk walk
    with pytest.raises(ValueError, match="exceeds file"):
        parse_aiff_meta(p[:-5])
    patched = bytearray(p[:-5])
    struct.pack_into(">I", patched, 4, len(patched) - 8)
    with pytest.raises(ValueError, match="torn AIFF chunk"):
        parse_aiff_meta(bytes(patched))
    with pytest.raises(ValueError, match="not an AIFF"):
        parse_aiff_meta(b"RIFF" + p[4:])
    # FORM size lying past EOF
    bad = bytearray(p)
    struct.pack_into(">I", bad, 4, len(p) * 2)
    with pytest.raises(ValueError, match="exceeds file"):
        parse_aiff_meta(bytes(bad))
    # no COMM
    q = encode_aiff_meta()
    at = q.find(b"COMM")
    gutted = bytearray(q)
    gutted[at : at + 4] = b"JUNK"
    with pytest.raises(ValueError, match="no COMM"):
        parse_aiff_meta(bytes(gutted))
