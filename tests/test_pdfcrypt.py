"""PDF standard security handler (operators/pdfcrypt.py + the pdftext
integration): published crypto vectors, owner-locked roundtrips in both
container generations, per-object string decryption, and the named
raises for the unsupported families."""

import hashlib

import pytest

from pasardassist_spark.operators.pdfcrypt import (
    PAD,
    StandardSecurityHandler,
    _compute_o,
    _compute_u,
    _decrypt_block,
    _encrypt_block,
    _expand_key,
    aes_cbc_decrypt,
    aes_cbc_encrypt,
    make_standard_encrypt_dict,
    rc4,
)
from pasardassist_spark.operators.pdftext import (
    _Document,
    encode_pdf,
    extract_pdf_pages,
)

PAGES = ["owner-locked page one " * 4, "and a second page"]


# ---------------------------------------------------- primitive vectors ---


def test_aes_fips197_known_answers():
    """FIPS-197 Appendix C example vectors for all three key sizes —
    pins the block cipher itself, so encoder/decoder can't share a bug."""
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    vectors = [
        ("000102030405060708090a0b0c0d0e0f",
         "69c4e0d86a7b0430d8cdb78070b4c55a"),
        ("000102030405060708090a0b0c0d0e0f1011121314151617",
         "dda97ca4864cdfe06eaf70a0ec0d7191"),
        ("000102030405060708090a0b0c0d0e0f"
         "101112131415161718191a1b1c1d1e1f",
         "8ea2b7ca516745bfeafc49904b496089"),
    ]
    for key_hex, ct_hex in vectors:
        rk = _expand_key(bytes.fromhex(key_hex))
        ct = _encrypt_block(rk, pt)
        assert ct.hex() == ct_hex
        assert _decrypt_block(rk, ct) == pt


def test_rc4_published_vectors():
    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert (
        rc4(b"Secret", b"Attack at dawn").hex().upper()
        == "45A01F645FC35B383552544B9BF5"
    )
    # symmetric
    assert rc4(b"Key", rc4(b"Key", b"roundtrip")) == b"roundtrip"


def test_aes_cbc_roundtrip_and_padding():
    key = bytes(range(16))
    iv = bytes(range(16, 32))
    for size in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:size] * 1
        ct = aes_cbc_encrypt(key, iv, data)
        assert ct[:16] == iv and len(ct) % 16 == 0 and len(ct) > len(data)
        assert aes_cbc_decrypt(key, ct) == data
    with pytest.raises(ValueError, match="padding"):
        aes_cbc_decrypt(key, aes_cbc_encrypt(key, iv, b"x")[:-16] + bytes(16))
    with pytest.raises(ValueError, match="length"):
        aes_cbc_decrypt(key, b"short")


def test_o_u_entries_frozen():
    """Byte-exact regression pin for the §7.6.3 key-derivation chain
    (Algorithms 2-5) at fixed inputs: any drift in padding, iteration
    counts, or the 19-pass RC4 loop shows up here first."""
    id0 = hashlib.md5(b"pin").digest()
    # NOTE rc4-128 and aes-128 share O/U: V2/R3 and V4/R4 run the same
    # Algorithm 2/3/5 chain at Length 128 with EncryptMetadata true —
    # only the per-object cipher differs.
    for mode, o_want, u_want in [
        ("rc4-40",
         "c92422687facee686e373f10b5c7d047"
         "38053152f7e2ee30e11c69ec442576ab",
         "1d0a4cfb333ae45bae4c9141c6b24fd5"
         "4b20b45a16c1ec30b64d78fec3c1a6e7"),
        ("rc4-128",
         "566fa873ee33c797cd3b904fdadf814a"
         "fa34df9a38f6ed41b984e2c6da2aa6f5",
         "7840d837b4d9d9af0f210c58eada7e65"
         "00000000000000000000000000000000"),
        ("aes-128",
         "566fa873ee33c797cd3b904fdadf814a"
         "fa34df9a38f6ed41b984e2c6da2aa6f5",
         "7840d837b4d9d9af0f210c58eada7e65"
         "00000000000000000000000000000000"),
    ]:
        enc, _ = make_standard_encrypt_dict(mode, id0)
        assert bytes(enc["O"]).hex() == o_want, mode
        assert bytes(enc["U"]).hex() == u_want, mode


def test_o_entry_roundtrip_owner_key():
    """Algorithm 3 inverse check: decrypting /O with the owner key chain
    recovers the padded USER password — the property Algorithm 7 (owner
    password authentication) relies on."""
    n = 16
    digest = hashlib.md5((b"owner" + PAD)[:32]).digest()
    for _ in range(50):
        digest = hashlib.md5(digest).digest()
    key = digest[:n]
    o = _compute_o(b"owner", b"", 3, n)
    # invert the 19-pass chain then the base pass
    for i in range(19, 0, -1):
        o = rc4(bytes(b ^ i for b in key), o)
    assert rc4(key, o) == (b"" + PAD)[:32]


# ------------------------------------------------------ file roundtrips ---


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aes-128"])
@pytest.mark.parametrize("xref_stream", [False, True])
def test_encrypted_roundtrip_both_containers(mode, xref_stream):
    payload = encode_pdf(PAGES, xref_stream=xref_stream, encrypt=mode)
    assert extract_pdf_pages(payload) == PAGES
    # deterministic fixture bytes (registry oracles hash them)
    assert payload == encode_pdf(PAGES, xref_stream=xref_stream, encrypt=mode)


@pytest.mark.parametrize("cf", ["flate", "lzw", "a85flate", "rlhex"])
def test_encrypted_filter_cascades(cf):
    """Decrypt-then-filter order: encryption wraps the FILTERED bytes,
    so every cascade must survive under AES."""
    payload = encode_pdf(PAGES, content_filter=cf, encrypt="aes-128")
    assert extract_pdf_pages(payload) == PAGES


def test_encrypted_string_decryption():
    """The /Info /Title string is per-object encrypted file-level; the
    document machinery must transparently decrypt it (streams alone
    roundtripping would not prove string handling)."""
    for mode in ("rc4-40", "aes-128"):
        for xs in (False, True):
            doc = _Document(encode_pdf(PAGES, xref_stream=xs, encrypt=mode))
            info = doc.resolve(doc.trailer.get("Info"))
            assert info["Title"] == b"pasardassist pdf fixture", (mode, xs)


def test_explicit_user_password():
    """A file with a NON-empty user password opens only with it."""
    from pasardassist_spark.operators.pdfcrypt import (
        make_standard_encrypt_dict as mk,
    )

    id0 = hashlib.md5(b"pw-case").digest()
    enc, key = mk("aes-128", id0, user_pw=b"sesame")
    h = StandardSecurityHandler(enc, id0, b"sesame")
    assert h.key == key
    with pytest.raises(ValueError, match="password incorrect"):
        StandardSecurityHandler(enc, id0, b"")


def test_wrong_password_raises():
    payload = encode_pdf(PAGES, encrypt="rc4-128")
    with pytest.raises(ValueError, match="password incorrect"):
        extract_pdf_pages(payload, password="nope")


def test_unknown_revision_and_foreign_handler_raise_by_name():
    payload = encode_pdf(PAGES, encrypt="aes-128")
    v6 = payload.replace(b"/V 4 /R 4", b"/V 6 /R 7")
    with pytest.raises(NotImplementedError, match="/V 6"):
        extract_pdf_pages(v6)
    pubsec = payload.replace(b"/Filter /Standard", b"/Filter /Adbe.PkS\x20")
    with pytest.raises(NotImplementedError, match="security handler"):
        extract_pdf_pages(pubsec)


# ------------------------------------------------------------------- V5 ---


def test_v5_roundtrip_both_revisions_and_generations():
    for mode in ("aes-256", "aes-256-r5"):
        for xs in (False, True):
            payload = encode_pdf(PAGES, xref_stream=xs, encrypt=mode)
            assert extract_pdf_pages(payload) == PAGES
            assert extract_pdf_pages(payload, password="owner") == PAGES
            with pytest.raises(ValueError, match="password incorrect"):
                extract_pdf_pages(payload, password="nope")


def test_v5_user_password_case():
    from pasardassist_spark.operators.pdfcrypt import (
        StandardSecurityHandler,
        make_standard_encrypt_dict,
    )

    id0 = hashlib.md5(b"v5-pw-case").digest()
    enc, key = make_standard_encrypt_dict("aes-256", id0, user_pw=b"sesame")
    # both the user and owner passwords recover the SAME file key
    assert StandardSecurityHandler(enc, id0, b"sesame").key == key
    assert StandardSecurityHandler(enc, id0, b"owner").key == key
    with pytest.raises(ValueError, match="password incorrect"):
        StandardSecurityHandler(enc, id0, b"")


def test_v5_perms_tamper_detected():
    from pasardassist_spark.operators.pdfcrypt import (
        StandardSecurityHandler,
        make_standard_encrypt_dict,
    )

    id0 = hashlib.md5(b"v5-perms").digest()
    enc, _key = make_standard_encrypt_dict("aes-256", id0)
    bad = dict(enc)
    bad["Perms"] = bytes(16)
    with pytest.raises(ValueError, match="Perms"):
        StandardSecurityHandler(bad, id0, b"")
    # /P mismatch against the authenticated Perms echo
    bad2 = dict(enc)
    bad2["P"] = -44
    with pytest.raises(ValueError, match="Perms"):
        StandardSecurityHandler(bad2, id0, b"")


def test_v5_cfm_other_than_aesv3_raises_by_name():
    from pasardassist_spark.operators.pdfcrypt import (
        StandardSecurityHandler,
        make_standard_encrypt_dict,
    )

    id0 = hashlib.md5(b"v5-cfm").digest()
    enc, _key = make_standard_encrypt_dict("aes-256", id0)
    bad = dict(enc)
    bad["CF"] = {"StdCF": {"CFM": "AESV2", "Length": 16}}
    with pytest.raises(NotImplementedError, match="AESV2.*under /V 5"):
        StandardSecurityHandler(bad, id0, b"")


def test_hash_2b_loop_contract():
    """Algorithm 2.B runs at least 64 rounds and the SHA-256/384/512
    selection depends on the AES output (distinct passwords diverge)."""
    from pasardassist_spark.operators.pdfcrypt import _hash_2b

    a = _hash_2b(b"pw", b"saltsalt")
    b = _hash_2b(b"pw", b"saltsalt")
    assert a == b and len(a) == 32  # deterministic, 32 bytes
    assert _hash_2b(b"pw2", b"saltsalt") != a
    assert _hash_2b(b"pw", b"saltsalT") != a
    assert _hash_2b(b"pw", b"saltsalt", b"u" * 48) != a


def test_aes256_cbc_cross_pinned_against_cryptography():
    """The PURE-Python AES-256 path (key schedule Nk=8, 14 rounds) that
    the fast-gated helpers fall back to, cross-checked against the
    system `cryptography` implementation — and the gated helpers must
    agree with the pure forms byte-for-byte."""
    cryptography = pytest.importorskip("cryptography")  # noqa: F841
    from cryptography.hazmat.primitives.ciphers import (
        Cipher,
        algorithms,
        modes,
    )

    from pasardassist_spark.operators.pdfcrypt import (
        _cbc_nopad,
        _cbc_nopad_pure,
        _ecb,
        _ecb_pure,
    )

    key = bytes(range(32))
    iv = bytes(range(100, 116))
    data = hashlib.sha512(b"cross-pin").digest()  # 64 bytes, aligned
    ref = Cipher(algorithms.AES(key), modes.CBC(iv)).encryptor()
    expect = ref.update(data) + ref.finalize()
    assert _cbc_nopad_pure(key, iv, data, encrypt=True) == expect
    assert _cbc_nopad_pure(key, iv, expect, encrypt=False) == data
    assert _cbc_nopad(key, iv, data, encrypt=True) == expect
    ref2 = Cipher(algorithms.AES(key), modes.ECB()).encryptor()
    expect2 = ref2.update(data) + ref2.finalize()
    assert _ecb_pure(key, data, encrypt=True) == expect2
    assert _ecb_pure(key, expect2, encrypt=False) == data
    assert _ecb(key, data, encrypt=True) == expect2


def test_fast_paths_match_pure_reference():
    """rc4 / aes_cbc gated fast paths == the pure-Python reference
    forms across key sizes (the odd PDF per-object sizes included)."""
    from pasardassist_spark.operators.pdfcrypt import (
        _aes_cbc_decrypt_pure,
        _aes_cbc_encrypt_pure,
        _rc4_pure,
        aes_cbc_decrypt,
        aes_cbc_encrypt,
        rc4,
    )

    data = hashlib.sha512(b"parity").digest() + b"odd-tail"
    for klen in (5, 8, 10, 13, 16):
        key = hashlib.sha256(bytes([klen])).digest()[:klen]
        assert rc4(key, data) == _rc4_pure(key, data)
    for klen in (16, 24, 32):
        key = hashlib.sha256(bytes([klen])).digest()[:klen]
        iv = hashlib.md5(key).digest()
        enc = aes_cbc_encrypt(key, iv, data)
        assert enc == _aes_cbc_encrypt_pure(key, iv, data)
        assert aes_cbc_decrypt(key, enc) == data
        assert _aes_cbc_decrypt_pure(key, enc) == data


def test_unknown_cfm_raises_by_name():
    payload = encode_pdf(PAGES, encrypt="aes-128")
    broken = payload.replace(b"/CFM /AESV2", b"/CFM /AESV3")
    with pytest.raises(NotImplementedError, match="AESV3"):
        extract_pdf_pages(broken)


def test_unencrypted_writer_bytes_unchanged():
    """encrypt=None output is byte-identical to the pre-round-14 writer
    (hash pinned) — the archived fixture families must not shift."""
    a = encode_pdf(["page one text", "two"], xref_stream=False)
    b = encode_pdf(["page one text", "two"], xref_stream=True,
                   content_filter="lzw")
    assert hashlib.md5(a).hexdigest() == "b64d4f305402db141400d68c5c5f289f"
    assert hashlib.md5(b).hexdigest() == "fe9166dc34314c4cf37cd807e8ab8c28"
