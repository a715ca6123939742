"""PDF standard security handler — RC4-40/128 and AES-128-CBC (pure
stdlib + pure-Python AES).

Reference parity: the reference pipeline dead-letters any fetched
document it cannot decode (src/utils payload handling); an owner-locked
PDF (empty USER password — the common "no copy/print" lock) is openable
by every conforming reader, so dead-lettering it is pure corpus loss at
crawl scale.  This module implements the /Filter /Standard security
handler of ISO 32000-1 §7.6.3 for encryption versions /V 1, 2 and 4
(revisions /R 2, 3, 4):

- Algorithm 2  — file encryption key from the (padded) user password,
  /O, /P, the first file identifier, and /EncryptMetadata;
- Algorithm 3  — the /O (owner) entry, needed by the fixture writer;
- Algorithms 4/5 — the /U (user) entry for R 2 / R >= 3;
- Algorithm 6  — user-password authentication (empty password = the
  owner-locked case this exists for);
- Algorithm 1  — per-object keys: MD5(key + objnum[3 LE] + gen[2 LE]
  [+ "sAlT" for AESV2]), truncated to min(n+5, 16) bytes;
- RC4, and AES in CBC mode with the PKCS#7 padding and leading-IV
  layout §7.6.2 prescribes (pure-Python FIPS-197 block cipher below —
  key schedule is generic over 128/192/256 so the OOXML agile-crypto
  seam can reuse it; at 100 TB the decrypt belongs in a JVM-side
  codec, this is the per-payload correctness reference).

/V 5 (AES-256) is ALSO implemented — both revisions of the SHA-2
handler family (ISO 32000-2 §7.6.4):

- /R 6 — Algorithm 2.B, the hardened iterated SHA-256/384/512 hash
  (64+ rounds of AES-128-CBC over password||K||udata with the
  last-byte termination rule);
- /R 5 — the deprecated Adobe Extension Level 3 single-pass SHA-256;
- Algorithms 2.A / 8 / 9 — user and owner authentication against the
  48-byte /U and /O entries (32-byte hash + validation salt + key
  salt), file-key unwrap from /UE // /OE via AES-256-CBC with a zero
  IV and no padding, and the /Perms AES-ECB integrity check ("adb"
  signature, /P echo);
- AESV3: strings and streams encrypt under the FILE key directly —
  /V 5 defines no per-object rekey.

Out of scope, raising NotImplementedError BY NAME: non-Standard
security handlers (public-key /Adobe.PubSec), and crypt filters other
than /Identity, /V2, /AESV2, /AESV3.  A wrong password raises
ValueError("PDF password incorrect").
"""

from __future__ import annotations

import hashlib

__all__ = [
    "rc4",
    "aes_cbc_encrypt",
    "aes_cbc_decrypt",
    "StandardSecurityHandler",
    "make_standard_encrypt_dict",
]

# §7.6.3.3 — the 32-byte password padding string
PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


def _rc4_pure(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (symmetric: encrypt == decrypt)."""
    s = list(range(256))
    j = 0
    klen = len(key)
    for i in range(256):
        j = (j + s[i] + key[i % klen]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[n] = c ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


try:  # fast RC4 when the host has it (the xls FILEPASS rotation runs
    # this over two thirds of the fixture corpus); the pure-Python form
    # above stays the reference and fallback, equivalence pinned in
    # tests/test_pdfcrypt.py
    from cryptography.hazmat.decrepit.ciphers.algorithms import (
        ARC4 as _ARC4,
    )
    from cryptography.hazmat.primitives.ciphers import Cipher as _Rc4Cipher

    def rc4(key: bytes, data: bytes) -> bytes:
        """RC4 stream cipher (symmetric: encrypt == decrypt)."""
        try:
            enc = _Rc4Cipher(_ARC4(key), mode=None).encryptor()
        except ValueError:
            # ARC4 admits only the standard key sizes; PDF per-object
            # keys can be any of 6..16 bytes (min(n+5, 16)) — odd sizes
            # take the reference implementation
            return _rc4_pure(key, data)
        return enc.update(data) + enc.finalize()

except ImportError:  # pragma: no cover - container always has it
    rc4 = _rc4_pure


# ------------------------------------------------------------------ AES ---
# FIPS-197 block cipher, table-based.  S-box generated from the affine
# transform over GF(2^8) so no 256-literal table is transcribed by hand.


def _make_sbox() -> tuple[bytes, bytes]:
    # multiplicative inverses in GF(2^8) via exp/log tables on generator 3
    exp = [0] * 512
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x ^= (x << 1) ^ (0x1B if x & 0x80 else 0)
        x &= 0xFF
    for i in range(255, 512):
        exp[i] = exp[i - 255]
    sbox = bytearray(256)
    for c in range(256):
        inv = 0 if c == 0 else exp[255 - log[c]]
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[c] = s ^ 0x63
    inv_sbox = bytearray(256)
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return bytes(sbox), bytes(inv_sbox)


_SBOX, _INV_SBOX = _make_sbox()


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


_MUL2 = bytes(_xtime(i) for i in range(256))
_MUL3 = bytes(_MUL2[i] ^ i for i in range(256))
_MUL9 = bytes(_xtime(_xtime(_xtime(i))) ^ i for i in range(256))
_MUL11 = bytes(_xtime(_xtime(_xtime(i)) ^ i) ^ i for i in range(256))
_MUL13 = bytes(_xtime(_xtime(_xtime(i) ^ i)) ^ i for i in range(256))
_MUL14 = bytes(_xtime(_xtime(_xtime(i) ^ i) ^ i) for i in range(256))


def _expand_key(key: bytes) -> list[bytes]:
    """Key schedule, generic over AES-128/192/256 (Nk 4/6/8)."""
    nk = len(key) // 4
    if len(key) not in (16, 24, 32):
        raise ValueError(f"bad AES key length {len(key)}")
    nr = {4: 10, 6: 12, 8: 14}[nk]
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = words[i - 1]
        if i % nk == 0:
            t = bytes(
                [
                    _SBOX[t[1]] ^ rcon,
                    _SBOX[t[2]],
                    _SBOX[t[3]],
                    _SBOX[t[0]],
                ]
            )
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = bytes(_SBOX[b] for b in t)
        words.append(bytes(a ^ b for a, b in zip(words[i - nk], t)))
    # one 16-byte round key per round
    return [b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1)]


def _encrypt_block(rk: list[bytes], block: bytes) -> bytes:
    s = bytearray(a ^ b for a, b in zip(block, rk[0]))
    nr = len(rk) - 1
    for rnd in range(1, nr):
        # SubBytes + ShiftRows
        t = bytes(
            _SBOX[s[(i + 4 * (i % 4)) % 16]] for i in range(16)
        )
        # MixColumns + AddRoundKey
        k = rk[rnd]
        for c in range(0, 16, 4):
            a0, a1, a2, a3 = t[c], t[c + 1], t[c + 2], t[c + 3]
            s[c] = _MUL2[a0] ^ _MUL3[a1] ^ a2 ^ a3 ^ k[c]
            s[c + 1] = a0 ^ _MUL2[a1] ^ _MUL3[a2] ^ a3 ^ k[c + 1]
            s[c + 2] = a0 ^ a1 ^ _MUL2[a2] ^ _MUL3[a3] ^ k[c + 2]
            s[c + 3] = _MUL3[a0] ^ a1 ^ a2 ^ _MUL2[a3] ^ k[c + 3]
    k = rk[nr]
    return bytes(
        _SBOX[s[(i + 4 * (i % 4)) % 16]] ^ k[i] for i in range(16)
    )


def _decrypt_block(rk: list[bytes], block: bytes) -> bytes:
    nr = len(rk) - 1
    s = bytearray(a ^ b for a, b in zip(block, rk[nr]))
    for rnd in range(nr - 1, 0, -1):
        # InvShiftRows + InvSubBytes
        t = bytes(
            _INV_SBOX[s[(i - 4 * (i % 4)) % 16]] for i in range(16)
        )
        # AddRoundKey + InvMixColumns
        k = rk[rnd]
        s = bytearray(16)
        for c in range(0, 16, 4):
            a0 = t[c] ^ k[c]
            a1 = t[c + 1] ^ k[c + 1]
            a2 = t[c + 2] ^ k[c + 2]
            a3 = t[c + 3] ^ k[c + 3]
            s[c] = _MUL14[a0] ^ _MUL11[a1] ^ _MUL13[a2] ^ _MUL9[a3]
            s[c + 1] = _MUL9[a0] ^ _MUL14[a1] ^ _MUL11[a2] ^ _MUL13[a3]
            s[c + 2] = _MUL13[a0] ^ _MUL9[a1] ^ _MUL14[a2] ^ _MUL11[a3]
            s[c + 3] = _MUL11[a0] ^ _MUL13[a1] ^ _MUL9[a2] ^ _MUL14[a3]
    k = rk[0]
    return bytes(
        _INV_SBOX[s[(i - 4 * (i % 4)) % 16]] ^ k[i] for i in range(16)
    )


def _aes_cbc_encrypt_pure(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CBC with PKCS#7 padding; returns iv + ciphertext (the PDF
    §7.6.2 string/stream layout)."""
    if len(iv) != 16:
        raise ValueError("AES-CBC IV must be 16 bytes")
    rk = _expand_key(key)
    padlen = 16 - len(data) % 16
    data = data + bytes([padlen]) * padlen
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
        prev = _encrypt_block(rk, block)
        out += prev
    return bytes(out)


def _aes_cbc_decrypt_pure(key: bytes, data: bytes) -> bytes:
    """Inverse of aes_cbc_encrypt: data = iv + ciphertext, PKCS#7 pad
    stripped.  Raises ValueError on torn length or corrupt padding."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError(f"bad AES-CBC payload length {len(data)}")
    rk = _expand_key(key)
    prev = data[:16]
    out = bytearray()
    for i in range(16, len(data), 16):
        block = data[i : i + 16]
        out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, block), prev))
        prev = block
    padlen = out[-1]
    if not 1 <= padlen <= 16 or out[-padlen:] != bytes([padlen]) * padlen:
        raise ValueError("corrupt AES-CBC padding")
    return bytes(out[:-padlen])


try:  # fast CBC for the stream/string layer when the host has it; the
    # pure-Python forms above stay the reference and fallback
    # (equivalence pinned in tests/test_pdfcrypt.py)
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _AesCipher,
        algorithms as _aes_algorithms,
        modes as _aes_modes,
    )

    def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
        """AES-CBC, PKCS#7 padded, iv-prefixed (§7.6.2 layout)."""
        if len(iv) != 16:
            raise ValueError("AES-CBC IV must be 16 bytes")
        padlen = 16 - len(data) % 16
        enc = _AesCipher(
            _aes_algorithms.AES(key), _aes_modes.CBC(iv)
        ).encryptor()
        return iv + enc.update(
            data + bytes([padlen]) * padlen
        ) + enc.finalize()

    def aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
        """Inverse of aes_cbc_encrypt; ValueError on torn/corrupt pad."""
        if len(data) < 32 or len(data) % 16:
            raise ValueError(f"bad AES-CBC payload length {len(data)}")
        dec = _AesCipher(
            _aes_algorithms.AES(key), _aes_modes.CBC(data[:16])
        ).decryptor()
        out = dec.update(data[16:]) + dec.finalize()
        padlen = out[-1]
        if not 1 <= padlen <= 16 or out[-padlen:] != bytes([padlen]) * padlen:
            raise ValueError("corrupt AES-CBC padding")
        return out[:-padlen]

except ImportError:  # pragma: no cover - container always has it
    aes_cbc_encrypt = _aes_cbc_encrypt_pure
    aes_cbc_decrypt = _aes_cbc_decrypt_pure


def _cbc_nopad_pure(
    key: bytes, iv: bytes, data: bytes, encrypt: bool
) -> bytes:
    """Raw AES-CBC over a block-aligned buffer — no padding, no IV
    prefix (the /UE //OE key-wrap, Algorithm 2.B, ODF and OOXML
    layouts)."""
    if len(data) % 16:
        raise ValueError("AES-CBC no-pad payload not block-aligned")
    rk = _expand_key(key)
    out = bytearray()
    prev = iv
    if encrypt:
        for i in range(0, len(data), 16):
            prev = _encrypt_block(
                rk, bytes(a ^ b for a, b in zip(data[i : i + 16], prev))
            )
            out += prev
    else:
        for i in range(0, len(data), 16):
            block = data[i : i + 16]
            out += bytes(a ^ b for a, b in zip(_decrypt_block(rk, block), prev))
            prev = block
    return bytes(out)


def _ecb_pure(key: bytes, data: bytes, encrypt: bool) -> bytes:
    """Raw AES-ECB (the 16-byte /Perms entry, OOXML standard package)."""
    if len(data) % 16:
        raise ValueError("AES-ECB payload not block-aligned")
    rk = _expand_key(key)
    f = _encrypt_block if encrypt else _decrypt_block
    return b"".join(f(rk, data[i : i + 16]) for i in range(0, len(data), 16))


try:  # fast no-pad CBC / ECB when the host has it (same contract as
    # the pure forms above, which remain the reference and fallback;
    # equivalence pinned in tests/test_pdfcrypt.py)
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _NpCipher,
        algorithms as _np_algorithms,
        modes as _np_modes,
    )

    def _cbc_nopad(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
        if len(data) % 16:
            raise ValueError("AES-CBC no-pad payload not block-aligned")
        c = _NpCipher(_np_algorithms.AES(key), _np_modes.CBC(iv))
        op = c.encryptor() if encrypt else c.decryptor()
        return op.update(data) + op.finalize()

    def _ecb(key: bytes, data: bytes, encrypt: bool) -> bytes:
        if len(data) % 16:
            raise ValueError("AES-ECB payload not block-aligned")
        c = _NpCipher(_np_algorithms.AES(key), _np_modes.ECB())
        op = c.encryptor() if encrypt else c.decryptor()
        return op.update(data) + op.finalize()

except ImportError:  # pragma: no cover - container always has it
    _cbc_nopad = _cbc_nopad_pure
    _ecb = _ecb_pure


# --------------------------------------------- standard security handler --


def _pad_password(pw: bytes) -> bytes:
    return (pw + PAD)[:32]


try:  # fast AES for the 2.B inner loop when the host has it; the
    # pure-Python block cipher stays the correctness reference and the
    # fallback (equivalence cross-pinned in tests/test_pdfcrypt.py)
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _CgCipher,
        algorithms as _cg_algorithms,
        modes as _cg_modes,
    )

    def _cbc_encrypt_fast(key: bytes, iv: bytes, data: bytes) -> bytes:
        enc = _CgCipher(
            _cg_algorithms.AES(key), _cg_modes.CBC(iv)
        ).encryptor()
        return enc.update(data) + enc.finalize()

except ImportError:  # pragma: no cover - container always has it

    def _cbc_encrypt_fast(key: bytes, iv: bytes, data: bytes) -> bytes:
        return _cbc_nopad(key, iv, data, encrypt=True)


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R 6 hardened hash.

    64+ rounds: each round AES-128-CBC-encrypts 64 repetitions of
    password||K||udata under K's first 16 bytes (IV = next 16), picks
    SHA-256/384/512 by sum(E[:16]) mod 3, and stops once round >= 64
    and E's LAST byte <= round - 32.  Returns the first 32 bytes."""
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _cbc_encrypt_fast(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[
            sum(e[:16]) % 3
        ](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _hash_r5(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """The deprecated R 5 hash (Adobe Extension Level 3): one SHA-256."""
    return hashlib.sha256(password + salt + udata).digest()


def _v5_password(password: bytes) -> bytes:
    """§7.6.4.3.2: UTF-8 password truncated to 127 bytes (SASLprep
    normalization is a no-op for the ASCII passwords fixtures use)."""
    return password[:127]


def _compute_key(
    password: bytes,
    o: bytes,
    p: int,
    id0: bytes,
    r: int,
    n: int,
    encrypt_metadata: bool,
) -> bytes:
    """Algorithm 2 — the file encryption key (n bytes)."""
    h = hashlib.md5(_pad_password(password))
    h.update(o[:32])
    h.update((p & 0xFFFFFFFF).to_bytes(4, "little"))
    h.update(id0)
    if r >= 4 and not encrypt_metadata:
        h.update(b"\xff\xff\xff\xff")
    digest = h.digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest[:n]).digest()
    return digest[:n]


def _compute_o(owner_pw: bytes, user_pw: bytes, r: int, n: int) -> bytes:
    """Algorithm 3 — the /O entry."""
    digest = hashlib.md5(_pad_password(owner_pw or user_pw)).digest()
    if r >= 3:
        for _ in range(50):
            digest = hashlib.md5(digest).digest()
    key = digest[:n]
    o = rc4(key, _pad_password(user_pw))
    if r >= 3:
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in key), o)
    return o


def _compute_u(key: bytes, id0: bytes, r: int) -> bytes:
    """Algorithms 4 (R 2) / 5 (R >= 3) — the /U entry."""
    if r == 2:
        return rc4(key, PAD)
    u = hashlib.md5(PAD + id0).digest()
    u = rc4(key, u)
    for i in range(1, 20):
        u = rc4(bytes(b ^ i for b in key), u)
    return u + b"\x00" * 16


_CFM_METHODS = {"Identity": "identity", "V2": "rc4", "AESV2": "aes"}


class StandardSecurityHandler:
    """Authenticated /Filter /Standard handler for one document.

    ``enc`` is the (fully resolved) /Encrypt dictionary with bytes
    values for /O and /U; ``id0`` the first element of the trailer /ID.
    Construction authenticates ``password`` as the USER password
    (Algorithm 6) — the default empty password is the owner-locked case.
    """

    def __init__(
        self, enc: dict, id0: bytes, password: bytes = b"",
        _file_key: bytes | None = None,
    ):
        filt = enc.get("Filter")
        if filt != "Standard":
            raise NotImplementedError(
                f"PDF security handler /Filter {filt!r} unsupported"
            )
        v = int(enc.get("V", 0))
        r = int(enc.get("R", 0))
        self._v5 = v == 5
        if self._v5:
            if r not in (5, 6):
                raise NotImplementedError(
                    f"PDF /Encrypt /V 5 /R {r} unsupported"
                )
            if _file_key is not None:
                # writer fast-path: the fixture generator already holds
                # the key from make_standard_encrypt_dict — skip the
                # (deliberately slow) 2.B re-derivation; every READ
                # still authenticates in full
                self.n, self.key = 32, _file_key
            else:
                self._init_v5(enc, r, password)
            cf = enc.get("CF") or {}
            self.stm_method = self._method(
                cf, enc.get("StmF", "Identity"), v5=True
            )
            self.str_method = self._method(
                cf, enc.get("StrF", "Identity"), v5=True
            )
            return
        if v not in (1, 2, 4) or r not in (2, 3, 4):
            raise NotImplementedError(
                f"PDF /Encrypt /V {v} /R {r} unsupported"
            )
        o = bytes(enc.get("O") or b"")
        u = bytes(enc.get("U") or b"")
        if len(o) < 32 or len(u) < 16:
            raise ValueError("PDF /Encrypt lacks full /O and /U entries")
        p = int(enc.get("P", -1))
        self.n = 5 if v == 1 else int(enc.get("Length", 40)) // 8
        if not 5 <= self.n <= 16:
            raise ValueError(f"bad PDF /Encrypt /Length {self.n * 8}")
        em = bool(enc.get("EncryptMetadata", True))
        self.key = _compute_key(password, o, p, id0, r, self.n, em)
        expect = _compute_u(self.key, id0, r)
        ok = expect[:16] == u[:16] if r >= 3 else expect == u[:32]
        if not ok:
            raise ValueError("PDF password incorrect")
        if v == 4:
            cf = enc.get("CF") or {}
            self.stm_method = self._method(cf, enc.get("StmF", "Identity"))
            self.str_method = self._method(cf, enc.get("StrF", "Identity"))
        else:
            self.stm_method = self.str_method = "rc4"

    def _init_v5(self, enc: dict, r: int, password: bytes) -> None:
        """Algorithms 2.A / 8 / 9 / 13 — authenticate against the
        48-byte /U and /O, unwrap the 256-bit file key from /UE //OE,
        then verify the /Perms integrity entry."""
        u = bytes(enc.get("U") or b"")
        o = bytes(enc.get("O") or b"")
        ue = bytes(enc.get("UE") or b"")
        oe = bytes(enc.get("OE") or b"")
        if len(u) < 48 or len(o) < 48 or len(ue) < 32 or len(oe) < 32:
            raise ValueError("PDF /Encrypt lacks full /U //O //UE //OE")
        pw = _v5_password(password)
        hashf = _hash_2b if r == 6 else _hash_r5
        self.n = 32
        if hashf(pw, u[32:40]) == u[:32]:  # user password (Algorithm 8)
            inter = hashf(pw, u[40:48])
            self.key = _cbc_nopad(inter, b"\x00" * 16, ue[:32], encrypt=False)
        elif hashf(pw, o[32:40], u[:48]) == o[:32]:  # owner (Algorithm 9)
            inter = hashf(pw, o[40:48], u[:48])
            self.key = _cbc_nopad(inter, b"\x00" * 16, oe[:32], encrypt=False)
        else:
            raise ValueError("PDF password incorrect")
        perms = bytes(enc.get("Perms") or b"")
        if len(perms) >= 16:
            dec = _ecb(self.key, perms[:16], encrypt=False)
            if dec[9:12] != b"adb":
                raise ValueError("PDF /Perms integrity check failed")
            p = int(enc.get("P", -1)) & 0xFFFFFFFF
            if int.from_bytes(dec[:4], "little") != p:
                raise ValueError("PDF /Perms does not match /P")

    @staticmethod
    def _method(cf: dict, name, v5: bool = False) -> str:
        if name == "Identity":
            return "identity"
        cfd = cf.get(str(name))
        if not isinstance(cfd, dict):
            raise ValueError(f"PDF crypt filter {name!r} missing from /CF")
        cfm = str(cfd.get("CFM"))
        if v5:
            # /V 5 admits only Identity and AESV3 (§7.6.4.2)
            if cfm != "AESV3":
                raise NotImplementedError(
                    f"PDF crypt filter /CFM {cfm!r} unsupported under /V 5"
                )
            return "aes"
        method = _CFM_METHODS.get(cfm)
        if method is None:
            raise NotImplementedError(
                f"PDF crypt filter /CFM {cfm!r} unsupported"
            )
        return method

    def _object_key(self, num: int, gen: int, aes: bool) -> bytes:
        """Algorithm 1 — the per-object key.  /V 5 defines no per-object
        rekey: AESV3 uses the file key directly."""
        if self._v5:
            return self.key
        h = hashlib.md5(
            self.key
            + (num & 0xFFFFFF).to_bytes(3, "little")
            + (gen & 0xFFFF).to_bytes(2, "little")
        )
        if aes:
            h.update(b"sAlT")
        return h.digest()[: min(self.n + 5, 16)]

    def _apply(self, method: str, data: bytes, num: int, gen: int,
               encrypt: bool) -> bytes:
        if method == "identity":
            return data
        if method == "rc4":
            return rc4(self._object_key(num, gen, aes=False), data)
        key = self._object_key(num, gen, aes=True)
        if encrypt:
            # deterministic IV: fixtures must be byte-reproducible (the
            # registry oracle hashes them); uniqueness per object comes
            # from the per-object key (V <= 4) or, under /V 5 where the
            # file key is constant, from folding (num, gen) into the IV
            salt = (
                (num & 0xFFFFFF).to_bytes(3, "little")
                + (gen & 0xFFFF).to_bytes(2, "little")
                if self._v5
                else b""
            )
            iv = hashlib.md5(key + salt + b"iv").digest()
            return aes_cbc_encrypt(key, iv, data)
        return aes_cbc_decrypt(key, data)

    def decrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_method, data, num, gen, encrypt=False)

    def decrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_method, data, num, gen, encrypt=False)

    def encrypt_stream(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.stm_method, data, num, gen, encrypt=True)

    def encrypt_string(self, data: bytes, num: int, gen: int) -> bytes:
        return self._apply(self.str_method, data, num, gen, encrypt=True)


def make_standard_encrypt_dict(
    mode: str,
    id0: bytes,
    owner_pw: bytes = b"owner",
    user_pw: bytes = b"",
    p: int = -3904,
) -> tuple[dict, bytes]:
    """Writer-side: build the /Encrypt dictionary values for ``mode``
    ("rc4-40" → V1/R2, "rc4-128" → V2/R3, "aes-128" → V4/R4 AESV2,
    "aes-256" → V5/R6 AESV3, "aes-256-r5" → V5/R5) and return
    (enc_dict, file_key).  The dict uses plain Python values (bytes for
    /O //U //OE //UE //Perms); serialization is the caller's concern.
    All salts and the V5 file key derive deterministically from ``id0``
    so fixtures stay byte-reproducible."""
    if mode in ("aes-256", "aes-256-r5"):
        r = 6 if mode == "aes-256" else 5
        hashf = _hash_2b if r == 6 else _hash_r5
        upw = _v5_password(user_pw)
        opw = _v5_password(owner_pw)
        seed = hashlib.sha256(id0 + b"|pdf-v5|" + mode.encode()).digest()
        file_key = hashlib.sha256(seed + b"filekey").digest()
        vs_u, ks_u = seed[:8], seed[8:16]
        vs_o, ks_o = seed[16:24], seed[24:32]
        u = hashf(upw, vs_u) + vs_u + ks_u
        ue = _cbc_nopad(
            hashf(upw, ks_u), b"\x00" * 16, file_key, encrypt=True
        )
        o = hashf(opw, vs_o, u) + vs_o + ks_o
        oe = _cbc_nopad(
            hashf(opw, ks_o, u), b"\x00" * 16, file_key, encrypt=True
        )
        perms_plain = (
            (p & 0xFFFFFFFF).to_bytes(4, "little")
            + b"\xff\xff\xff\xff"
            + b"T"  # /EncryptMetadata true
            + b"adb"
            + seed[:4]
        )
        perms = _ecb(file_key, perms_plain, encrypt=True)
        enc: dict = {
            "Filter": "Standard",
            "V": 5,
            "R": r,
            "Length": 256,
            "O": o,
            "U": u,
            "OE": oe,
            "UE": ue,
            "Perms": perms,
            "P": p,
            "CF": {
                "StdCF": {
                    "CFM": "AESV3",
                    "AuthEvent": "DocOpen",
                    "Length": 32,
                }
            },
            "StmF": "StdCF",
            "StrF": "StdCF",
        }
        return enc, file_key
    if mode == "rc4-40":
        v, r, length = 1, 2, 40
    elif mode == "rc4-128":
        v, r, length = 2, 3, 128
    elif mode == "aes-128":
        v, r, length = 4, 4, 128
    else:
        raise ValueError(f"unknown PDF encryption mode {mode!r}")
    n = length // 8
    o = _compute_o(owner_pw, user_pw, r, n)
    key = _compute_key(user_pw, o, p, id0, r, n, True)
    u = _compute_u(key, id0, r)
    enc: dict = {
        "Filter": "Standard",
        "V": v,
        "R": r,
        "Length": length,
        "O": o,
        "U": u,
        "P": p,
    }
    if v == 4:
        enc["CF"] = {
            "StdCF": {"CFM": "AESV2", "AuthEvent": "DocOpen", "Length": 16}
        }
        enc["StmF"] = "StdCF"
        enc["StrF"] = "StdCF"
    return enc, key
