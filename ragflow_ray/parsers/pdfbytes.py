"""Minimal from-scratch PDF text-layer extraction.

The reference's "Plain Text" pdf path delegates to pypdf
``extract_text`` (deepdoc/parser/pdf_parser.py:1243-1269); no PDF
library exists in this container, so this module implements the
subset needed to ingest real PDF bytes into the plain extraction
path:

* object scan (``N G obj … endobj``) with stream extraction;
* FlateDecode (zlib) — the compression virtually every text PDF uses;
* page discovery via the /Root → /Pages → /Kids tree (object-order
  fallback) and /Contents resolution (single ref or array);
* a content-stream tokenizer covering the text operators: BT/ET,
  Tj / ' / " / TJ (string shows), Td / TD / T* / Tm (line motion);
* literal-string unescaping and hex strings.

* CID/Type0 composite fonts via /ToUnicode CMaps: page /Resources
  /Font entries resolve to font objects, ``beginbfchar`` /
  ``beginbfrange`` sections map 2-byte (Type0) or 1-byte codes to
  UTF-16BE text, and the content-stream ``Tf`` operator switches the
  active mapping (the reference gets this from pypdf,
  deepdoc/parser/pdf_parser.py:1243-1269).

* PDF 1.5+ compressed object streams (``/Type /ObjStm``): every
  object stream discovered is inflated and its packed objects (N
  pairs of "objnum offset" then bodies at /First) are added to the
  object table — so documents whose catalog / page dicts / fonts live
  in object streams (the modern-producer default) extract normally.
  Indirect ``/Length N 0 R`` values resolve through the object table.

* object discovery is xref-DRIVEN when the file's cross-reference
  chain is well-formed — classic tables, /Type /XRef binary streams
  (W-field rows, /Index subsections, /Prev chains) and hybrid
  /XRefStm files all resolve to per-object offsets, making discovery
  O(objects) instead of an O(file-bytes) scan (the per-doc tax that
  matters at corpus scale).  Any inconsistency (mislocated offset,
  wrong object number at an offset) abandons the route and the
  sequential scan takes over — speed from the xref, correctness from
  the scan.

* embedded DCTDecode figures: /Subtype /Image XObjects whose stream
  is a plain JPEG are surfaced as media payload rows (SOF-header
  dimensions + container bytes) via :func:`pdf_image_payloads`, and
  ride inside page payloads for downstream phash/feature stages —
  the reference crops figure pixels through pdfplumber instead
  (deepdoc/parser/pdf_parser.py:856-866, 1006-1034).

Stream filters: FlateDecode, LZWDecode, ASCII85Decode,
ASCIIHexDecode, and ordered chains of them; /DecodeParms /Predictor
post-processing (TIFF 2 and PNG 10–15) on the compression filters.

Encrypted documents: the standard security handler with an EMPTY
user password — the common "owner-locked" PDF — decrypts
transparently (file key from /O, /P, /ID per Algorithm 2, verified
against /U).  RC4 (V∈{1,2}, R∈{2,3}), crypt-filter documents
(V=4, R=4) with /CFM /V2 (RC4) or /CFM /AESV2 (AES-128-CBC), and
AESV3 (V=5, R∈{5,6}: AES-256-CBC under the /UE-unwrapped file key,
R6's Algorithm 2.B iterated-hash KDF) are all in subset.  The AES
cipher is from-scratch FIPS-197 — the S-box is derived from the
GF(2^8) field construction, 128- and 256-bit key schedules — pinned
to the spec's Appendix B/C.1/C.3 known-answer vectors in
test_pdfbytes; real user passwords stay out (they degrade to skipped
strings, never crash).

Deliberately out of scope (documented subset, not a stub): JPX pixel
decode (JPEG 2000 containers are extracted whole, not decompressed;
baseline-JPEG DCTDecode payloads DO decode to pixels downstream via
``parsers/jpegdec``, and Flate/unfiltered 8-bit DeviceGray/DeviceRGB
images decompress here into a raw pixel container) — bytes outside
the subset degrade to skipped
show-strings, never to a crash.  Good enough to
round-trip every text PDF this engine writes in its own tests, the
common single-byte-font documents, Identity-H CID PDFs carrying
ToUnicode maps, object-stream-packed PDF 1.5 files, and RC4/AES
owner-locked documents (the dominant real-world text-PDF forms).
"""

from __future__ import annotations

import re
import zlib

_OBJ_START = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_START = re.compile(rb"stream\r?\n")
# (?![0-9]) stops backtracking from shaving digits off an indirect
# "/Length 10 0 R" until the not-a-ref lookahead succeeds ("1" + "0 0 R")
_LENGTH = re.compile(rb"/Length\s+(\d+)(?![0-9])(?!\s+\d+\s+R)")
# every name following /Filter (single name or array) in order
_FILTER_CHAIN = re.compile(rb"/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)")
_FILTER_NAME = re.compile(rb"/([A-Za-z0-9]+)")
_PAGE_TYPE = re.compile(rb"/Type\s*/Page(?![s/\w])")
_CONTENTS_REF = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR = re.compile(rb"/Contents\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")
_REF = re.compile(rb"(\d+)\s+\d+\s+R")
_ROOT = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_REF = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS = re.compile(rb"/Kids\s*\[((?:\s*\d+\s+\d+\s+R)+)\s*\]")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}

# -- Type0 / ToUnicode support ---------------------------------------------

_RESOURCES_REF = re.compile(rb"/Resources\s+(\d+)\s+\d+\s+R")
_FONT_DICT_REF = re.compile(rb"/Font\s+(\d+)\s+\d+\s+R")
_FONT_ENTRY = re.compile(rb"/([\w.+-]+)\s+(\d+)\s+\d+\s+R")
_TOUNICODE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_TYPE0 = re.compile(rb"/Subtype\s*/Type0")
_PARENT = re.compile(rb"/Parent\s+(\d+)\s+\d+\s+R")
_BFCHAR = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_CMAP_TOK = re.compile(rb"<[0-9A-Fa-f]+>|\[|\]")


def _balanced_dict(data: bytes, start: int) -> bytes:
    """The bytes of a ``<< ... >>`` dict starting at ``start``."""
    depth, i, n = 0, start, len(data)
    while i < n - 1:
        two = data[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
            continue
        if two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
            continue
        i += 1
    return data[start:]


def _u16(hx: bytes) -> str:
    """UTF-16BE text of a CMap hex destination (odd-length → '')."""
    try:
        b = bytes.fromhex(hx.decode())
        return b.decode("utf-16-be")
    except (ValueError, UnicodeDecodeError):
        return ""


def _parse_cmap(stream: bytes) -> dict[int, str]:
    """/ToUnicode CMap → {code: text} (bfchar + bfrange sections)."""
    cmap: dict[int, str] = {}
    for m in _BFCHAR.finditer(stream):
        toks = _CMAP_TOK.findall(m.group(1))
        hexes = [t for t in toks if t.startswith(b"<")]
        for i in range(0, len(hexes) - 1, 2):
            try:
                cmap[int(hexes[i][1:-1], 16)] = _u16(hexes[i + 1][1:-1])
            except ValueError:
                continue
    for m in _BFRANGE.finditer(stream):
        toks = _CMAP_TOK.findall(m.group(1))
        j = 0
        while j + 2 < len(toks) + 1 and j + 1 < len(toks):
            lo_t, hi_t = toks[j], toks[j + 1]
            if not (lo_t.startswith(b"<") and hi_t.startswith(b"<")):
                j += 1
                continue
            try:
                lo = int(lo_t[1:-1], 16)
                hi = int(hi_t[1:-1], 16)
            except ValueError:
                j += 2
                continue
            if j + 2 >= len(toks):
                break
            if toks[j + 2] == b"[":
                k, code = j + 3, lo
                while k < len(toks) and toks[k] != b"]":
                    if code <= hi and toks[k].startswith(b"<"):
                        cmap[code] = _u16(toks[k][1:-1])
                        code += 1
                    k += 1
                j = k + 1
            else:
                base = _u16(toks[j + 2][1:-1])
                if base:
                    head, last = base[:-1], ord(base[-1])
                    for c in range(lo, min(hi, lo + 0xFFFF) + 1):
                        cp = last + (c - lo)
                        if cp > 0x10FFFF:  # malformed range end: skip,
                            break          # never crash (module contract)
                        if 0xD800 <= cp <= 0xDFFF:
                            # a lone surrogate poisons Arrow/JSON far
                            # downstream — skip the code, keep the range
                            continue
                        cmap[c] = head + chr(cp)
                j += 3
    return cmap


def _page_fonts(body: bytes, objs: dict[int, bytes], depth: int = 0) -> dict:
    """Font name → (cmap, code byte-width) for fonts carrying a
    /ToUnicode map (resources inline or by ref; /Parent inheritance)."""
    if depth > 4:
        return {}
    res = None
    m = re.search(rb"/Resources\s*<<", body)
    if m:
        res = _balanced_dict(body, m.end() - 2)
    else:
        m = _RESOURCES_REF.search(body)
        if m:
            res = objs.get(int(m.group(1)), b"")
    if res is None:
        pm = _PARENT.search(body)
        if pm:
            return _page_fonts(objs.get(int(pm.group(1)), b""), objs, depth + 1)
        return {}
    fm = re.search(rb"/Font\s*<<", res)
    if fm:
        fdict = _balanced_dict(res, fm.end() - 2)
    else:
        fm = _FONT_DICT_REF.search(res)
        fdict = objs.get(int(fm.group(1)), b"") if fm else b""
    fonts: dict[str, tuple[dict[int, str], int]] = {}
    for em in _FONT_ENTRY.finditer(fdict):
        fobj = objs.get(int(em.group(2)), b"")
        tm = _TOUNICODE.search(fobj)
        if not tm:
            continue
        stream = _stream_of(objs.get(int(tm.group(1)), b""), objs)
        if stream is None:
            continue
        cmap = _parse_cmap(stream)
        if cmap:
            nbytes = 2 if _TYPE0.search(fobj) else 1
            fonts[em.group(1).decode("latin-1")] = (cmap, nbytes)
    return fonts


def _object_parse(data: bytes, m: "re.Match") -> tuple[int, bytes, int]:
    """Body + end offset of the object whose ``N G obj`` header is the
    match ``m``.  Stream bodies are skipped by their declared /Length,
    never searched — compressed bytes can contain
    ``endobj``/``endstream`` byte runs by chance, so a pure-regex scan
    would truncate objects mid-stream."""
    start = m.end()
    sm = _STREAM_START.search(data, start)
    em = data.find(b"endobj", start)
    if sm is not None and (em == -1 or sm.start() < em):
        header = data[start : sm.start()]
        lm = _LENGTH.search(header)
        after = sm.end() + int(lm.group(1)) if lm else sm.end()
        es = data.find(b"endstream", after)
        if es == -1:
            es = data.find(b"endstream", sm.end())
        obj_end = data.find(b"endobj", es if es != -1 else after)
    else:
        obj_end = em
    if obj_end == -1:
        obj_end = len(data)
    return int(m.group(1)), data[start:obj_end], obj_end + len(b"endobj")


def _object_at(data: bytes, off: int) -> tuple[int, bytes] | None:
    """Parse the object whose header starts at (or within a few bytes
    of) byte ``off`` — the xref-offset entry point.  Strict: a
    mislocated offset returns None so the caller can fall back to the
    sequential scan wholesale."""
    m = _OBJ_START.search(data, max(0, off))
    if not m or m.start() > off + 8:
        return None
    num, body, _end = _object_parse(data, m)
    return num, body


def _objects_scan(data: bytes) -> dict[int, bytes]:
    """Sequential whole-file object scan — the O(file) fallback for
    files whose xref is missing or lies."""
    objs: dict[int, bytes] = {}
    pos = 0
    while True:
        m = _OBJ_START.search(data, pos)
        if not m:
            break
        num, body, pos = _object_parse(data, m)
        objs[num] = body
    return objs


# --- xref-driven object discovery (PDF 32000-1 §7.5.4 / §7.5.8) ----------
#
# O(objects) instead of O(file bytes): follow startxref to the newest
# section, collect type-1 (direct-offset) entries, chase /Prev (and
# hybrid /XRefStm) links newest-first so updated objects win, then
# parse each object AT its recorded offset.  Type-2 (packed-in-ObjStm)
# entries need no handling here — their container streams have their
# own type-1 entries and _expand_object_streams unpacks them.  Any
# inconsistency (bad offset, wrong object number at an offset, short
# xref stream) abandons the route entirely: correctness comes from the
# scan, speed from the xref.

_XREF_W = re.compile(rb"/W\s*\[\s*(\d+)\s+(\d+)\s+(\d+)\s*\]")
_XREF_INDEX = re.compile(rb"/Index\s*\[([0-9\s]+)\]")
_XREF_SIZE = re.compile(rb"/Size\s+(\d+)")
_XREF_PREV = re.compile(rb"/Prev\s+(\d+)(?![0-9])")
_XREF_STM = re.compile(rb"/XRefStm\s+(\d+)(?![0-9])")
_XREF_TYPE = re.compile(rb"/Type\s*/XRef\b")
_CLASSIC_ENTRY = re.compile(rb"(\d{10})\s+(\d{5})\s+([nf])")
_WS = b" \t\r\n"


def _xref_stream_offsets(data: bytes, xoff: int,
                         offsets: dict[int, int]) -> tuple[int, int] | None:
    """Read one /Type /XRef stream section at ``xoff`` into
    ``offsets`` (setdefault: newest wins); → (/Prev or -1, /Size or -1).

    Every entry type claims its object number so newer sections shadow
    older ones: type-1 records the offset, type-0 (free) records a -1
    tombstone (an object deleted in a newer update must not resurrect
    from an older section's offset), type-2 (packed in an ObjStm)
    records a -2 claim (the body comes from _expand_object_streams —
    without the claim a stale direct body from an OLDER section would
    win the expansion's setdefault)."""
    parsed = _object_at(data, xoff)
    if parsed is None:
        return None
    _num, body = parsed
    if not _XREF_TYPE.search(body):
        return None
    stream = _stream_of(body, None)
    wm = _XREF_W.search(body)
    if stream is None or wm is None:
        return None
    w1, w2, w3 = (int(g) for g in wm.groups())
    rowlen = w1 + w2 + w3
    sm = _XREF_SIZE.search(body)
    im = _XREF_INDEX.search(body)
    if im:
        nums = [int(x) for x in im.group(1).split()]
        index = list(zip(nums[0::2], nums[1::2]))
    elif sm:
        index = [(0, int(sm.group(1)))]
    else:
        return None
    pos = 0
    for first, count in index:
        for onum in range(first, first + count):
            row = stream[pos : pos + rowlen]
            pos += rowlen
            if len(row) < rowlen:
                return None
            etype = int.from_bytes(row[:w1], "big") if w1 else 1
            field2 = int.from_bytes(row[w1 : w1 + w2], "big")
            if etype == 1 and field2 > 0:
                offsets.setdefault(onum, field2)
            elif etype == 0:
                offsets.setdefault(onum, -1)
            elif etype == 2:
                offsets.setdefault(onum, -2)
    pm = _XREF_PREV.search(body)
    return (int(pm.group(1)) if pm else -1,
            int(sm.group(1)) if sm else -1)


def _classic_xref_offsets(data: bytes, xoff: int,
                          offsets: dict[int, int]) -> tuple[int, int, int] | None:
    """Read one classic ``xref`` table section; → (/Prev or -1,
    /XRefStm or -1, /Size or -1).  Free ('f') entries record a -1
    tombstone so an object deleted in a newer incremental section is
    not resurrected from an older section's in-use offset."""
    k = xoff + 4  # past b"xref"
    while True:
        while k < len(data) and data[k : k + 1] in _WS:
            k += 1
        if data[k : k + 7] == b"trailer":
            t_end = data.find(b">>", k)
            trailer = data[k : t_end + 2] if t_end != -1 else data[k : k + 512]
            pm = _XREF_PREV.search(trailer)
            xm = _XREF_STM.search(trailer)
            zm = _XREF_SIZE.search(trailer)
            return (int(pm.group(1)) if pm else -1,
                    int(xm.group(1)) if xm else -1,
                    int(zm.group(1)) if zm else -1)
        sm = re.match(rb"(\d+)\s+(\d+)", data[k : k + 40])
        if not sm:
            return None
        first, count = int(sm.group(1)), int(sm.group(2))
        k += sm.end()
        for onum in range(first, first + count):
            while k < len(data) and data[k : k + 1] in _WS:
                k += 1
            em = _CLASSIC_ENTRY.match(data, k)
            if not em:
                return None
            k = em.end()
            if em.group(3) == b"n":
                off = int(em.group(1))
                if off > 0:
                    offsets.setdefault(onum, off)
            else:
                offsets.setdefault(onum, -1)


def _xref_offsets(data: bytes) -> tuple[dict[int, int], int] | None:
    """→ (object-number → offset/-1 tombstone/-2 ObjStm claim, newest
    trailer's /Size or -1)."""
    i = data.rfind(b"startxref")
    if i == -1:
        return None
    m = re.match(rb"startxref\s+(\d+)", data[i : i + 64])
    if not m:
        return None
    offsets: dict[int, int] = {}
    size = -1
    seen: set[int] = set()
    work = [int(m.group(1))]
    while work:
        xoff = work.pop()
        if xoff in seen or not 0 <= xoff < len(data):
            continue
        seen.add(xoff)
        j = xoff
        while j < len(data) and data[j : j + 1] in _WS:
            j += 1
        if data[j : j + 4] == b"xref":
            res = _classic_xref_offsets(data, j, offsets)
            if res is None:
                return None
            prev, xstm, sec_size = res
            # hybrid /XRefStm entries outrank the NEXT-older section
            # but not this one — push prev first (popped last)
            if prev >= 0:
                work.append(prev)
            if xstm >= 0:
                work.append(xstm)
        else:
            res = _xref_stream_offsets(data, xoff, offsets)
            if res is None:
                return None
            prev, sec_size = res
            if prev >= 0:
                work.append(prev)
        if size < 0 <= sec_size:
            size = sec_size  # first section seen = newest
    return (offsets, size) if offsets else None


def _objects_from_xref(data: bytes) -> dict[int, bytes] | None:
    res = _xref_offsets(data)
    if res is None:
        return None
    offsets, size = res
    # chain-completeness check: the newest trailer's /Size is one more
    # than the highest object number, so a well-formed chain accounts
    # for every number below it (free, direct or ObjStm-packed).  An
    # incomplete chain (e.g. a missing /Prev) silently recovers a
    # SUBSET of the objects the scan would find — detect the shortfall
    # and abandon the route instead of degrading extraction.
    if size > 0 and len(offsets) < size - (0 if 0 in offsets else 1):
        return None
    objs: dict[int, bytes] = {}
    for onum in sorted(offsets):
        off = offsets[onum]
        if off < 0:
            continue  # -1 free tombstone / -2 ObjStm claim
        parsed = _object_at(data, off)
        if parsed is None or parsed[0] != onum:
            return None  # lying xref: abandon, let the scan decide
        objs[onum] = parsed[1]
    return objs


def _objects(data: bytes) -> dict[int, bytes]:
    """Object discovery: xref-driven O(objects) when the file's xref
    chain is well-formed (classic tables, xref streams, hybrids),
    sequential O(file) scan otherwise."""
    try:
        objs = _objects_from_xref(data)
    except Exception:  # noqa: BLE001 — any malformed xref → scan
        objs = None
    return objs if objs else _objects_scan(data)


# --- standard security handler (RC4, empty user password) ----------------
#
# PDF 1.7 §7.6.3: V∈{1,2}, R∈{2,3}.  The overwhelmingly common encrypted
# text PDF is "owner-locked": an owner password restricts editing but the
# USER password is empty, so any reader may decrypt.  Algorithm 2 derives
# the file key from the padded empty password + /O + /P + file /ID;
# Algorithm 4/5 verifies it against /U (on mismatch — a real user
# password — the document stays undecrypted and degrades to skipped
# strings, per the module's no-crash contract).  RC4 is length-preserving,
# so stream bytes decrypt IN PLACE and every offset//Length stays valid.

_PASSWORD_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])
_ENCRYPT_REF = re.compile(rb"/Encrypt\s+(\d+)\s+\d+\s+R")
_ID_HEX = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>")
_ID_LIT = re.compile(rb"/ID\s*\[\s*\(((?:[^()\\]|\\.)*)\)")
_ENC_INT = {
    # the (?!…R) lookahead keeps an indirect "/Length 7 0 R" from
    # reading as 7 — unresolvable refs fall back to the key's default
    k: re.compile(rb"/" + k.encode() + rb"\s+(-?\d+)(?![0-9])(?!\s+\d+\s+R)")
    for k in ("V", "R", "P", "Length")
}
_ENC_STR = {
    k: (re.compile(rb"/" + k.encode() + rb"\s*\(((?:[^()\\]|\\.)*)\)"),
        re.compile(rb"/" + k.encode() + rb"\s*<([0-9A-Fa-f]+)>"))
    for k in ("O", "U", "UE")
}


def _rc4(key: bytes, data: bytes) -> bytes:
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# --- AES-128 inverse cipher (for /CFM /AESV2 crypt filters) ---------------
#
# From-scratch FIPS-197: the S-box is DERIVED (multiplicative inverse in
# GF(2^8) mod x^8+x^4+x^3+x+1, then the affine map with 0x63), not pasted
# as a table, and the whole cipher is pinned to the spec's Appendix B/C.1
# known-answer vectors in test_pdfbytes.  Decrypt-only: the parser never
# encrypts; the test fixture carries its own independent forward cipher.


def _gf_mul(a: int, b: int) -> int:
    r = 0
    for _ in range(8):
        if b & 1:
            r ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return r


def _make_aes_boxes() -> tuple[list[int], list[int]]:
    sbox = [0] * 256
    for x in range(256):
        if x == 0:
            inv = 0
        else:  # inverse by exponentiation: x^254 = x^-1 in GF(2^8)*
            inv, p, e = 1, x, 254
            while e:
                if e & 1:
                    inv = _gf_mul(inv, p)
                p = _gf_mul(p, p)
                e >>= 1
        y = 0
        for i in range(8):
            bit = (
                (inv >> i) ^ (inv >> ((i + 4) % 8)) ^ (inv >> ((i + 5) % 8))
                ^ (inv >> ((i + 6) % 8)) ^ (inv >> ((i + 7) % 8)) ^ (0x63 >> i)
            ) & 1
            y |= bit << i
        sbox[x] = y
    inv_sbox = [0] * 256
    for i, v in enumerate(sbox):
        inv_sbox[v] = i
    return sbox, inv_sbox


_AES_SBOX, _AES_INV_SBOX = _make_aes_boxes()
# InvMixColumns coefficients as 256-entry product tables: the naive
# per-byte _gf_mul is 576 interpreted 8-step loops per block — table
# lookups make bulk stream decryption ~10x cheaper
_MUL = {c: [_gf_mul(x, c) for x in range(256)] for c in (9, 11, 13, 14)}
_INV_MIX = (14, 11, 13, 9)  # InvMixColumns matrix first row, rotated per row


def _aes_key_schedule(key: bytes) -> list[list[int]]:
    """128- or 256-bit key → Nr+1 round keys (11 or 15), each a flat
    16-int column-major state.  FIPS-197 §5.2: Nk=8 adds a plain
    SubWord (no rotate/rcon) at ``i % Nk == 4``."""
    nk = len(key) // 4  # 4 (AES-128) or 8 (AES-256)
    nr = nk + 6
    w = [list(key[i : i + 4]) for i in range(0, len(key), 4)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_AES_SBOX[t[1]], _AES_SBOX[t[2]], _AES_SBOX[t[3]], _AES_SBOX[t[0]]]
            t[0] ^= rcon
            rcon = _gf_mul(rcon, 2)
        elif nk > 6 and i % nk == 4:
            t = [_AES_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return [sum((w[4 * r + c] for c in range(4)), []) for r in range(nr + 1)]


def _aes_decrypt_block(ks: list[list[int]], block: bytes) -> bytes:
    nr = len(ks) - 1
    s = [a ^ b for a, b in zip(block, ks[nr])]
    for rnd in range(nr - 1, -1, -1):
        # InvShiftRows: row r rotates right by r (flat index = 4*col + row)
        s = [s[4 * (((i // 4) - (i % 4)) % 4) + (i % 4)] for i in range(16)]
        s = [_AES_INV_SBOX[b] for b in s]
        s = [a ^ b for a, b in zip(s, ks[rnd])]
        if rnd == 0:
            break
        ns = [0] * 16
        for c in range(0, 16, 4):
            col = s[c : c + 4]
            for r in range(4):
                ns[c + r] = (
                    _MUL[_INV_MIX[-r % 4]][col[0]]
                    ^ _MUL[_INV_MIX[(1 - r) % 4]][col[1]]
                    ^ _MUL[_INV_MIX[(2 - r) % 4]][col[2]]
                    ^ _MUL[_INV_MIX[(3 - r) % 4]][col[3]]
                )
        s = ns
    return bytes(s)


# forward cipher — needed ONLY by the R6 password hash (Algorithm
# 2.B runs AES-128-CBC *encryption* inside the KDF); object/stream
# decryption never encrypts
_MIX = (2, 3, 1, 1)  # MixColumns matrix first row, rotated per row
_MUL_FWD = {c: [_gf_mul(x, c) for x in range(256)] for c in (2, 3)}
_MUL_FWD[1] = list(range(256))


def _aes_encrypt_block(ks: list[list[int]], block: bytes) -> bytes:
    nr = len(ks) - 1
    s = [a ^ b for a, b in zip(block, ks[0])]
    for rnd in range(1, nr + 1):
        s = [_AES_SBOX[b] for b in s]
        # ShiftRows: row r rotates LEFT by r (flat index = 4*col + row)
        s = [s[4 * (((i // 4) + (i % 4)) % 4) + (i % 4)] for i in range(16)]
        if rnd < nr:
            ns = [0] * 16
            for c in range(0, 16, 4):
                col = s[c : c + 4]
                for r in range(4):
                    ns[c + r] = (
                        _MUL_FWD[_MIX[-r % 4]][col[0]]
                        ^ _MUL_FWD[_MIX[(1 - r) % 4]][col[1]]
                        ^ _MUL_FWD[_MIX[(2 - r) % 4]][col[2]]
                        ^ _MUL_FWD[_MIX[(3 - r) % 4]][col[3]]
                    )
            s = ns
        s = [a ^ b for a, b in zip(s, ks[rnd])]
    return bytes(s)


def _aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC encryption, no padding, no IV prefix (Algorithm 2.B's
    KDF shape; ``data`` is always a 16-multiple there)."""
    ks = _aes_key_schedule(key)
    prev = iv
    out = bytearray()
    for at in range(0, len(data), 16):
        prev = _aes_encrypt_block(
            ks, bytes(a ^ b for a, b in zip(data[at : at + 16], prev)))
        out += prev
    return bytes(out)


def _aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC decryption, no padding, no IV prefix (the /UE unwrap:
    ISO 32000-2 §7.6.4.4.2 decrypts the 32-byte file key with a zero
    IV and no padding)."""
    ks = _aes_key_schedule(key)
    prev = iv
    out = bytearray()
    for at in range(0, len(data), 16):
        blk = data[at : at + 16]
        out += bytes(a ^ b for a, b in zip(_aes_decrypt_block(ks, blk), prev))
        prev = blk
    return bytes(out)


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes | None:
    """PDF AESV2/AESV3 stream layout: 16-byte IV prefix, AES-CBC body
    (key length picks 128 vs 256), PKCS#7 padding.  None for malformed
    input (wrong block multiple or bad padding) so callers degrade
    instead of emitting garbage."""
    if len(data) < 32 or len(data) % 16:
        return None
    ks = _aes_key_schedule(key)
    prev = data[:16]
    out = bytearray()
    for at in range(16, len(data), 16):
        blk = data[at : at + 16]
        out += bytes(a ^ b for a, b in zip(_aes_decrypt_block(ks, blk), prev))
        prev = blk
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytes([pad]) * pad:
        return None
    return bytes(out[:-pad])


def _enc_bytes(body: bytes, key: str) -> bytes | None:
    lit, hexp = _ENC_STR[key]
    m = lit.search(body)
    if m:
        return _unescape_bytes(m.group(1))
    m = hexp.search(body)
    if m:
        hx = m.group(1)
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))
    return None


def _mask_cf_dict(enc: bytes) -> bytes:
    """Drop the /CF << ... >> sub-dictionary (balanced << >> scan) so
    top-level integer lookups can't match crypt-filter-local keys —
    /StdCF carries its own /Length 16 (BYTES), and dict key order is
    writer-dependent, so an unmasked search can read 16 where the
    top-level key-BIT length 128 was meant."""
    m = re.search(rb"/CF\s*<<", enc)
    if m is None:
        return enc
    depth, i = 1, m.end()
    while i < len(enc) and depth:
        if enc[i : i + 2] == b"<<":
            depth, i = depth + 1, i + 2
        elif enc[i : i + 2] == b">>":
            depth, i = depth - 1, i + 2
        else:
            i += 1
    return enc[: m.start()] + enc[i:]


def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 Algorithm 2.B — the R6 password hash: seed SHA-256,
    then rounds of (repeat pwd+K+udata 64x → AES-128-CBC-encrypt with
    K's halves → pick SHA-256/384/512 by the ciphertext head mod 3),
    at least 64 rounds, stopping when the last ciphertext byte is
    ≤ round-32."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    hashers = (hashlib.sha256, hashlib.sha384, hashlib.sha512)
    rnd = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        k = hashers[sum(e[:16]) % 3](e).digest()
        rnd += 1
        if rnd >= 64 and e[-1] <= rnd - 32:
            return k[:32]


def _file_key_v5(enc: bytes, r: int) -> tuple[bytes, str] | None:
    """AESV3 (/V 5, /R 5 or 6) with the empty USER password:
    verify against /U's hash+validation-salt, then unwrap the 32-byte
    file key from /UE with the key-salt intermediate key
    (ISO 32000-2 §7.6.4.4.9/.10 + §7.6.4.4.2)."""
    import hashlib

    u = _enc_bytes(enc, "U")
    ue = _enc_bytes(enc, "UE")
    if u is None or ue is None or len(u) < 48 or len(ue) < 32:
        return None
    vsalt, ksalt = u[32:40], u[40:48]
    if r == 6:
        if _hash_2b(b"", vsalt) != u[:32]:
            return None  # real user password — stay undecrypted
        ik = _hash_2b(b"", ksalt)
    else:  # r == 5 (deprecated Adobe extension: plain SHA-256)
        if hashlib.sha256(vsalt).digest() != u[:32]:
            return None
        ik = hashlib.sha256(ksalt).digest()
    file_key = _aes_cbc_decrypt_nopad(ik, b"\x00" * 16, ue[:32])
    return file_key, "aes5"


def _file_key(enc: bytes, id0: bytes) -> tuple[bytes, str] | None:
    """Algorithm 2 with the empty user password → (key, cipher) where
    cipher is "rc4", "aes" (AESV2, per-object keys) or "aes5" (AESV3,
    the file key used directly); None when the document is outside the
    supported subset or /U verification fails (a real user password)."""
    import hashlib

    enc_top = _mask_cf_dict(enc)

    def num(k: str, default=None):
        m = _ENC_INT[k].search(enc_top)
        return int(m.group(1)) if m else default

    v, r = num("V", 0), num("R", 0)
    if v == 5 and r in (5, 6):
        return _file_key_v5(enc, r)
    if v in (1, 2) and r in (2, 3):
        cipher = "rc4"
    elif v == 4 and r == 4:
        # crypt filters: the stream filter's /CFM picks the cipher
        cm = re.search(rb"/CFM\s*/(\w+)", enc)
        if cm is None or cm.group(1) not in (b"V2", b"AESV2"):
            return None
        cipher = "aes" if cm.group(1) == b"AESV2" else "rc4"
    else:
        return None
    o, u = _enc_bytes(enc, "O"), _enc_bytes(enc, "U")
    if o is None or u is None or num("P") is None:
        return None
    if cipher == "aes":
        n = 16  # AESV2 is 128-bit by definition (PDF 1.7 §7.6.5)
    else:
        n = 5 if r == 2 else max(5, min(16, num("Length", 40 if r < 4 else 128) // 8))
    p = num("P") & 0xFFFFFFFF
    seed = _PASSWORD_PAD + o[:32] + p.to_bytes(4, "little") + id0
    if r == 4 and re.search(rb"/EncryptMetadata\s+false", enc):
        seed += b"\xff\xff\xff\xff"
    h = hashlib.md5(seed).digest()
    if r >= 3:
        for _ in range(50):
            h = hashlib.md5(h[:n]).digest()
    key = h[:n]

    # verify against /U (Algorithm 6; R≥3 compares the first 16 bytes)
    if r == 2:
        expect = _rc4(key, _PASSWORD_PAD)
        ok = u[:32] == expect
    else:
        h2 = hashlib.md5(_PASSWORD_PAD + id0).digest()
        x = _rc4(key, h2)
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = u[:16] == x
    return (key, cipher) if ok else None


def _object_key(file_key: bytes, num: int, aes: bool = False) -> bytes:
    """Algorithm 1 per-object key; AESV2 appends the spec's "sAlT"
    bytes (0x73 0x41 0x6C 0x54) to the MD5 input."""
    import hashlib

    h = hashlib.md5(
        file_key + (num & 0xFFFFFF).to_bytes(3, "little") + b"\x00\x00"
        + (b"sAlT" if aes else b"")
    ).digest()
    return h[: min(len(file_key) + 5, 16)]


def _decrypt_objects(data: bytes, objs: dict[int, bytes]) -> None:
    """Detect /Encrypt, derive the key, and decrypt every stream body
    (generation 0 — the only generation the sequential scan records).
    RC4 is length-preserving and decrypts in place; AESV2 shrinks the
    body (16-byte IV + PKCS#7 pad stripped), so the header's direct
    /Length is patched to the plaintext size.  No-op for unencrypted
    or unsupported documents."""
    em = None
    for em in _ENCRYPT_REF.finditer(data):
        pass  # last trailer wins
    if em is None:
        return
    enc_num = int(em.group(1))
    enc = objs.get(enc_num)
    if enc is None or b"/Standard" not in enc:
        return
    idm = None
    for idm in _ID_HEX.finditer(data):
        pass
    if idm is not None:
        hx = idm.group(1)
        if len(hx) % 2:
            hx += b"0"
        id0 = bytes.fromhex(hx.decode("ascii"))
    else:
        for idm in _ID_LIT.finditer(data):
            pass
        id0 = _unescape_bytes(idm.group(1)) if idm is not None else b""
    derived = _file_key(enc, id0)
    if derived is None:
        return
    key, cipher = derived
    for num, body in list(objs.items()):
        if num == enc_num:
            continue
        m = _STREAM_START.search(body)
        if m is None:
            continue
        header = body[: m.start()]
        lm = _LENGTH.search(header)
        rm = None if lm else _LENGTH_REF.search(header)
        length = int(lm.group(1)) if lm else None
        if length is None and rm is not None:
            # indirect /Length N 0 R: the target is a bare integer object
            tm = re.match(rb"\s*(\d+)\s*$", objs.get(int(rm.group(1)), b""))
            if tm:
                length = int(tm.group(1))
        if length is not None:
            start, end = m.end(), m.end() + length
        else:
            start = m.end()
            end = body.find(b"endstream", start)
            if end == -1:
                end = len(body)
        if cipher == "rc4":
            objs[num] = (
                body[:start]
                + _rc4(_object_key(key, num), body[start:end])
                + body[end:]
            )
            continue
        cipher_bytes = body[start:end]
        if length is None:
            # endstream fallback includes the EOL before the keyword;
            # AES ciphertext is a 16-multiple, so trim at most one EOL
            for trim in (0, 1, 2):
                tail = cipher_bytes[len(cipher_bytes) - trim :]
                if (len(cipher_bytes) - trim) % 16 == 0 and tail in (
                    b"", b"\n", b"\r", b"\r\n"
                ):
                    cipher_bytes = cipher_bytes[: len(cipher_bytes) - trim]
                    break
        # AESV3 uses the 32-byte file key for every object; AESV2
        # derives a per-object key (Algorithm 1 + "sAlT")
        okey = key if cipher == "aes5" else _object_key(key, num, aes=True)
        plain = _aes_cbc_decrypt(okey, cipher_bytes)
        if plain is None:  # malformed ciphertext: leave it, degrade later
            continue
        # AES shrinks the body: point the header's /Length (direct or
        # indirect) at the plaintext size so _stream_of slices correctly
        if lm:
            header = _LENGTH.sub(b"/Length %d" % len(plain), header, count=1)
        elif rm is not None and length is not None:
            header = _LENGTH_REF.sub(
                b"/Length %d" % len(plain), header, count=1
            )
        objs[num] = header + body[m.start() : start] + plain + body[end:]


def _stream_of(body: bytes, objs: dict[int, bytes] | None = None) -> bytes | None:
    m = _STREAM_START.search(body)
    if not m:
        return None
    header = body[: m.start()]
    lm = _LENGTH.search(header)
    length = int(lm.group(1)) if lm else None
    if length is None and objs is not None:
        # indirect /Length N 0 R: the target is a bare integer object
        rm = _LENGTH_REF.search(header)
        if rm:
            tm = re.match(rb"\s*(\d+)\s*$", objs.get(int(rm.group(1)), b""))
            if tm:
                length = int(tm.group(1))
    if length is not None:
        raw = body[m.end() : m.end() + length]
    else:  # no resolvable /Length: fall back to the endstream marker
        end = body.find(b"endstream", m.end())
        raw = body[m.end() : end if end != -1 else len(body)]
        raw = raw.rstrip(b"\r\n")
    return _apply_filters(header, raw)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-style LZW as PDF uses it (PDF 32000-1 §7.4.4): variable
    9–12-bit codes, clear=256, EOD=257, early code-width change."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: bytes | None = None
    width, buf, nbits = 9, 0, 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:  # clear table
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                prev, width = None, 9
                continue
            if code == 257:  # end of data
                return bytes(out)
            if code < len(table) and (code < 256 or table[code]):
                entry = table[code]
            elif prev is not None and code == len(table):
                entry = prev + prev[:1]
            else:  # corrupt code: degrade with what we have
                return bytes(out)
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
            prev = entry
            # early change: width bumps one code BEFORE the table fills
            if len(table) + 1 >= (1 << width) and width < 12:
                width += 1
    return bytes(out)


# scalar '<< … >>' or array '[null << … >>]' spelling (the array form
# is required whenever /Filter is an array); the first dict in the
# array carries the predictor in every real single-compression chain
_DECODEPARMS = re.compile(
    rb"/DecodeParms\s*\[?\s*(?:null\s+)*<<(.*?)>>", re.S
)
_PRED_N = re.compile(rb"/Predictor\s+(\d+)")
_PARM_COLS = re.compile(rb"/Columns\s+(\d+)")
_PARM_COLORS = re.compile(rb"/Colors\s+(\d+)")
_PARM_BPC = re.compile(rb"/BitsPerComponent\s+(\d+)")


def _unpredict(data: bytes, predictor: int, columns: int, colors: int,
               bpc: int) -> bytes | None:
    """Undo /Predictor post-processing on a decompressed stream
    (PDF 32000-1 §7.4.4.4): 2 = TIFF horizontal differencing,
    10–15 = PNG row filters (None/Sub/Up/Average/Paeth, per-row tag
    byte).  Returns None on malformed geometry — caller degrades."""
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if rowlen <= 0:
        return None
    if predictor == 2:
        if bpc != 8:
            return None  # sub-byte TIFF differencing: out of subset
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(r + bpp, r + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    stride = rowlen + 1
    if predictor < 10 or len(data) % stride:
        return None
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(data), stride):
        ft = data[r]
        row = bytearray(data[r + 1 : r + stride])
        if ft == 0:
            pass
        elif ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pr) & 0xFF
        else:
            return None
        out += row
        prev = row
    return bytes(out)


def _apply_filters(header: bytes, raw: bytes) -> bytes | None:
    """Run the /Filter chain in order.  Supported: FlateDecode,
    ASCIIHexDecode, ASCII85Decode, LZWDecode, with /DecodeParms
    /Predictor (TIFF 2 and PNG 10–15) on the compression filters; an
    unknown filter (or a decode error) returns None — the caller skips
    the stream, per the module's degrade-never-crash contract."""
    import base64

    fm = _FILTER_CHAIN.search(header)
    if not fm:
        return raw
    names = [n.decode("latin-1") for n in _FILTER_NAME.findall(fm.group(1))]
    pm = _DECODEPARMS.search(header)
    predictor, columns, colors, bpc = 1, 1, 1, 8
    if pm:
        parms = pm.group(1)
        g = _PRED_N.search(parms)
        predictor = int(g.group(1)) if g else 1
        g = _PARM_COLS.search(parms)
        columns = int(g.group(1)) if g else 1
        g = _PARM_COLORS.search(parms)
        colors = int(g.group(1)) if g else 1
        g = _PARM_BPC.search(parms)
        bpc = int(g.group(1)) if g else 8
    data = raw
    for name in names:
        try:
            if name == "FlateDecode":
                data = zlib.decompress(data)
                if predictor > 1:
                    data = _unpredict(data, predictor, columns, colors, bpc)
                    predictor = 1  # parms apply to one filter
                    if data is None:
                        return None
            elif name == "ASCIIHexDecode":
                eod = data.find(b">")  # '>' is EOD: later bytes ignored
                hx = re.sub(rb"\s", b"", data[: eod if eod != -1 else len(data)])
                if len(hx) % 2:
                    hx += b"0"
                data = bytes.fromhex(hx.decode("ascii"))
            elif name == "ASCII85Decode":
                body85 = data.strip()
                if body85.startswith(b"<~"):
                    body85 = body85[2:]
                if body85.endswith(b"~>"):
                    body85 = body85[:-2]
                data = base64.a85decode(re.sub(rb"\s", b"", body85))
            elif name == "LZWDecode":
                data = _lzw_decode(data)
                if predictor > 1:
                    data = _unpredict(data, predictor, columns, colors, bpc)
                    predictor = 1  # parms apply to one filter
                    if data is None:
                        return None
            else:  # DCTDecode, Crypt... — out of subset
                return None
        except (zlib.error, ValueError, UnicodeDecodeError):
            return None
    return data


_OBJSTM = re.compile(rb"/Type\s*/ObjStm")
_OBJSTM_N = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST = re.compile(rb"/First\s+(\d+)")
_LENGTH_REF = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")


def _expand_object_streams(objs: dict[int, bytes]) -> None:
    """Unpack every ``/Type /ObjStm`` in ``objs`` in place.

    The stream layout (PDF 32000-1 §7.5.7): ``/N`` pairs of
    "objnum offset" integers, then the object bodies starting at
    ``/First``; packed objects carry no ``obj``/``endobj`` wrappers.
    Direct (top-level) definitions win on number collisions."""
    inner: dict[int, bytes] = {}
    for body in list(objs.values()):
        if not _OBJSTM.search(body[:512]):
            continue
        nm = _OBJSTM_N.search(body)
        fm = _OBJSTM_FIRST.search(body)
        data = _stream_of(body, objs)
        if data is None or nm is None or fm is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        try:
            nums = [int(x) for x in data[:first].split()]
        except ValueError:
            continue
        pairs = list(zip(nums[0::2], nums[1::2]))[:n]
        bounds = [off for _, off in pairs] + [len(data) - first]
        for (onum, off), nxt in zip(pairs, bounds[1:]):
            if 0 <= off <= nxt:
                inner.setdefault(onum, data[first + off : first + nxt].strip())
    for k, v in inner.items():
        objs.setdefault(k, v)


def _page_object_order(data: bytes, objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in document order (Kids walk; fallback to
    object-number order of /Type /Page objects)."""
    root_m = _ROOT.search(data)
    if root_m:
        root = objs.get(int(root_m.group(1)), b"")
        pages_m = _PAGES_REF.search(root)
        if pages_m:
            order: list[int] = []

            def walk(num: int, depth: int = 0) -> None:
                if depth > 32:
                    return
                body = objs.get(num, b"")
                if _PAGE_TYPE.search(body):
                    order.append(num)
                    return
                kids = _KIDS.search(body)
                if kids:
                    for ref in _REF.finditer(kids.group(1)):
                        walk(int(ref.group(1)), depth + 1)

            walk(int(pages_m.group(1)))
            if order:
                return order
    return [n for n in sorted(objs) if _PAGE_TYPE.search(objs[n])]


def _content_streams(body: bytes, objs: dict[int, bytes]) -> list[bytes]:
    streams: list[bytes] = []
    arr = _CONTENTS_ARR.search(body)
    refs = (
        [int(r.group(1)) for r in _REF.finditer(arr.group(1))]
        if arr
        else [int(m.group(1)) for m in _CONTENTS_REF.finditer(body)]
    )
    for num in refs:
        s = _stream_of(objs.get(num, b""), objs)
        if s is not None:
            streams.append(s)
    return streams


def _unescape_literal(raw: bytes) -> str:
    return _unescape_bytes(raw).decode("latin-1")


def _unescape_bytes(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c != b"\\":
            out += c
            i += 1
            continue
        nxt = raw[i + 1 : i + 2]
        if nxt in _ESCAPES:
            out += _ESCAPES[nxt]
            i += 2
        elif nxt and nxt in b"01234567":  # octal \ddd (1-3 digits)
            # \8 / \9 are NOT octal — the PDF spec says an unknown
            # escape is the bare character, so leave those to the
            # fall-through branch instead of crashing int(x, 8)
            j = i + 1
            while j < len(raw) and j < i + 4 and raw[j] in b"01234567":
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        elif nxt in (b"\n", b"\r"):  # line continuation
            i += 2
        else:
            out += nxt
            i += 2
    return bytes(out)


def _tokenize(stream: bytes):
    """→ (kind, value) tokens: 'str' (raw bytes), 'arr' (list of raw
    bytes), 'num', 'name', 'op'.  String bytes decode at assembly time
    (latin-1 or the active font's ToUnicode map)."""
    i, n = 0, len(stream)
    while i < n:
        c = stream[i : i + 1]
        if c in b" \t\r\n\x00":
            i += 1
            continue
        if c == b"(":
            depth, j = 1, i + 1
            start = j
            while j < n and depth:
                ch = stream[j : j + 1]
                if ch == b"\\":
                    j += 2
                    continue
                if ch == b"(":
                    depth += 1
                elif ch == b")":
                    depth -= 1
                j += 1
            yield ("str", _unescape_bytes(stream[start : j - 1]))
            i = j
            continue
        if c == b"<" and stream[i + 1 : i + 2] != b"<":
            j = stream.find(b">", i)
            if j < 0:
                break
            hx = re.sub(rb"\s", b"", stream[i + 1 : j])
            if len(hx) % 2:
                hx += b"0"
            try:
                yield ("str", bytes.fromhex(hx.decode()))
            except ValueError:
                pass
            i = j + 1
            continue
        if c == b"<":  # dict <<
            i += 2
            continue
        if c in b">]})":
            i += 1
            continue
        if c == b"[":
            # collect until matching ] at this nesting level (TJ arrays
            # only contain strings and numbers)
            j = i + 1
            parts: list[bytes] = []
            while j < n and stream[j : j + 1] != b"]":
                ch = stream[j : j + 1]
                if ch == b"(":
                    depth, k = 1, j + 1
                    start = k
                    while k < n and depth:
                        cc = stream[k : k + 1]
                        if cc == b"\\":
                            k += 2
                            continue
                        if cc == b"(":
                            depth += 1
                        elif cc == b")":
                            depth -= 1
                        k += 1
                    parts.append(_unescape_bytes(stream[start : k - 1]))
                    j = k
                elif ch == b"<":
                    k = stream.find(b">", j)
                    if k < 0:
                        break
                    hx = re.sub(rb"\s", b"", stream[j + 1 : k])
                    if len(hx) % 2:
                        hx += b"0"
                    try:
                        parts.append(bytes.fromhex(hx.decode()))
                    except ValueError:
                        pass
                    j = k + 1
                else:
                    j += 1
            yield ("arr", parts)
            i = j + 1
            continue
        m = re.match(rb"[-+.0-9]+", stream[i:])
        if m and c in b"-+.0123456789":
            # non-FlateDecode streams reach the tokenizer raw, so a
            # numeric-looking run may be garbage ('1.2.3', '--'):
            # skip it instead of crashing — the module's contract is
            # degrade-to-skipped, never a crash
            try:
                yield ("num", float(m.group()))
            except ValueError:
                pass
            i += len(m.group())
            continue
        m = re.match(rb"[A-Za-z'\"*]+", stream[i:])
        if m:
            yield ("op", m.group().decode("latin-1"))
            i += len(m.group())
            continue
        if c == b"/":
            m = re.match(rb"/[^\s/<>\[\]()]*", stream[i:])
            if m:
                yield ("name", m.group()[1:].decode("latin-1"))
                i += len(m.group())
            else:
                i += 1
            continue
        i += 1


def _page_lines(streams: list[bytes], fonts: dict | None = None) -> list[str]:
    """Assemble show-text runs into lines: Td/TD/T*/Tm/' start a new
    line; Tj/TJ/'/\" append to the current one.  ``fonts`` maps font
    names to (ToUnicode cmap, code byte-width); the ``Tf`` operator
    switches the active decoding."""
    fonts = fonts or {}
    lines: list[str] = []
    current: list[str] = []
    stack: list = []
    active: tuple[dict[int, str], int] | None = None

    def decode(raw: bytes) -> str:
        if active is None:
            return raw.decode("latin-1")
        cmap, nb = active
        out = []
        for k in range(0, len(raw) - nb + 1, nb):
            out.append(cmap.get(int.from_bytes(raw[k : k + nb], "big"), ""))
        return "".join(out)

    def newline() -> None:
        if current:
            text = "".join(current).strip()
            if text:
                lines.append(text)
            current.clear()

    for stream in streams:
        for kind, value in _tokenize(stream):
            if kind in ("str", "arr", "num", "name"):
                stack.append((kind, value))
                continue
            op = value
            if op in ("Td", "TD", "T*", "Tm"):
                newline()
            elif op == "Tf":
                name = next(
                    (v for k, v in reversed(stack) if k == "name"), None
                )
                active = fonts.get(name) if name is not None else None
            elif op == "Tj":
                if stack and stack[-1][0] == "str":
                    current.append(decode(stack[-1][1]))
            elif op in ("'", '"'):
                newline()
                if stack and stack[-1][0] == "str":
                    current.append(decode(stack[-1][1]))
            elif op == "TJ":
                if stack and stack[-1][0] == "arr":
                    current.append("".join(decode(p) for p in stack[-1][1]))
            elif op == "ET":
                newline()
            stack.clear()  # every operator consumes its operands
    newline()
    return lines


def _prepared_objects(blob: bytes) -> dict[int, bytes]:
    objs = _objects(blob)
    _decrypt_objects(blob, objs)
    _expand_object_streams(objs)
    return objs


def pdf_text_lines(blob: bytes, _objs: dict[int, bytes] | None = None
                   ) -> list[list[str]]:
    """→ per-page text-layer lines (pypdf ``extract_text``-shaped)."""
    objs = _objs if _objs is not None else _prepared_objects(blob)
    pages = []
    for num in _page_object_order(blob, objs):
        fonts = _page_fonts(objs[num], objs)
        pages.append(_page_lines(_content_streams(objs[num], objs), fonts))
    return pages


# --- embedded raster figures (DCTDecode / JPXDecode / Flate raw) ----------
#
# The reference gets page/figure bitmaps by rasterizing through
# pdfplumber (deepdoc/parser/pdf_parser.py:1006-1034) and crops figure
# regions for downstream vision stages (pdf_parser.py:856-866).  This
# engine extracts the embedded streams themselves: for a
# /Subtype /Image XObject whose filter is DCTDecode/JPXDecode, the
# stream bytes ARE a complete JPEG / JPEG 2000 container — no pixel
# decode is needed to hand a payload to a phash/caption/feature stage,
# and the container header carries the true dimensions.  FlateDecode
# (and unfiltered) 8-bit DeviceGray/DeviceRGB images decompress
# through the shared filter machinery into a self-describing ``raw``
# container that downstream reshapes straight to pixels.

_IMG_SUBTYPE = re.compile(rb"/Subtype\s*/Image\b")
_XOBJ_ENTRY = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_XOBJ_DICT_REF = re.compile(rb"/XObject\s+(\d+)\s+\d+\s+R")
_IMG_W = re.compile(rb"/Width\s+(\d+)")
_IMG_H = re.compile(rb"/Height\s+(\d+)")
_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
     0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def _jpeg_dims(d: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOF segment of a JPEG stream —
    a marker walk, not a decode."""
    if d[:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(d)
    while i + 9 < n:
        if d[i] != 0xFF:
            i += 1
            continue
        marker = d[i + 1]
        if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
            i += 2
            continue
        seglen = int.from_bytes(d[i + 2 : i + 4], "big")
        if marker in _SOF_MARKERS:
            h = int.from_bytes(d[i + 5 : i + 7], "big")
            w = int.from_bytes(d[i + 7 : i + 9], "big")
            return w, h
        i += 2 + seglen
    return None


def _page_image_refs(body: bytes, objs: dict[int, bytes]) -> list[tuple[str, int]]:
    """(name, object number) of every /Subtype /Image XObject a page's
    /Resources references (resources inline or indirect)."""
    res = None
    m = re.search(rb"/Resources\s*<<", body)
    if m:
        res = _balanced_dict(body, m.end() - 2)
    else:
        m = _RESOURCES_REF.search(body)
        if m:
            res = objs.get(int(m.group(1)), b"")
    if not res:
        return []
    xm = re.search(rb"/XObject\s*<<", res)
    if xm:
        xdict = _balanced_dict(res, xm.end() - 2)
    else:
        xm = _XOBJ_DICT_REF.search(res)
        xdict = objs.get(int(xm.group(1)), b"") if xm else b""
    out = []
    for em in _XOBJ_ENTRY.finditer(xdict):
        num = int(em.group(2))
        o = objs.get(num)
        if o is not None and _IMG_SUBTYPE.search(o):
            out.append((em.group(1).decode("latin-1"), num))
    return out


def _jp2_dims(d: bytes) -> tuple[int, int] | None:
    """(width, height) from a JP2 container's ``ihdr`` box (ISO
    15444-1 §I.5.3.1: HEIGHT then WIDTH, 4 bytes each) or, for a raw
    JPEG 2000 codestream, the SIZ marker segment (§A.5.1)."""
    i = d.find(b"ihdr")
    if i != -1 and i + 12 <= len(d):
        h = int.from_bytes(d[i + 4 : i + 8], "big")
        w = int.from_bytes(d[i + 8 : i + 12], "big")
        return w, h
    if d[:4] == b"\xff\x4f\xff\x51" and len(d) >= 24:  # SOC + SIZ
        w = int.from_bytes(d[8:12], "big")   # Xsiz
        h = int.from_bytes(d[12:16], "big")  # Ysiz
        return w, h
    return None


_JP2_MAGIC = b"\x00\x00\x00\x0cjP  \r\n\x87\n"


_IMG_CS = re.compile(rb"/ColorSpace\s*/Device(RGB|Gray)\b")
_IMG_BPC = re.compile(rb"/BitsPerComponent\s+(\d+)")
_RAW_MAGIC = b"RFRAW1:"


def _raw_container(header: bytes, pixels: bytes) -> bytes | None:
    """Wrap decompressed 8-bit DeviceGray/DeviceRGB samples in a tiny
    self-describing container (magic + width/height as 4-byte BE +
    component count) so downstream stages can reshape them without the
    XObject dict.  Returns None unless the declared geometry exactly
    matches the sample count — degrade, never guess."""
    cs = _IMG_CS.search(header)
    bpc = _IMG_BPC.search(header)
    wm = _IMG_W.search(header)
    hm = _IMG_H.search(header)
    if not (cs and wm and hm) or (bpc and int(bpc.group(1)) != 8):
        return None
    ncomp = 3 if cs.group(1) == b"RGB" else 1
    w, h = int(wm.group(1)), int(hm.group(1))
    if w <= 0 or h <= 0 or len(pixels) != w * h * ncomp:
        return None
    return (_RAW_MAGIC + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + bytes([ncomp]) + pixels)


def _raw_dims(d: bytes) -> tuple[int, int] | None:
    if d[: len(_RAW_MAGIC)] != _RAW_MAGIC or len(d) < len(_RAW_MAGIC) + 9:
        return None
    i = len(_RAW_MAGIC)
    return (int.from_bytes(d[i : i + 4], "big"),
            int.from_bytes(d[i + 4 : i + 8], "big"))


def _image_payload(body: bytes, objs: dict[int, bytes]
                   ) -> tuple[bytes, str] | None:
    """(container bytes, codec) of an image stream.  DCTDecode (JPEG)
    and JPXDecode (JPEG 2000) streams are extracted whole — the stream
    bytes ARE a complete container.  FlateDecode (and unfiltered)
    8-bit DeviceGray/DeviceRGB streams decompress through the shared
    filter machinery into a small self-describing ``raw`` container,
    so losslessly-stored figures reach the pixel stages too.  A
    prefixed chain in front of DCT ([/FlateDecode /DCTDecode]), other
    colour spaces / bit depths, or any other encoding returns None —
    degrade, never crash."""
    m = _STREAM_START.search(body)
    if m is None:
        return None
    header = body[: m.start()]
    fm = _FILTER_CHAIN.search(header)
    names = ([n.decode("latin-1") for n in _FILTER_NAME.findall(fm.group(1))]
             if fm else [])
    if names not in (["DCTDecode"], ["JPXDecode"], ["FlateDecode"], []):
        return None
    lm = _LENGTH.search(header)
    if lm is not None:
        raw = body[m.end() : m.end() + int(lm.group(1))]
    else:
        rm = _LENGTH_REF.search(header)
        length = None
        if rm is not None:
            tm = re.match(rb"\s*(\d+)\s*$", objs.get(int(rm.group(1)), b""))
            if tm:
                length = int(tm.group(1))
        if length is not None:
            raw = body[m.end() : m.end() + length]
        else:
            end = body.find(b"endstream", m.end())
            raw = body[m.end() : end if end != -1 else len(body)].rstrip(b"\r\n")
    if names == ["DCTDecode"]:
        return (raw, "jpeg") if raw[:2] == b"\xff\xd8" else None
    if names == ["JPXDecode"]:
        ok = (raw[: len(_JP2_MAGIC)] == _JP2_MAGIC
              or raw[:4] == b"\xff\x4f\xff\x51")
        return (raw, "jp2") if ok else None
    pixels = _apply_filters(header, raw) if names else raw
    if pixels is None:
        return None
    wrapped = _raw_container(header, pixels)
    return (wrapped, "raw") if wrapped is not None else None


def pdf_image_payloads(doc_id: str, blob: bytes,
                       _objs: dict[int, bytes] | None = None) -> list[dict]:
    """Embedded DCTDecode / JPXDecode / Flate-raw figures → media rows
    ``(doc_id, page_no, name, codec, width, height, media_ref,
    payload)`` ready for the multimodal actor stages (phash dedup,
    features).  Dimensions come from the container header (JPEG SOF /
    JP2 ihdr or SIZ / the raw container), falling back to the
    XObject's declared /Width //Height."""
    objs = _objs if _objs is not None else _prepared_objects(blob)
    rows: list[dict] = []
    for pn, num in enumerate(_page_object_order(blob, objs), start=1):
        for name, onum in _page_image_refs(objs[num], objs):
            extracted = _image_payload(objs[onum], objs)
            if extracted is None:
                continue
            payload, codec = extracted
            dims = {"jpeg": _jpeg_dims, "jp2": _jp2_dims,
                    "raw": _raw_dims}[codec](payload)
            wm = _IMG_W.search(objs[onum])
            hm = _IMG_H.search(objs[onum])
            width = dims[0] if dims else (int(wm.group(1)) if wm else 0)
            height = dims[1] if dims else (int(hm.group(1)) if hm else 0)
            rows.append(
                {"doc_id": doc_id, "page_no": pn, "name": name,
                 "codec": codec, "width": width, "height": height,
                 "media_ref": f"crop://{doc_id}/p{pn}/{name}",
                 "payload": payload}
            )
    return rows


def pdf_to_page_payloads(doc_id: str, blob: bytes) -> list[dict]:
    """Real PDF bytes → the engine's page media spans (text-layer
    boxes with synthetic line geometry, no layout regions) for the
    ``layout_mode="plain"`` extraction path.  Embedded DCTDecode
    figures ride along inside the page payload as base64 so a
    downstream media stage can consume them without re-reading the
    PDF bytes (extra payload keys are ignored by page_from_payload)."""
    import base64
    import json

    objs = _prepared_objects(blob)  # parsed ONCE for text + figures
    figures_by_page: dict[int, list[dict]] = {}
    for row in pdf_image_payloads(doc_id, blob, _objs=objs):
        figures_by_page.setdefault(row["page_no"], []).append(
            {"name": row["name"], "codec": row["codec"],
             "width": row["width"], "height": row["height"],
             "media_ref": row["media_ref"],
             "image_b64": base64.b64encode(row["payload"]).decode("ascii")}
        )

    spans = []
    for pn, lines in enumerate(pdf_text_lines(blob, _objs=objs), start=1):
        boxes = [
            {"x0": 40.0, "x1": 572.0, "top": 40.0 + 14.0 * i,
             "bottom": 52.0 + 14.0 * i, "text": line}
            for i, line in enumerate(lines)
        ]
        payload = {"page_no": pn, "width": 612, "height": 792,
                   "boxes": boxes, "layouts": [], "tables": [],
                   "figures": figures_by_page.get(pn, [])}
        spans.append(
            {
                "kind": "media",
                "text": json.dumps(payload),
                "media_ref": f"media://{doc_id}/p{pn}",
                "offset": pn - 1,
            }
        )
    return spans
