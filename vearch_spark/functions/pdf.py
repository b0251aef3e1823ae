"""From-scratch PDF text extraction for LLM training-data pipelines.

A huge share of crawl-derived training text arrives as PDF; the
curation engine needs (a) a structural probe (is it a PDF, how many
pages, is it encrypted) and (b) a text extractor for the simple-text
majority class — content streams drawn with the standard text
operators over standard 8-bit encodings. Both are implemented from
the public PDF 1.7 spec (ISO 32000-1): a classic cross-reference
table parser with /Prev chaining and a sequential-scan fallback, a
recursive page-tree walk, FlateDecode stream decoding via stdlib
zlib, and a content-stream interpreter covering the full text-showing
operator set (Tj, ', ", TJ) with literal-string escapes, nested
parentheses, and hex strings.

Out of scope, rejected TYPED so pipelines can route them: encrypted
documents, xref streams / object streams (PDF 1.5 compression — the
sequential fallback still reads many such files' classic parts),
non-Flate filters, and predictor-coded streams. Embedded-font custom
encodings (Type0/CID) decode as raw bytes — the extractor is exact
for the WinAnsi/ASCII class its own synthesizer emits, which the
``pdf_extract`` oracle pins end-to-end.

The synthesizer ``pdf_bytes`` emits spec-valid PDF 1.4 (real xref
table with byte offsets, page tree, Helvetica Type1 font, optional
FlateDecode, both direct and indirect /Length forms, Tj and TJ-array
text) so foreign viewers open it and the extractor is tested against
real structure, not a private toy format.

Reference parity: vearch ingests only float vectors — this module is
on the LLM-data-pipeline axis (like functions/media.py), not vearch
parity.
"""

from __future__ import annotations

import re
import zlib

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    """An indirect object reference ``N G R``."""

    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Ref({self.num})"


class _Stream:
    """A stream object: its dict plus the raw (still-encoded) bytes."""

    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes):
        self.dict = d
        self.raw = raw


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment runs to EOL
            while i < n and data[i] not in b"\r\n":
                i += 1
        else:
            break
    return i


def _parse_litstr(data: bytes, i: int) -> tuple[bytes, int]:
    """Literal string at data[i] == '(' — balanced-paren nesting and
    the full escape set (ISO 32000-1 §7.3.4.2); raw EOLs normalize
    to \\n."""
    assert data[i] == 0x28
    i += 1
    depth = 1
    out = bytearray()
    n = len(data)
    esc = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            nx = data[i + 1]
            if nx in esc:
                out.append(esc[nx])
                i += 2
            elif nx in b"()\\":
                out.append(nx)
                i += 2
            elif 0x30 <= nx <= 0x37:  # up to 3 octal digits
                j = i + 1
                v = 0
                while j < n and j < i + 4 and 0x30 <= data[j] <= 0x37:
                    v = v * 8 + (data[j] - 0x30)
                    j += 1
                out.append(v & 0xFF)
                i = j
            elif nx in b"\r\n":  # line continuation
                i += 2
                if nx == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # spec: lone backslash is dropped
                out.append(nx)
                i += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        elif c == 0x0D:  # raw EOL in literal -> \n
            out.append(0x0A)
            i += 1
            if i < n and data[i] == 0x0A:
                i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated PDF literal string")


def _parse_hexstr(data: bytes, i: int) -> tuple[bytes, int]:
    assert data[i] == 0x3C
    j = data.find(b">", i + 1)
    if j < 0:
        raise ValueError("unterminated PDF hex string")
    hx = bytes(c for c in data[i + 1 : j] if c not in _WS)
    if len(hx) % 2:
        hx += b"0"
    try:
        return bytes.fromhex(hx.decode("ascii")), j + 1
    except ValueError as e:
        raise ValueError(f"bad PDF hex string: {e}") from None


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_OP_RE = re.compile(rb"[A-Za-z'\"][A-Za-z0-9*'\"]*")


def _parse_value(data: bytes, i: int):
    """Parse one object value at i (whitespace already skipped).
    Returns (value, next_pos). Numbers look ahead for the ``N G R``
    indirect-reference form."""
    c = data[i]
    if data[i : i + 2] == b"<<":
        i += 2
        d: dict = {}
        while True:
            i = _skip_ws(data, i)
            if data[i : i + 2] == b">>":
                return d, i + 2
            if data[i] != 0x2F:
                raise ValueError("PDF dict key is not a name")
            key, i = _parse_value(data, i)
            i = _skip_ws(data, i)
            val, i = _parse_value(data, i)
            d[key] = val
    if c == 0x5B:  # [
        i += 1
        arr = []
        while True:
            i = _skip_ws(data, i)
            if data[i] == 0x5D:
                return arr, i + 1
            v, i = _parse_value(data, i)
            arr.append(v)
    if c == 0x2F:  # /Name — hash-escapes #xx per §7.3.5
        j = i + 1
        n = len(data)
        while j < n and data[j] not in _WS and data[j] not in _DELIM:
            j += 1
        raw = data[i + 1 : j]
        name = re.sub(
            rb"#([0-9A-Fa-f]{2})",
            lambda m: bytes([int(m.group(1), 16)]),
            raw,
        )
        return name.decode("latin-1"), j
    if c == 0x28:
        return _parse_litstr(data, i)
    if c == 0x3C:  # hex string (<< handled above)
        return _parse_hexstr(data, i)
    m = _NUM_RE.match(data, i)
    if m:
        txt = m.group()
        j = m.end()
        # N G R lookahead (both non-negative integers)
        if b"." not in txt and not txt.startswith(b"-"):
            k = _skip_ws(data, j)
            m2 = _NUM_RE.match(data, k)
            if m2 and b"." not in m2.group():
                k2 = _skip_ws(data, m2.end())
                if (
                    data[k2 : k2 + 1] == b"R"
                    and (
                        k2 + 1 >= len(data)
                        or data[k2 + 1] in _WS
                        or data[k2 + 1] in _DELIM
                    )
                ):
                    return _Ref(int(txt)), k2 + 1
        return (float(txt) if b"." in txt else int(txt)), j
    if data[i : i + 4] == b"true":
        return True, i + 4
    if data[i : i + 5] == b"false":
        return False, i + 5
    if data[i : i + 4] == b"null":
        return None, i + 4
    raise ValueError(f"unparseable PDF value at byte {i}")


_OBJ_HDR_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


class PdfDocument:
    """Parsed PDF: xref-driven when the classic table is intact,
    sequential-scan fallback otherwise. Typed ValueError on non-PDF
    bytes, encryption, or unsupported stream filters."""

    def __init__(self, data: bytes):
        if data[:5] != b"%PDF-":
            raise ValueError("not a PDF: missing %PDF- header")
        m = re.match(rb"%PDF-(\d+\.\d+)", data)
        if not m:
            raise ValueError("malformed PDF version header")
        self.version = m.group(1).decode("ascii")
        self.data = data
        self._cache: dict[int, object] = {}
        self.trailer: dict = {}
        self.xref: dict[int, int] = {}
        try:
            self._load_xref()
        except ValueError:
            self.xref = {}
        if not self.xref:
            self._scan_objects()
        if not self.trailer:
            # fallback trailer: last classic trailer dict in the file
            t = self.data.rfind(b"trailer")
            if t >= 0:
                i = _skip_ws(self.data, t + 7)
                self.trailer = _parse_value(self.data, i)[0]
        if "Encrypt" in self.trailer:
            raise ValueError("encrypted PDF unsupported")

    # -------------------------------------------------- object access
    def resolve(self, v):
        while isinstance(v, _Ref):
            v = self.get(v.num)
        return v

    def get(self, num: int):
        if num in self._cache:
            return self._cache[num]
        off = self.xref.get(num)
        if off is None:
            raise ValueError(f"PDF object {num} not found")
        val = self._parse_object_at(off, num)
        self._cache[num] = val
        return val

    def _parse_object_at(self, off: int, expect: int):
        data = self.data
        m = _OBJ_HDR_RE.match(data, _skip_ws(data, off))
        if not m or int(m.group(1)) != expect:
            raise ValueError(f"PDF xref offset for object {expect} is stale")
        i = _skip_ws(data, m.end())
        val, i = _parse_value(data, i)
        i = _skip_ws(data, i)
        if data[i : i + 6] == b"stream":
            i += 6
            if data[i : i + 2] == b"\r\n":
                i += 2
            elif data[i : i + 1] == b"\n":
                i += 1
            if not isinstance(val, dict):
                raise ValueError("PDF stream without a dict")
            ln = self.resolve(val.get("Length"))
            if isinstance(ln, int) and 0 <= ln <= len(data) - i:
                raw = data[i : i + ln]
            else:  # missing/bogus Length: scan for endstream
                j = data.find(b"endstream", i)
                if j < 0:
                    raise ValueError("PDF stream missing endstream")
                raw = data[i:j].rstrip(b"\r\n")
            return _Stream(val, raw)
        return val

    # -------------------------------------------------------- xref
    def _load_xref(self) -> None:
        data = self.data
        sx = data.rfind(b"startxref")
        if sx < 0:
            raise ValueError("no startxref")
        m = _NUM_RE.search(data, sx + 9)
        if not m:
            raise ValueError("bad startxref")
        off = int(m.group())
        seen = set()
        while True:
            if off in seen or not (0 <= off < len(data)):
                break
            seen.add(off)
            i = _skip_ws(data, off)
            if data[i : i + 4] != b"xref":
                # xref stream (PDF 1.5+) — caller falls back to scan
                raise ValueError("xref stream unsupported")
            i += 4
            while True:
                i = _skip_ws(data, i)
                if data[i : i + 7] == b"trailer":
                    i = _skip_ws(data, i + 7)
                    tr, i = _parse_value(data, i)
                    if not self.trailer:
                        self.trailer = tr
                    prev = tr.get("Prev")
                    break
                m = re.match(rb"(\d+)\s+(\d+)", data[i : i + 40])
                if not m:
                    raise ValueError("malformed xref subsection header")
                start, count = int(m.group(1)), int(m.group(2))
                i = _skip_ws(data, i + m.end())
                for k in range(count):
                    ent = data[i : i + 20]
                    if len(ent) < 18:
                        raise ValueError("truncated xref entry")
                    typ = ent[17:18]
                    if typ == b"n" and (start + k) not in self.xref:
                        self.xref[start + k] = int(ent[:10])
                    i += 20
            if not isinstance(prev, int):
                break
            off = prev

    def _scan_objects(self) -> None:
        """Sequential fallback: walk object headers from the top,
        skipping stream payloads by their (direct) Length so payload
        bytes can't fake object headers."""
        data = self.data
        i = 0
        n = len(data)
        while i < n:
            m = _OBJ_HDR_RE.search(data, i)
            if not m:
                break
            num = int(m.group(1))
            if num not in self.xref:
                self.xref[num] = m.start()
            try:
                obj = self._parse_object_at(m.start(), num)
            except ValueError:
                i = m.end()
                continue
            if isinstance(obj, _Stream):
                j = data.find(b"endstream", m.end())
                i = max(m.end(), j + 9 if j >= 0 else m.end())
            else:
                i = m.end()

    # ------------------------------------------------------- pages
    def pages(self) -> list[dict]:
        root = self.resolve(self.trailer.get("Root"))
        if not isinstance(root, dict):
            raise ValueError("PDF has no document catalog")
        out: list[dict] = []
        visited: set[int] = set()

        def walk(node, depth: int) -> None:
            if depth > 64:
                raise ValueError("PDF page tree too deep")
            node = self.resolve(node)
            if not isinstance(node, dict):
                return
            t = node.get("Type")
            if t == "Page":
                out.append(node)
            else:  # Pages (or untyped intermediate)
                for kid in self.resolve(node.get("Kids")) or []:
                    if isinstance(kid, _Ref):
                        if kid.num in visited:
                            continue
                        visited.add(kid.num)
                    walk(kid, depth + 1)

        walk(root.get("Pages"), 0)
        return out

    def stream_bytes(self, obj) -> bytes:
        """Decode a stream object's filters. Supports no filter and
        FlateDecode (incl. array form); anything else is a typed
        reject so pipelines can route by error type."""
        obj = self.resolve(obj)
        if not isinstance(obj, _Stream):
            raise ValueError("PDF content reference is not a stream")
        filters = self.resolve(obj.dict.get("Filter"))
        if filters is None:
            filters = []
        elif not isinstance(filters, list):
            filters = [filters]
        parms = obj.dict.get("DecodeParms")
        if parms is not None:
            p = self.resolve(parms)
            plist = p if isinstance(p, list) else [p]
            for pd in plist:
                pd = self.resolve(pd)
                if isinstance(pd, dict) and pd.get("Predictor", 1) != 1:
                    raise ValueError("PDF predictor-coded stream unsupported")
        raw = obj.raw
        for f in filters:
            f = self.resolve(f)
            if f == "FlateDecode":
                try:
                    raw = zlib.decompress(raw)
                except zlib.error as e:
                    raise ValueError(f"corrupt FlateDecode stream: {e}") from None
            else:
                raise ValueError(f"unsupported PDF filter {f!r}")
        return raw


# --------------------------------------------------- content -> text

_SHOW_OPS = (b"Tj", b"'", b'"', b"TJ")
_NEWLINE_OPS = (b"T*", b"Td", b"TD", b"Tm")


def _content_text(content: bytes) -> str:
    """Interpret a content stream's text operators. Line structure:
    a text-line move (T*, Td, TD, Tm — and the '/\" shortcuts) starts
    a new line iff a show op ran since the last break — so an empty
    ``() Tj`` still anchors its (empty) line, while positioning-only
    moves (e.g. the Td that opens a BT block) never fabricate blank
    lines. TJ kern numbers contribute nothing (exact reassembly)."""
    lines: list[bytearray] = []
    cur = bytearray()
    shown = False
    stack: list = []
    i = 0
    n = len(content)

    def brk() -> None:
        nonlocal cur, shown
        if shown:
            lines.append(cur)
            cur = bytearray()
            shown = False

    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i]
        if c == 0x28 or c == 0x5B or c == 0x3C or c == 0x2F or (
            _NUM_RE.match(content, i)
        ):
            try:
                v, i = _parse_value(content, i)
            except ValueError:
                i += 1
                continue
            stack.append(v)
            continue
        m = _OP_RE.match(content, i)
        if not m:
            i += 1
            continue
        op = m.group()
        i = m.end()
        if op == b"Tj":
            if stack and isinstance(stack[-1], bytes):
                cur += stack[-1]
                shown = True
        elif op == b"'" or op == b'"':
            if stack and isinstance(stack[-1], bytes):
                brk()
                cur += stack[-1]
                shown = True
        elif op == b"TJ":
            if stack and isinstance(stack[-1], list):
                for el in stack[-1]:
                    if isinstance(el, bytes):
                        cur += el
                shown = True
        elif op in _NEWLINE_OPS:
            brk()
        stack.clear()
    if shown:
        lines.append(cur)
    return "\n".join(b.decode("latin-1") for b in lines)


def extract_pdf_text(data: bytes) -> str:
    """Extract the text of every page, pages joined by newline.
    Typed ValueError on non-PDF bytes, encryption, or unsupported
    filters; documents with no pages yield the empty string."""
    doc = PdfDocument(data)
    texts = []
    for page in doc.pages():
        cont = doc.resolve(page.get("Contents"))
        if cont is None:
            texts.append("")
            continue
        parts = cont if isinstance(cont, list) else [cont]
        blob = b"\n".join(doc.stream_bytes(p) for p in parts)
        texts.append(_content_text(blob))
    return "\n".join(texts)


def pdf_info(data: bytes) -> dict:
    """Header/structure probe: version, page count, object count.
    Encrypted documents reject typed (the probe itself must not leak
    garbage fields for them)."""
    doc = PdfDocument(data)
    return {
        "version": doc.version,
        "n_pages": len(doc.pages()),
        "n_objects": len(doc.xref),
    }


# ------------------------------------------------------- synthesizer


def _escape_literal(s: bytes) -> bytes:
    out = bytearray()
    for b in s:
        if b in b"()\\":
            out += b"\\" + bytes([b])
        elif 32 <= b <= 126:
            out.append(b)
        else:
            out += ("\\%03o" % b).encode("ascii")
    return bytes(out)


def pdf_bytes(pages: list[str], compress: bool = True) -> bytes:
    """Synthesize a spec-valid PDF 1.4: real xref table, page tree,
    Helvetica Type1 font, one content stream per page. Alternating
    structure exercises the extractor's full surface: odd pages use an
    indirect /Length object, odd LINES within a page draw via a
    TJ array split in two chunks with a kern number between (which
    must reassemble exactly); ``compress`` toggles FlateDecode.
    Page strings must be latin-1 encodable (typed ValueError)."""
    if not isinstance(pages, list) or not pages or not all(
        isinstance(p, str) for p in pages
    ):
        raise ValueError("pages must be a non-empty list of str")
    enc_pages = []
    for p in pages:
        try:
            enc_pages.append([ln.encode("latin-1") for ln in p.split("\n")])
        except UnicodeEncodeError:
            raise ValueError("PDF page text must be latin-1 encodable") from None

    bodies: list[bytes | None] = [None, None, None]  # catalog, pages, font
    kids: list[int] = []
    for pi, lines in enumerate(enc_pages):
        parts = [b"BT /F1 12 Tf 14 TL 72 720 Td"]
        for li, ln in enumerate(lines):
            if li:
                parts.append(b"T*")
            if li % 2 == 1 and len(ln) > 1:
                mid = len(ln) // 2
                parts.append(
                    b"[("
                    + _escape_literal(ln[:mid])
                    + b") -20 ("
                    + _escape_literal(ln[mid:])
                    + b")] TJ"
                )
            else:
                parts.append(b"(" + _escape_literal(ln) + b") Tj")
        parts.append(b"ET")
        content = b"\n".join(parts)
        if compress:
            content = zlib.compress(content)
        filt = b" /Filter /FlateDecode" if compress else b""
        stream_num = len(bodies) + 1
        if pi % 2 == 1:  # indirect /Length
            len_num = stream_num + 1
            page_num = stream_num + 2
            bodies.append(
                b"<< /Length %d 0 R%s >>\nstream\n" % (len_num, filt)
                + content
                + b"\nendstream"
            )
            bodies.append(b"%d" % len(content))
        else:
            page_num = stream_num + 1
            bodies.append(
                b"<< /Length %d%s >>\nstream\n" % (len(content), filt)
                + content
                + b"\nendstream"
            )
        bodies.append(
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % stream_num
        )
        kids.append(page_num)

    bodies[0] = b"<< /Type /Catalog /Pages 2 0 R >>"
    bodies[1] = (
        b"<< /Type /Pages /Kids ["
        + b" ".join(b"%d 0 R" % k for k in kids)
        + b"] /Count %d >>" % len(kids)
    )
    bodies[2] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>"
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = []
    for num, body in enumerate(bodies, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % num
        out += body  # type: ignore[operator]
        out += b"\nendobj\n"
    xref_off = len(out)
    out += b"xref\n0 %d\n" % (len(bodies) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(bodies) + 1, xref_off)
    )
    return bytes(out)
