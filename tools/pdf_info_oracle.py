#!/usr/bin/env python3
"""Independent second implementation of container-level PDF info extraction
(classic xref tables, PDF 1.4-style files): page count via the page tree,
per-page MediaBox with inheritance, Info-dict Title/Author with PDF
text-string decoding (UTF-16BE BOM or PDFDocEncoding~latin-1), /Encrypt flag.

Used to establish the expected values for graft.extract.PdfBytes's golden
tests over the reference fixture PDFs — a from-scratch reimplementation of
the public PDF 32000-1:2008 spec (7.5 file structure, 7.3 objects), NOT a
port of pypdf. Usage: python3 tools/pdf_info_oracle.py <file.pdf>
"""
import re, sys, json


class P:  # tiny recursive-descent parser over the byte buffer
    WS = b"\x00\t\n\x0c\r "
    DELIM = b"()<>[]{}/%"

    def __init__(self, data, pos=0):
        self.d, self.i = data, pos

    def skip_ws(self):
        while self.i < len(self.d):
            c = self.d[self.i:self.i+1]
            if c in b"%":
                while self.i < len(self.d) and self.d[self.i] not in b"\r\n":
                    self.i += 1
            elif c in self.WS:
                self.i += 1
            else:
                return

    def token(self):
        self.skip_ws()
        c = self.d[self.i:self.i+1]
        if c == b"<" and self.d[self.i+1:self.i+2] == b"<":
            self.i += 2; return "<<"
        if c == b">" and self.d[self.i+1:self.i+2] == b">":
            self.i += 2; return ">>"
        if c in b"[]":
            self.i += 1; return c.decode()
        if c == b"/":
            j = self.i + 1
            while j < len(self.d) and self.d[j:j+1] not in self.WS + self.DELIM:
                j += 1
            name = self.d[self.i+1:j]
            self.i = j
            # #xx hex escapes in names
            name = re.sub(rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), name)
            return ("name", name.decode("latin-1"))
        if c == b"(":
            return ("str", self.lit_string())
        if c == b"<":
            j = self.d.index(b">", self.i)
            hx = re.sub(rb"\s", b"", self.d[self.i+1:j])
            if len(hx) % 2: hx += b"0"
            self.i = j + 1
            return ("str", bytes.fromhex(hx.decode()))
        j = self.i
        while j < len(self.d) and self.d[j:j+1] not in self.WS + self.DELIM:
            j += 1
        w = self.d[self.i:j]; self.i = j
        return ("word", w)

    def lit_string(self):
        assert self.d[self.i:self.i+1] == b"("
        self.i += 1
        out, depth = bytearray(), 1
        while depth:
            c = self.d[self.i:self.i+1]; self.i += 1
            if c == b"\\":
                e = self.d[self.i:self.i+1]; self.i += 1
                m = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\x0c"}
                if e in m: out += m[e]
                elif e.isdigit():
                    oc = e
                    while len(oc) < 3 and self.d[self.i:self.i+1].isdigit():
                        oc += self.d[self.i:self.i+1]; self.i += 1
                    out.append(int(oc, 8) & 0xFF)
                elif e in b"\r\n":
                    if e == b"\r" and self.d[self.i:self.i+1] == b"\n": self.i += 1
                else: out += e
            elif c == b"(": depth += 1; out += c
            elif c == b")":
                depth -= 1
                if depth: out += c
            else: out += c
        return bytes(out)

    def obj(self):
        t = self.token()
        if t == "<<":
            d = {}
            while True:
                k = self.token()
                if k == ">>": return ("dict", d)
                assert k[0] == "name", k
                d[k[1]] = self.obj()
        if t == "[":
            a = []
            while True:
                self.skip_ws()
                if self.d[self.i:self.i+1] == b"]":
                    self.i += 1; return ("arr", a)
                a.append(self.obj())
        if isinstance(t, tuple) and t[0] == "word":
            w = t[1]
            if w in (b"true", b"false"): return ("bool", w == b"true")
            if w == b"null": return ("null", None)
            # number or R-reference lookahead
            save = self.i
            if re.fullmatch(rb"\d+", w):
                t2 = self.token()
                if isinstance(t2, tuple) and t2[0] == "word" and re.fullmatch(rb"\d+", t2[1]):
                    t3 = self.token()
                    if isinstance(t3, tuple) and t3[0] == "word" and t3[1] == b"R":
                        return ("ref", (int(w), int(t2[1])))
                self.i = save
            return ("num", float(w))
        return t


def parse_pdf(data):
    # xref offsets (classic tables only; /Prev chains followed)
    sx = data.rfind(b"startxref")
    off = int(data[sx + 9:].split()[0])
    xref, trailer = {}, {}
    seen = set()
    while off and off not in seen:
        seen.add(off)
        p = P(data, off)
        tok = p.token()
        assert tok == ("word", b"xref"), tok
        while True:
            save = p.i
            t = p.token()
            if t == ("word", b"trailer"):
                tr = p.obj()[1]
                for k, v in tr.items(): trailer.setdefault(k, v)
                off = int(tr["Prev"][1]) if "Prev" in tr else 0
                break
            start, cnt = int(t[1]), int(p.token()[1])
            p.skip_ws()
            for n in range(start, start + cnt):
                ent = data[p.i:p.i+20]; p.i += 20
                o, g, ty = ent.split()[:3]
                if ty == b"n" and n not in xref: xref.setdefault(n, int(o))

    def resolve(o):
        while isinstance(o, tuple) and o[0] == "ref":
            num = o[1][0]
            pp = P(data, xref[num])
            pp.token(); pp.token(); t = pp.token()
            assert t == ("word", b"obj")
            o = pp.obj()
        return o

    def text(o):
        if o is None: return ""
        b = resolve(o)[1]
        if b[:2] == b"\xfe\xff": return b[2:].decode("utf-16-be")
        return b.decode("latin-1")

    root = resolve(trailer["Root"])[1]
    info = resolve(trailer["Info"])[1] if "Info" in trailer else {}
    dims, count = [], 0

    def walk(node_ref, inherited_mb):
        nonlocal count
        node = resolve(node_ref)[1]
        mb = node.get("MediaBox", inherited_mb)
        ty = node["Type"][1]
        if ty == "Page":
            count += 1
            llx, lly, urx, ury = [float(resolve(x)[1]) for x in resolve(mb)[1]]
            dims.append((abs(urx - llx), abs(ury - lly)))
        else:
            for kid in resolve(node["Kids"])[1]:
                walk(kid, mb)

    walk(root["Pages"], None)
    return {
        "page_count": count,
        "file_size": len(data),
        "is_encrypted": "Encrypt" in trailer,
        "page_dimensions": dims,
        "title": text(info.get("Title")),
        "author": text(info.get("Author")),
    }


if __name__ == "__main__":
    print(json.dumps(parse_pdf(open(sys.argv[1], "rb").read()), indent=1))
