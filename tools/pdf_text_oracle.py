#!/usr/bin/env python3
"""Independent second implementation of PDF text-content extraction, used to
establish the golden expectations for graft.extract.PdfText over the
reference fixture PDFs — a from-scratch content-stream interpreter written
against the public PDF 32000-1:2008 spec (9.4 text objects, 9.6-9.7 fonts,
9.10 ToUnicode), NOT a port of pdfminer/pypdf.

Implements the SAME line-assembly contract as the Scala implementation
(PdfText.scala scaladoc): runs -> baseline clusters (tol 2.0) -> in-line
sort by x with gap>0.3*size => space, gap>2.0*size => segment split,
2+ spaces collapse -> segments sorted (-y, x). Agreement between the two
from-scratch implementations is the correctness evidence.

Usage: python3 tools/pdf_text_oracle.py <file.pdf> [--hash]
"""
import sys, json, zlib, hashlib, math
sys.path.insert(0, __path__[0] if '__path__' in dir() else sys.path[0])
from pdf_info_oracle import P


def build_doc(data):
    sx = data.rfind(b"startxref")
    off = int(data[sx + 9:].split()[0])
    xref, trailer, seen = {}, {}, set()
    while off and off not in seen:
        seen.add(off)
        p = P(data, off)
        assert p.token() == ("word", b"xref")
        while True:
            t = p.token()
            if t == ("word", b"trailer"):
                tr = p.obj()[1]
                for k, v in tr.items():
                    trailer.setdefault(k, v)
                off = int(tr["Prev"][1]) if "Prev" in tr else 0
                break
            start, cnt = int(t[1]), int(p.token()[1])
            p.skip_ws()
            for n in range(start, start + cnt):
                ent = data[p.i:p.i + 20]; p.i += 20
                o, g, ty = ent.split()[:3]
                if ty == b"n":
                    xref.setdefault(n, int(o))

    def load(num):
        pp = P(data, xref[num])
        pp.token(); pp.token()
        assert pp.token() == ("word", b"obj")
        o = pp.obj()
        save = pp.i
        t = pp.token()
        if t == ("word", b"stream"):
            if data[pp.i:pp.i + 1] == b"\r":
                pp.i += 1
            if data[pp.i:pp.i + 1] == b"\n":
                pp.i += 1
            ln = int(num_of(resolve(o[1]["Length"])))
            return ("stream", (o[1], data[pp.i:pp.i + ln]))
        pp.i = save
        return o

    def resolve(o):
        d = 0
        while isinstance(o, tuple) and o[0] == "ref":
            o = load(o[1][0]); d += 1
            assert d < 32
        return o

    def num_of(o):
        return float(resolve(o)[1])

    def decoded(o):
        s = resolve(o)
        if s[0] != "stream":
            return b""
        dct, raw = s[1]
        filt = dct.get("Filter")
        names = []
        if filt:
            f = resolve(filt)
            names = [f[1]] if f[0] == "name" else [resolve(x)[1] for x in f[1]]
        out = raw
        for n in names:
            if n == "FlateDecode":
                out = zlib.decompress(out)
            else:
                raise ValueError("filter " + n)
        return out

    return trailer, resolve, num_of, decoded


# ------------------------------------------------------------ fonts
def parse_tounicode(cm):
    """bfchar/bfrange over hex strings; the last UTF-16 unit increments."""
    p = P(cm, 0)
    out, mode = {}, 0
    while p.i < len(cm):
        p.skip_ws()
        if p.i >= len(cm):
            break
        c = cm[p.i:p.i + 1]
        if c == b"<" and cm[p.i + 1:p.i + 2] != b"<":
            src = p.token()[1]
            code = int.from_bytes(src, "big")
            if mode == 1:
                p.skip_ws()
                if cm[p.i:p.i + 1] == b"<":
                    out[code] = p.token()[1].decode("utf-16-be")
            elif mode == 2:
                hi = int.from_bytes(p.token()[1], "big")
                p.skip_ws()
                if cm[p.i:p.i + 1] == b"[":
                    p.i += 1
                    k = code
                    while True:
                        p.skip_ws()
                        if cm[p.i:p.i + 1] == b"]":
                            p.i += 1
                            break
                        out[k] = p.token()[1].decode("utf-16-be")
                        k += 1
                else:
                    base = p.token()[1].decode("utf-16-be")
                    for k in range(code, hi + 1):
                        d = k - code
                        out[k] = base[:-1] + chr(ord(base[-1]) + d) if base else ""
            continue
        t = p.token()
        if isinstance(t, tuple) and t[0] == "word":
            w = t[1]
            if w == b"beginbfchar":
                mode = 1
            elif w == b"beginbfrange":
                mode = 2
            elif w in (b"endbfchar", b"endbfrange"):
                mode = 0
        elif t == "<<":
            depth = 1
            while depth:
                t2 = p.token()
                if t2 == "<<":
                    depth += 1
                elif t2 == ">>":
                    depth -= 1
    return out


WINANSI_HIGH = {0x80: "€", 0x82: "‚", 0x83: "ƒ", 0x84: "„",
    0x85: "…", 0x86: "†", 0x87: "‡", 0x88: "ˆ",
    0x89: "‰", 0x8a: "Š", 0x8b: "‹", 0x8c: "Œ",
    0x8e: "Ž", 0x91: "‘", 0x92: "’", 0x93: "“",
    0x94: "”", 0x95: "•", 0x96: "–", 0x97: "—",
    0x98: "˜", 0x99: "™", 0x9a: "š", 0x9b: "›",
    0x9c: "œ", 0x9e: "ž", 0x9f: "Ÿ"}


def parse_font(fd, resolve, decoded):
    sub = fd.get("Subtype")
    sub = resolve(sub)[1] if sub else ""
    touni = {}
    if "ToUnicode" in fd:
        touni = parse_tounicode(decoded(fd["ToUnicode"]))
    if sub == "Type0":
        desc = resolve(fd["DescendantFonts"])[1][0]
        dd = resolve(desc)[1]
        dw = float(resolve(dd["DW"])[1]) if "DW" in dd else 1000.0
        widths = {}
        if "W" in dd:
            vs = [resolve(x) for x in resolve(dd["W"])[1]]
            i = 0
            while i < len(vs):
                if i + 1 < len(vs) and vs[i + 1][0] == "arr":
                    c = int(vs[i][1])
                    for j, wv in enumerate(vs[i + 1][1]):
                        widths[c + j] = float(resolve(wv)[1])
                    i += 2
                elif i + 2 < len(vs):
                    c1, c2, w = int(vs[i][1]), int(vs[i + 1][1]), float(vs[i + 2][1])
                    for c in range(c1, c2 + 1):
                        widths[c] = w
                    i += 3
                else:
                    i += 1
        return {"two": True, "touni": touni, "enc": {}, "w": widths, "dw": dw}
    enc = {}
    if "Encoding" in fd:
        e = resolve(fd["Encoding"])
        if e[0] == "name" and e[1] == "WinAnsiEncoding":
            enc = {c: chr(c) for c in range(32, 127)}
            enc.update(WINANSI_HIGH)
            enc.update({c: chr(c) for c in range(0xa0, 0x100)})
        # dict /Differences and other bases: not needed for the fixtures
    first = int(resolve(fd["FirstChar"])[1]) if "FirstChar" in fd else 0
    widths = {}
    if "Widths" in fd:
        for i, wv in enumerate(resolve(fd["Widths"])[1]):
            widths[first + i] = float(resolve(wv)[1])
    return {"two": False, "touni": touni, "enc": enc, "w": widths, "dw": 500.0}


def fdecode(f, code):
    if code in f["touni"]:
        return f["touni"][code]
    if code in f["enc"]:
        return f["enc"][code]
    if not f["two"] and 32 <= code < 127:
        return chr(code)
    if not f["two"] and 161 <= code <= 255:
        return chr(code)
    return "�"


# ------------------------------------------------------------ interpreter
def mmul(m, n):
    return [m[0] * n[0] + m[1] * n[2], m[0] * n[1] + m[1] * n[3],
            m[2] * n[0] + m[3] * n[2], m[2] * n[1] + m[3] * n[3],
            m[4] * n[0] + m[5] * n[2] + n[4], m[4] * n[1] + m[5] * n[3] + n[5]]


IDENT = [1.0, 0, 0, 1.0, 0, 0]


def interpret(content, res, base_ctm, resolve, decoded, runs, font_cache, depth=0):
    if depth > 8:
        return
    rd = resolve(res)[1] if res else {}
    fonts = resolve(rd["Font"])[1] if "Font" in rd else {}
    xobjs = resolve(rd["XObject"])[1] if "XObject" in rd else {}
    ctm, stack = list(base_ctm), []
    tm, tlm = list(IDENT), list(IDENT)
    font, size = None, 0.0
    csp = wsp = rise = lead = 0.0
    hs = 1.0
    p = P(content, 0)
    ops = []

    def nop(i):
        v = ops[len(ops) - i]
        return float(v[1]) if isinstance(v, tuple) and v[0] == "num" else 0.0

    def td(tx, ty):
        nonlocal tlm, tm
        tlm = mmul([1, 0, 0, 1, tx, ty], tlm)
        tm = list(tlm)

    def getfont(name):
        if name not in fonts:
            return None
        ref = fonts[name]
        key = ref[1][0] if isinstance(ref, tuple) and ref[0] == "ref" else None
        if key is not None and key in font_cache:
            return font_cache[key]
        f = parse_font(resolve(ref)[1], resolve, decoded)
        if key is not None:
            font_cache[key] = f
        return f

    def show(b):
        nonlocal tm
        if font is None:
            return
        trm = mmul(tm, ctm)
        x0 = trm[4] + rise * trm[2]
        y0 = trm[5] + rise * trm[3]
        txt, adv = [], 0.0
        step = 2 if font["two"] else 1
        for i in range(0, len(b) - step + 1, step):
            code = int.from_bytes(b[i:i + step], "big")
            txt.append(fdecode(font, code))
            ws = wsp if (not font["two"] and code == 32) else 0.0
            adv += (font["w"].get(code, font["dw"]) / 1000.0 * size + csp + ws) * hs
        text = "".join(txt)
        sx = math.hypot(trm[0], trm[1])
        sy = math.hypot(trm[2], trm[3])
        if text:
            runs.append((x0, y0, adv * sx, abs(size * sy), text))
        tm = mmul([1, 0, 0, 1, adv, 0], tm)

    while p.i < len(content):
        p.skip_ws()
        if p.i >= len(content):
            break
        c = content[p.i:p.i + 1]
        if c in b"/([<" or c.isdigit() or c in b"+-.":
            ops.append(p.obj())
            continue
        if c in b")]>{}":
            p.i += 1
            continue
        t = p.token()
        if not (isinstance(t, tuple) and t[0] == "word"):
            ops = []
            continue
        op = t[1].decode("latin-1")
        if op == "q":
            # full graphics state (8.4.2): text state rides along; tm/tlm
            # are text-object state and stay
            stack.append((list(ctm), font, size, csp, wsp, hs, lead, rise))
        elif op == "Q":
            if stack:
                ctm, font, size, csp, wsp, hs, lead, rise = stack.pop()
        elif op == "cm":
            ctm = mmul([nop(6), nop(5), nop(4), nop(3), nop(2), nop(1)], ctm)
        elif op == "BT":
            tm, tlm = list(IDENT), list(IDENT)
        elif op == "Tf":
            size = nop(1)
            if ops and ops[-2][0] == "name":
                f = getfont(ops[-2][1])
                if f:
                    font = f
        elif op == "Td":
            td(nop(2), nop(1))
        elif op == "TD":
            lead = -nop(1); td(nop(2), nop(1))
        elif op == "Tm":
            tlm = [nop(6), nop(5), nop(4), nop(3), nop(2), nop(1)]
            tm = list(tlm)
        elif op == "T*":
            td(0, -lead)
        elif op == "TL":
            lead = nop(1)
        elif op == "Tc":
            csp = nop(1)
        elif op == "Tw":
            wsp = nop(1)
        elif op == "Tz":
            hs = nop(1) / 100.0
        elif op == "Ts":
            rise = nop(1)
        elif op == "Tj":
            if ops and ops[-1][0] == "str":
                show(ops[-1][1])
        elif op == "'":
            td(0, -lead)
            if ops and ops[-1][0] == "str":
                show(ops[-1][1])
        elif op == '"':
            wsp, csp = nop(3), nop(2)
            td(0, -lead)
            if ops and ops[-1][0] == "str":
                show(ops[-1][1])
        elif op == "TJ":
            if ops and ops[-1][0] == "arr":
                for el in ops[-1][1]:
                    if el[0] == "str":
                        show(el[1])
                    elif el[0] == "num":
                        dx = -el[1] / 1000.0 * size * hs
                        if dx > 0.18 * size and size > 0:
                            trm = mmul(tm, ctm)
                            runs.append((trm[4], trm[5] + rise * trm[3],
                                         dx * math.hypot(trm[0], trm[1]),
                                         size * math.hypot(trm[2], trm[3]), " "))
                        tm = mmul([1, 0, 0, 1, dx, 0], tm)
        elif op == "Do":
            if ops and ops[-1][0] == "name" and ops[-1][1] in xobjs:
                x = resolve(xobjs[ops[-1][1]])
                if x[0] == "stream":
                    xd = x[1][0]
                    st = resolve(xd.get("Subtype", ("name", "")))[1]
                    if st == "Form":
                        fm = list(IDENT)
                        if "Matrix" in xd:
                            fm = [float(resolve(v)[1]) for v in resolve(xd["Matrix"])[1]]
                        fr = xd.get("Resources", res)
                        interpret(decoded(xobjs[ops[-1][1]]), fr, mmul(fm, ctm),
                                  resolve, decoded, runs, font_cache, depth + 1)
        elif op == "BI":
            j = p.i
            while j + 2 < len(content) and not (
                    content[j] in b"\x00\t\n\x0c\r " and content[j + 1:j + 3] == b"EI"
                    and (j + 3 >= len(content) or content[j + 3] in b"\x00\t\n\x0c\r ")):
                j += 1
            p.i = min(len(content), j + 3)
        ops = []


# ------------------------------------------------------------ line assembly
def assemble(runs):
    if not runs:
        return []
    runs = sorted(runs, key=lambda r: (-r[1], r[0]))
    lines, cur_y = [], None
    for r in runs:
        if cur_y is None or abs(r[1] - cur_y) > 2.0:
            lines.append([r])
            cur_y = r[1]
        else:
            lines[-1].append(r)
    segments = []
    for lr in lines:
        lr = sorted(lr, key=lambda r: r[0])
        seg_start = 0

        def flush(end):
            seg = lr[seg_start:end]
            parts, prev_end, prev_size = [], None, 0.0
            for r in seg:
                if prev_end is not None:
                    gap = r[0] - prev_end
                    if gap > 0.3 * max(prev_size, r[3]) and \
                            not (parts and parts[-1].endswith(" ")) and \
                            not r[4].startswith(" "):
                        parts.append(" ")
                parts.append(r[4])
                prev_end = r[0] + r[2]
                prev_size = r[3]
            text = "".join(parts)
            while "  " in text:
                text = text.replace("  ", " ")
            text = text.strip(" ")
            if text:
                segments.append((seg[0][0], seg[0][1],
                                 seg[-1][0] + seg[-1][2] - seg[0][0],
                                 max(r[3] for r in seg), text))

        for i in range(1, len(lr)):
            gap = lr[i][0] - (lr[i - 1][0] + lr[i - 1][2])
            if gap > 2.0 * max(lr[i][3], lr[i - 1][3]):
                flush(i)
                seg_start = i
        flush(len(lr))
    return sorted(segments, key=lambda s: (-s[1], s[0]))


def extract(data):
    trailer, resolve, num_of, decoded = build_doc(data)
    root = resolve(trailer["Root"])[1]
    pages = []

    def walk(node_ref, inh_res, inh_mb):
        node = resolve(node_ref)[1]
        res = node.get("Resources", inh_res)
        mb = node.get("MediaBox", inh_mb)
        if node["Type"][1] == "Page":
            runs, fc = [], {}
            cont = node.get("Contents")
            body = b""
            if cont is not None:
                cv = resolve(cont)
                if cv[0] == "arr":
                    body = b"\n".join(decoded(x) for x in cv[1])
                else:
                    body = decoded(cont)
            interpret(body, res, IDENT, resolve, decoded, runs, fc)
            llx, lly, urx, ury = [float(resolve(x)[1]) for x in resolve(mb)[1]]
            pages.append({"page": len(pages) + 1,
                          "width": abs(urx - llx), "height": abs(ury - lly),
                          "lines": [s[4] for s in assemble(runs)]})
        else:
            for kid in resolve(node["Kids"])[1]:
                walk(kid, res, mb)

    walk(root["Pages"], None, None)
    return pages


if __name__ == "__main__":
    data = open(sys.argv[1], "rb").read()
    pages = extract(data)
    if "--hash" in sys.argv:
        full = "\f".join("\n".join(p["lines"]) for p in pages)
        print(json.dumps({
            "pages": len(pages),
            "lines_per_page": [len(p["lines"]) for p in pages],
            "sha256": hashlib.sha256(full.encode("utf-8")).hexdigest(),
            "first_lines": [p["lines"][0] if p["lines"] else "" for p in pages],
        }, indent=1))
    else:
        print(json.dumps(pages, indent=1, ensure_ascii=False))
