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




# ---------------------------------------------------- embedded TrueType
# Lockstep mirror of graft.extract.TrueType (see its scaladoc for the
# decode contract): sfnt directory -> cmap formats 0/4/6 + post 1.0/2.0,
# code -> glyph via (1,0) > (3,0) > (3,1), glyph -> smallest Unicode from
# the (3,1)/(0,*) cmap, else post name -> AGL.
MAC_NAMES = (".notdef .null nonmarkingreturn space exclam quotedbl numbersign dollar percent ampersand quotesingle parenleft parenright asterisk plus comma hyphen period slash zero one two three four five six seven eight nine colon semicolon less equal greater question at A B C D E F G H I J K L M N O P Q R S T U V W X Y Z bracketleft backslash bracketright asciicircum underscore grave a b c d e f g h i j k l m n o p q r s t u v w x y z braceleft bar braceright asciitilde Adieresis Aring Ccedilla Eacute Ntilde Odieresis Udieresis aacute agrave acircumflex adieresis atilde aring ccedilla eacute egrave ecircumflex edieresis iacute igrave icircumflex idieresis ntilde oacute ograve ocircumflex odieresis otilde uacute ugrave ucircumflex udieresis dagger degree cent sterling section bullet paragraph germandbls registered copyright trademark acute dieresis notequal AE Oslash infinity plusminus lessequal greaterequal yen mu partialdiff summation product pi integral ordfeminine ordmasculine Omega ae oslash questiondown exclamdown logicalnot radical florin approxequal Delta guillemotleft guillemotright ellipsis nonbreakingspace Agrave Atilde Otilde OE oe endash emdash quotedblleft quotedblright quoteleft quoteright divide lozenge ydieresis Ydieresis fraction currency guilsinglleft guilsinglright fi fl daggerdbl periodcentered quotesinglbase quotedblbase perthousand Acircumflex Ecircumflex Aacute Edieresis Egrave Iacute Icircumflex Idieresis Igrave Oacute Ocircumflex apple Ograve Uacute Ucircumflex Ugrave dotlessi circumflex tilde macron breve dotaccent ring cedilla hungarumlaut ogonek caron Lslash lslash Scaron scaron Zcaron zcaron brokenbar Eth eth Yacute yacute Thorn thorn minus multiply onesuperior twosuperior threesuperior onehalf onequarter threequarters franc Gbreve gbreve Idotaccent Scedilla scedilla Cacute cacute Ccaron ccaron dcroat").split()
assert len(MAC_NAMES) == 258

AGL = {'AE': 'Æ', 'Aacute': 'Á', 'Acircumflex': 'Â', 'Adieresis': 'Ä', 
    'Agrave': 'À', 'Aring': 'Å', 'Atilde': 'Ã', 'Ccedilla': 'Ç', 
    'Eacute': 'É', 'Ecircumflex': 'Ê', 'Edieresis': 'Ë', 'Egrave': 'È', 
    'Eth': 'Ð', 'Euro': '€', 'Iacute': 'Í', 'Icircumflex': 'Î', 
    'Idieresis': 'Ï', 'Igrave': 'Ì', 'Lslash': 'Ł', 'Ntilde': 'Ñ', 'OE': 'Œ', 
    'Oacute': 'Ó', 'Ocircumflex': 'Ô', 'Odieresis': 'Ö', 'Ograve': 'Ò', 
    'Oslash': 'Ø', 'Otilde': 'Õ', 'Thorn': 'Þ', 'Uacute': 'Ú', 
    'Ucircumflex': 'Û', 'Udieresis': 'Ü', 'Ugrave': 'Ù', 'Yacute': 'Ý', 
    'aacute': 'á', 'acircumflex': 'â', 'acute': '´', 'adieresis': 'ä', 
    'ae': 'æ', 'agrave': 'à', 'ampersand': '&', 'aring': 'å', 
    'asciicircum': '^', 'asciitilde': '~', 'asterisk': '*', 'at': '@', 
    'atilde': 'ã', 'backslash': '\\', 'bar': '|', 'braceleft': '{', 
    'braceright': '}', 'bracketleft': '[', 'bracketright': ']', 'breve': '˘', 
    'brokenbar': '¦', 'bullet': '•', 'caron': 'ˇ', 'ccedilla': 'ç', 
    'cedilla': '¸', 'cent': '¢', 'circumflex': 'ˆ', 'colon': ':', 
    'comma': ',', 'copyright': '©', 'currency': '¤', 'dagger': '†', 
    'daggerdbl': '‡', 'degree': '°', 'dieresis': '¨', 'divide': '÷', 
    'dollar': '$', 'dotaccent': '˙', 'dotlessi': 'ı', 'eacute': 'é', 
    'ecircumflex': 'ê', 'edieresis': 'ë', 'egrave': 'è', 'eight': '8', 
    'ellipsis': '…', 'emdash': '—', 'endash': '–', 'equal': '=', 'eth': 'ð', 
    'exclam': '!', 'exclamdown': '¡', 'fi': 'ﬁ', 'five': '5', 'fl': 'ﬂ', 
    'florin': 'ƒ', 'four': '4', 'fraction': '⁄', 'germandbls': 'ß', 
    'grave': '`', 'greater': '>', 'guillemotleft': '«', 
    'guillemotright': '»', 'guilsinglleft': '‹', 'guilsinglright': '›', 
    'hungarumlaut': '˝', 'hyphen': '-', 'iacute': 'í', 'icircumflex': 'î', 
    'idieresis': 'ï', 'igrave': 'ì', 'less': '<', 'logicalnot': '¬', 
    'lslash': 'ł', 'macron': '¯', 'middot': '·', 'minus': '−', 'mu': 'µ', 
    'multiply': '×', 'nbspace': '\xa0', 'nine': '9', 'ntilde': 'ñ', 
    'numbersign': '#', 'oacute': 'ó', 'ocircumflex': 'ô', 'odieresis': 'ö', 
    'oe': 'œ', 'ogonek': '˛', 'ograve': 'ò', 'one': '1', 'onehalf': '½', 
    'onequarter': '¼', 'onesuperior': '¹', 'ordfeminine': 'ª', 
    'ordmasculine': 'º', 'oslash': 'ø', 'otilde': 'õ', 'paragraph': '¶', 
    'parenleft': '(', 'parenright': ')', 'percent': '%', 'period': '.', 
    'periodcentered': '·', 'plus': '+', 'plusminus': '±', 'question': '?', 
    'questiondown': '¿', 'quotedbl': '"', 'quotedblbase': '„', 
    'quotedblleft': '“', 'quotedblright': '”', 'quoteleft': '‘', 
    'quoteright': '’', 'quotesinglbase': '‚', 'quotesingle': "'", 
    'registered': '®', 'ring': '˚', 'section': '§', 'semicolon': ';', 
    'seven': '7', 'six': '6', 'slash': '/', 'softhyphen': '\xad', 
    'space': ' ', 'sterling': '£', 'thorn': 'þ', 'three': '3', 
    'threequarters': '¾', 'threesuperior': '³', 'tilde': '˜', 
    'trademark': '™', 'two': '2', 'twosuperior': '²', 'uacute': 'ú', 
    'ucircumflex': 'û', 'udieresis': 'ü', 'ugrave': 'ù', 'underscore': '_', 
    'yacute': 'ý', 'ydieresis': 'ÿ', 'yen': '¥', 'zero': '0',}



def glyph_char(name):
    """AGL-subset resolution, identical to Encodings.glyphChar."""
    if name in AGL:
        return AGL[name]
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(chr(int(name[3:][i:i + 4], 16))
                           for i in range(0, len(name) - 3, 4))
        except ValueError:
            return "\ufffd"
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except (ValueError, OverflowError):
            return "\ufffd"
    if len(name) == 1:
        return name
    return "\ufffd"


def _cmap_subtable(d, off):
    u16 = lambda p: int.from_bytes(d[p:p + 2], "big")
    fmt = u16(off)
    if fmt == 0:
        if off + 262 > len(d):
            return None
        return {c: d[off + 6 + c] for c in range(256) if d[off + 6 + c]}
    if fmt == 4:
        segx2 = u16(off + 6)
        segs = segx2 // 2
        endp, startp = off + 14, off + 14 + segx2 + 2
        deltap, rangep = startp + segx2, startp + 2 * segx2
        if rangep + segx2 > len(d):
            return None
        out = {}
        # iteration cap mirroring TrueType.scala: bounded-work degradation
        # against crafted overlapping-segment cmaps
        iters, iter_cap = 0, 1 << 20
        for s in range(segs):
            if iters >= iter_cap:
                break
            end, start = u16(endp + 2 * s), u16(startp + 2 * s)
            delta = int.from_bytes(d[deltap + 2 * s:deltap + 2 * s + 2],
                                   "big", signed=True)
            ro = u16(rangep + 2 * s)
            if start == 0xFFFF or start > end:
                continue
            for c in range(start, end + 1):
                iters += 1
                if iters > iter_cap:
                    break
                if ro == 0:
                    g = (c + delta) & 0xFFFF
                else:
                    gp = rangep + 2 * s + ro + 2 * (c - start)
                    if gp + 2 > len(d):
                        g = 0
                    else:
                        raw = u16(gp)
                        g = (raw + delta) & 0xFFFF if raw else 0
                if g:
                    out[c] = g
        return out
    if fmt == 6:
        first, cnt = u16(off + 6), u16(off + 8)
        if off + 10 + 2 * cnt > len(d):
            return None
        return {first + i: u16(off + 10 + 2 * i)
                for i in range(cnt) if u16(off + 10 + 2 * i)}
    return None


def parse_ttf(d):
    """sfnt -> decode maps; None on anything malformed (caller falls back)."""
    try:
        u16 = lambda p: int.from_bytes(d[p:p + 2], "big")
        u32 = lambda p: int.from_bytes(d[p:p + 4], "big")
        if len(d) < 12 or u32(0) not in (0x00010000, 0x74727565, 0x4F54544F):
            return None
        cmap_off = post_off = -1
        for i in range(u16(4)):
            p = 12 + 16 * i
            tag = d[p:p + 4]
            if tag == b"cmap":
                cmap_off = u32(p + 8)
            elif tag == b"post":
                post_off = u32(p + 8)
        mac10 = win30 = win31 = uni0x = None
        if cmap_off >= 0 and cmap_off + 4 <= len(d):
            for k in range(u16(cmap_off + 2)):
                e = cmap_off + 4 + 8 * k
                plat, enc = u16(e), u16(e + 2)
                m = _cmap_subtable(d, cmap_off + u32(e + 4))
                if m is None:
                    continue
                if plat == 1 and enc == 0 and mac10 is None:
                    mac10 = m
                elif plat == 3 and enc == 0 and win30 is None:
                    win30 = m
                elif plat == 3 and enc == 1 and win31 is None:
                    win31 = m
                elif plat == 0 and uni0x is None:
                    uni0x = m
        if mac10 is not None:
            c2g, symbol = mac10, False
        elif win30 is not None:
            c2g, symbol = win30, True
        elif win31 is not None:
            c2g, symbol = win31, False
        elif uni0x is not None:
            c2g, symbol = uni0x, False
        else:
            c2g, symbol = {}, False
        uni_src = win31 if win31 is not None else uni0x
        g2u = {}
        if uni_src:
            for cp, g in uni_src.items():
                if g and (g not in g2u or cp < g2u[g]):
                    g2u[g] = cp
        gnames = {}
        if post_off >= 0 and post_off + 34 <= len(d):
            ver = u32(post_off)
            if ver == 0x00010000:
                gnames = dict(enumerate(MAC_NAMES))
            elif ver == 0x00020000:
                num = u16(post_off + 32)
                idx = [u16(post_off + 34 + 2 * g) for g in range(num)]
                custom, p = [], post_off + 34 + 2 * num
                while p < len(d) and len(custom) < num:
                    ln = d[p]
                    if p + 1 + ln > len(d):
                        break
                    custom.append(d[p + 1:p + 1 + ln].decode("ascii"))
                    p += 1 + ln
                for g, ix in enumerate(idx):
                    if ix < 258:
                        gnames[g] = MAC_NAMES[ix]
                    elif ix - 258 < len(custom):
                        gnames[g] = custom[ix - 258]
        if not c2g and not g2u and not gnames:
            return None
        return {"c2g": c2g, "symbol": symbol, "g2u": g2u, "names": gnames}
    except Exception:
        return None


def ttf_decode(t, code):
    g = t["c2g"].get(code)
    if g is None and t["symbol"]:
        g = t["c2g"].get(0xF000 | code)
    if not g:
        return None
    if g in t["g2u"]:
        return chr(t["g2u"][g])
    if g in t["names"]:
        s = glyph_char(t["names"][g])
        if s and s != "\ufffd":
            return s
    return None


# ---------------------------------------------------- embedded CFF (Type1C)
# Lockstep mirror of graft.extract.Cff (see its scaladoc for the decode
# contract): header -> INDEX/DICT structures, charset formats 0/1/2,
# encodings 0/1 (+ supplements), the 391 standard strings; predefined
# standard encoding decodes straight through Adobe StandardEncoding;
# CID-keyed (/ROS) and Expert flavors are rejected.
CFF_STD_STRINGS = (".notdef space exclam quotedbl numbersign dollar percent ampersand quoteright parenleft parenright asterisk plus comma hyphen period slash zero one two three four five six seven eight nine colon semicolon less equal greater question at A B C D E F G H I J K L M N O P Q R S T U V W X Y Z bracketleft backslash bracketright asciicircum underscore quoteleft a b c d e f g h i j k l m n o p q r s t u v w x y z braceleft bar braceright asciitilde exclamdown cent sterling fraction yen florin section currency quotesingle quotedblleft guillemotleft guilsinglleft guilsinglright fi fl endash dagger daggerdbl periodcentered paragraph bullet quotesinglbase quotedblbase quotedblright guillemotright ellipsis perthousand questiondown grave acute circumflex tilde macron breve dotaccent dieresis ring cedilla hungarumlaut ogonek caron emdash AE ordfeminine Lslash Oslash OE ordmasculine ae dotlessi lslash oslash oe germandbls onesuperior logicalnot mu trademark Eth onehalf plusminus Thorn onequarter divide brokenbar degree thorn threequarters twosuperior registered minus eth multiply threesuperior copyright Aacute Acircumflex Adieresis Agrave Aring Atilde Ccedilla Eacute Ecircumflex Edieresis Egrave Iacute Icircumflex Idieresis Igrave Ntilde Oacute Ocircumflex Odieresis Ograve Otilde Scaron Uacute Ucircumflex Udieresis Ugrave Yacute Ydieresis Zcaron aacute acircumflex adieresis agrave aring atilde ccedilla eacute ecircumflex edieresis egrave iacute icircumflex idieresis igrave ntilde oacute ocircumflex odieresis ograve otilde scaron uacute ucircumflex udieresis ugrave yacute ydieresis zcaron exclamsmall Hungarumlautsmall dollaroldstyle dollarsuperior ampersandsmall Acutesmall parenleftsuperior parenrightsuperior twodotenleader onedotenleader zerooldstyle oneoldstyle twooldstyle threeoldstyle fouroldstyle fiveoldstyle sixoldstyle sevenoldstyle eightoldstyle nineoldstyle commasuperior threequartersemdash periodsuperior questionsmall asuperior bsuperior centsuperior dsuperior esuperior isuperior lsuperior msuperior nsuperior osuperior rsuperior ssuperior tsuperior ff ffi ffl parenleftinferior parenrightinferior Circumflexsmall hyphensuperior Gravesmall Asmall Bsmall Csmall Dsmall Esmall Fsmall Gsmall Hsmall Ismall Jsmall Ksmall Lsmall Msmall Nsmall Osmall Psmall Qsmall Rsmall Ssmall Tsmall Usmall Vsmall Wsmall Xsmall Ysmall Zsmall colonmonetary onefitted rupiah Tildesmall exclamdownsmall centoldstyle Lslashsmall Scaronsmall Zcaronsmall Dieresissmall Brevesmall Caronsmall Dotaccentsmall Macronsmall figuredash hypheninferior Ogoneksmall Ringsmall Cedillasmall questiondownsmall oneeighth threeeighths fiveeighths seveneighths onethird twothirds zerosuperior foursuperior fivesuperior sixsuperior sevensuperior eightsuperior ninesuperior zeroinferior oneinferior twoinferior threeinferior fourinferior fiveinferior sixinferior seveninferior eightinferior nineinferior centinferior dollarinferior periodinferior commainferior Agravesmall Aacutesmall Acircumflexsmall Atildesmall Adieresissmall Aringsmall AEsmall Ccedillasmall Egravesmall Eacutesmall Ecircumflexsmall Edieresissmall Igravesmall Iacutesmall Icircumflexsmall Idieresissmall Ethsmall Ntildesmall Ogravesmall Oacutesmall Ocircumflexsmall Otildesmall Odieresissmall OEsmall Oslashsmall Ugravesmall Uacutesmall Ucircumflexsmall Udieresissmall Yacutesmall Thornsmall Ydieresissmall 001.000 001.001 001.002 001.003 Black Bold Book Light Medium Regular Roman Semibold").split()
assert len(CFF_STD_STRINGS) == 391

# Adobe StandardEncoding (mirror of graft.extract.Encodings.standard)
STANDARD_ENC = {c: chr(c) for c in range(32, 127)}
STANDARD_ENC.update({
    0x27: "\u2019", 0x60: "\u2018",
    0xa1: "\u00a1", 0xa2: "\u00a2", 0xa3: "\u00a3", 0xa4: "\u2044", 0xa5: "\u00a5",
    0xa6: "\u0192", 0xa7: "\u00a7", 0xa8: "\u00a4", 0xa9: "'", 0xaa: "\u201c",
    0xab: "\u00ab", 0xac: "\u2039", 0xad: "\u203a", 0xae: "\ufb01", 0xaf: "\ufb02",
    0xb1: "\u2013", 0xb2: "\u2020", 0xb3: "\u2021", 0xb4: "\u00b7", 0xb6: "\u00b6",
    0xb7: "\u2022", 0xb8: "\u201a", 0xb9: "\u201e", 0xba: "\u201d", 0xbb: "\u00bb",
    0xbc: "\u2026", 0xbd: "\u2030", 0xbf: "\u00bf", 0xc1: "`", 0xc2: "\u00b4",
    0xc3: "\u02c6", 0xc4: "\u02dc", 0xc5: "\u00af", 0xc6: "\u02d8", 0xc7: "\u02d9",
    0xc8: "\u00a8", 0xca: "\u02da", 0xcb: "\u00b8", 0xcd: "\u02dd", 0xce: "\u02db",
    0xcf: "\u02c7", 0xd0: "\u2014", 0xe1: "\u00c6", 0xe3: "\u00aa", 0xe8: "\u0141",
    0xe9: "\u00d8", 0xea: "\u0152", 0xeb: "\u00ba", 0xf1: "\u00e6", 0xf5: "\u0131",
    0xf8: "\u0142", 0xf9: "\u00f8", 0xfa: "\u0153", 0xfb: "\u00df"})


def _cff_index(d, p):
    """INDEX at p -> (entries, position after)."""
    u16 = lambda q: int.from_bytes(d[q:q + 2], "big")
    count = u16(p)
    if count == 0:
        return [], p + 2
    off_size = d[p + 2]
    if not 1 <= off_size <= 4:
        raise ValueError("INDEX offSize")
    offs = [int.from_bytes(d[p + 3 + off_size * i:p + 3 + off_size * (i + 1)], "big")
            for i in range(count + 1)]
    data = p + 3 + off_size * (count + 1) - 1  # offsets are 1-based
    entries = []
    for i in range(count):
        a, b = data + offs[i], data + offs[i + 1]
        if a < 0 or b < a or b > len(d):
            raise ValueError("INDEX entry out of bounds")
        entries.append(d[a:b])
    return entries, data + offs[count]


def _cff_dict(b):
    """DICT bytes -> {op (escaped = 1200+b): [operands]}."""
    out, operands, p = {}, [], 0
    while p < len(b):
        b0 = b[p]
        if b0 <= 21:
            if b0 == 12:
                p += 1
                op = 1200 + b[p]
            else:
                op = b0
            out[op] = operands
            operands = []
            p += 1
        elif 32 <= b0 <= 246:
            operands.append(b0 - 139)
            p += 1
        elif 247 <= b0 <= 250:
            operands.append((b0 - 247) * 256 + b[p + 1] + 108)
            p += 2
        elif 251 <= b0 <= 254:
            operands.append(-(b0 - 251) * 256 - b[p + 1] - 108)
            p += 2
        elif b0 == 28:
            operands.append(int.from_bytes(b[p + 1:p + 3], "big", signed=True))
            p += 3
        elif b0 == 29:
            operands.append(int.from_bytes(b[p + 1:p + 5], "big", signed=True))
            p += 5
        elif b0 == 30:  # packed-BCD real: skip nibbles to terminator
            p += 1
            s, done = "", False
            while not done and p < len(b):
                for nib in (b[p] >> 4, b[p] & 0xF):
                    if done:
                        continue
                    if nib == 0xF:
                        done = True
                    elif nib == 0xA:
                        s += "."
                    elif nib == 0xB:
                        s += "E"
                    elif nib == 0xC:
                        s += "E-"
                    elif nib == 0xE:
                        s += "-"
                    elif nib != 0xD:
                        s += chr(ord("0") + nib)
                p += 1
            try:
                operands.append(float(s))
            except ValueError:
                operands.append(0.0)
        else:
            p += 1
    return out


def parse_cff(d):
    """CFF -> decode maps; None on CID-keyed/Expert/malformed."""
    try:
        if len(d) < 4 or d[0] != 1:
            return None
        u8 = lambda p: d[p]
        u16 = lambda p: int.from_bytes(d[p:p + 2], "big")
        _, after_names = _cff_index(d, d[2])
        tops, after_top = _cff_index(d, after_names)
        if not tops:
            return None
        top = _cff_dict(tops[0])
        if 1230 in top:  # /ROS: CID-keyed, charset = CIDs
            return None
        string_idx, _ = _cff_index(d, after_top)
        strings = [s.decode("ascii", "replace") for s in string_idx]
        cs_off = int(top.get(17, [0])[0]) if top.get(17) else -1
        if cs_off <= 0 or cs_off >= len(d):
            return None
        charstrings, _ = _cff_index(d, cs_off)
        n_glyphs = len(charstrings)
        if n_glyphs == 0:
            return None
        # charset: glyph -> SID
        charset_off = int(top.get(15, [0])[0]) if top.get(15) else 0
        gsid = [0] * n_glyphs
        if charset_off == 0:  # predefined ISOAdobe: identity
            gsid = list(range(n_glyphs))
        elif charset_off in (1, 2):  # predefined Expert charsets
            return None
        else:
            fmt = u8(charset_off)
            if fmt == 0:
                for g in range(1, n_glyphs):
                    gsid[g] = u16(charset_off + 1 + 2 * (g - 1))
            elif fmt in (1, 2):
                g, p = 1, charset_off + 1
                while g < n_glyphs:
                    first = u16(p)
                    n_left = u8(p + 2) if fmt == 1 else u16(p + 2)
                    p += 3 if fmt == 1 else 4
                    k = 0
                    while k <= n_left and g < n_glyphs:
                        gsid[g] = first + k
                        g += 1
                        k += 1
            else:
                return None
        # encoding: code -> glyph
        enc_off = int(top.get(16, [0])[0]) if top.get(16) else 0
        if enc_off == 0:
            return {"std": True, "c2g": {}, "gsid": gsid, "strings": strings}
        if enc_off == 1:  # predefined Expert encoding
            return None
        fmt_byte = u8(enc_off)
        c2g = {}
        sup_start = -1
        if (fmt_byte & 0x7F) == 0:
            n_codes = u8(enc_off + 1)
            for i in range(1, n_codes + 1):
                c2g[u8(enc_off + 1 + i)] = i
            sup_start = enc_off + 2 + n_codes
        elif (fmt_byte & 0x7F) == 1:
            n_ranges = u8(enc_off + 1)
            g = 1
            for k in range(n_ranges):
                first = u8(enc_off + 2 + 2 * k)
                n_left = u8(enc_off + 2 + 2 * k + 1)
                for j in range(n_left + 1):
                    c2g[first + j] = g
                    g += 1
            sup_start = enc_off + 2 + 2 * n_ranges
        else:
            return None
        if (fmt_byte & 0x80) and 0 <= sup_start < len(d):
            # mirror Scala's toMap (last duplicate SID wins)
            sid_to_glyph = {}
            for g, sid in enumerate(gsid):
                sid_to_glyph[sid] = g
            for k in range(u8(sup_start)):
                code = u8(sup_start + 1 + 3 * k)
                sid = u16(sup_start + 1 + 3 * k + 1)
                if sid in sid_to_glyph:
                    c2g[code] = sid_to_glyph[sid]
        return {"std": False, "c2g": c2g, "gsid": gsid, "strings": strings}
    except Exception:
        return None


def cff_decode(t, code):
    if t["std"]:
        return STANDARD_ENC.get(code)
    g = t["c2g"].get(code)
    if not g:
        return None
    if g >= len(t["gsid"]):
        return None
    sid = t["gsid"][g]
    if sid < 391:
        name = CFF_STD_STRINGS[sid]
    elif sid - 391 < len(t["strings"]):
        name = t["strings"][sid - 391]
    else:
        return None
    s = glyph_char(name)
    if s and s != "\ufffd":
        return s
    return None


# ---------------------------------------------------- embedded Type1
# Lockstep mirror of graft.extract.Type1: the /Encoding lives in the
# CLEARTEXT portion (dup <code> /<name> put, or the literal
# StandardEncoding) — no eexec decryption needed for text decode.
import re as _re
_T1_DUP = _re.compile(r"dup\s+(\d+)\s*/([^\s/{}()\[\]]+)\s+put")


def parse_type1(d):
    try:
        if len(d) < 2:
            return None
        if d[0] == 0x80 and d[1] == 1 and len(d) >= 6:
            ln = int.from_bytes(d[2:6], "little")
            start, limit = 6, min(6 + max(ln, 0), len(d))
        else:
            start, limit = 0, len(d)
        head = d[start:limit].decode("latin-1")
        if "%!" not in head:
            return None
        e = head.find("eexec")
        clear = head[:e] if e >= 0 else head
        enc_at = clear.find("/Encoding")
        if enc_at < 0:
            return None
        tail = clear[enc_at:]
        first_dup = tail.find("dup ")
        std_at = tail.find("StandardEncoding")
        if std_at >= 0 and (first_dup < 0 or std_at < first_dup):
            return {"std": True, "names": {}}
        names = {int(m.group(1)): m.group(2) for m in _T1_DUP.finditer(tail)}
        if not names:
            return None
        return {"std": False, "names": names}
    except Exception:
        return None


def t1_decode(t, code):
    if t["std"]:
        return STANDARD_ENC.get(code)
    name = t["names"].get(code)
    if name is None:
        return None
    s = glyph_char(name)
    if s and s != "�":
        return s
    return None


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
    ttf = cff = t1 = None
    if "FontDescriptor" in fd:
        desc = resolve(fd["FontDescriptor"])[1]
        if "FontFile2" in desc:
            try:
                ttf = parse_ttf(decoded(desc["FontFile2"]))
            except Exception:
                ttf = None
        if ttf is None and "FontFile3" in desc:
            # CFF/Type1C sibling; a parsed FontFile2 wins (mirror of
            # graft.extract.PdfText parseFont's orElse chain)
            try:
                cff = parse_cff(decoded(desc["FontFile3"]))
            except Exception:
                cff = None
        if ttf is None and cff is None and "FontFile" in desc:
            try:
                t1 = parse_type1(decoded(desc["FontFile"]))
            except Exception:
                t1 = None
    return {"two": False, "touni": touni, "enc": enc, "w": widths,
            "dw": 500.0, "ttf": ttf, "cff": cff, "t1": t1}


def fdecode(f, code):
    if code in f["touni"]:
        return f["touni"][code]
    if code in f["enc"]:
        return f["enc"][code]
    if not f["two"] and f.get("ttf"):
        s = ttf_decode(f["ttf"], code)
        if s is not None:
            return s
    if not f["two"] and f.get("cff"):
        s = cff_decode(f["cff"], code)
        if s is not None:
            return s
    if not f["two"] and f.get("t1"):
        s = t1_decode(f["t1"], code)
        if s is not None:
            return s
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
