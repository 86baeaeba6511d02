package graft.extract

/** Simple-font character encodings (PDF 32000-1 Annex D) and a practical
  * Adobe-Glyph-List subset for /Differences resolution — public published
  * tables, written out from the spec (not extracted from any library).
  * Priority in [[PdfText]] is always /ToUnicode first; these cover the
  * legacy corpus without CMaps.
  */
private[graft] object Encodings {

  /** cp1252's 0x80-0x9F block — the only place WinAnsi differs from
    * Latin-1 (Annex D Table D.2; unmapped codes omitted).
    */
  private val winAnsiHigh: Map[Int, String] = Map(
    0x80 -> "€", 0x82 -> "‚", 0x83 -> "ƒ", 0x84 -> "„", 0x85 -> "…",
    0x86 -> "†", 0x87 -> "‡", 0x88 -> "ˆ", 0x89 -> "‰", 0x8a -> "Š",
    0x8b -> "‹", 0x8c -> "Œ", 0x8e -> "Ž", 0x91 -> "‘", 0x92 -> "’",
    0x93 -> "“", 0x94 -> "”", 0x95 -> "•", 0x96 -> "–", 0x97 -> "—",
    0x98 -> "˜", 0x99 -> "™", 0x9a -> "š", 0x9b -> "›", 0x9c -> "œ",
    0x9e -> "ž", 0x9f -> "Ÿ")

  private val winAnsi: Map[Int, String] =
    (32 to 126).map(c => c -> c.toChar.toString).toMap ++
      winAnsiHigh ++
      (0xa0 to 0xff).map(c => c -> c.toChar.toString).toMap

  /** MacRomanEncoding's 0x80-0xFF block (Annex D Table D.2). */
  private val macRomanHigh: String =
    "ÄÅÇÉÑÖÜáàâäãåçéè" + // 0x80
      "êëíìîïñóòôöõúùûü" + // 0x90
      "†°¢£§•¶ß®©™´¨≠ÆØ" + // 0xA0
      "∞±≤≥¥µ∂∑∏π∫ªºΩæø" + // 0xB0
      "¿¡¬√ƒ≈∆«»… ÀÃÕŒœ" + // 0xC0 (0xCA = nbsp)
      "–—“”‘’÷◊ÿŸ⁄€‹›ﬁﬂ" + // 0xD0
      "‡·‚„‰ÂÊÁËÈÍÎÏÌÓÔ" + // 0xE0
      "ÒÚÛÙıˆ˜¯˘˙˚¸˝˛ˇ" // 0xF0 (0xF0 = Apple logo, PUA)

  private val macRoman: Map[Int, String] =
    (32 to 126).map(c => c -> c.toChar.toString).toMap ++
      (0x80 to 0xff).map(c => c -> macRomanHigh(c - 0x80).toString).toMap

  /** Adobe StandardEncoding: ASCII except the typographic quotes, plus the
    * Annex D high block (ligatures, dashes, daggers; unmapped codes omitted).
    */
  private val standard: Map[Int, String] =
    (32 to 126).map(c => c -> c.toChar.toString).toMap ++ Map(
      0x27 -> "’", 0x60 -> "‘",
      0xa1 -> "¡", 0xa2 -> "¢", 0xa3 -> "£", 0xa4 -> "⁄", 0xa5 -> "¥",
      0xa6 -> "ƒ", 0xa7 -> "§", 0xa8 -> "¤", 0xa9 -> "'", 0xaa -> "“",
      0xab -> "«", 0xac -> "‹", 0xad -> "›", 0xae -> "ﬁ", 0xaf -> "ﬂ",
      0xb1 -> "–", 0xb2 -> "†", 0xb3 -> "‡", 0xb4 -> "·", 0xb6 -> "¶",
      0xb7 -> "•", 0xb8 -> "‚", 0xb9 -> "„", 0xba -> "”", 0xbb -> "»",
      0xbc -> "…", 0xbd -> "‰", 0xbf -> "¿", 0xc1 -> "`", 0xc2 -> "´",
      0xc3 -> "ˆ", 0xc4 -> "˜", 0xc5 -> "¯", 0xc6 -> "˘", 0xc7 -> "˙",
      0xc8 -> "¨", 0xca -> "˚", 0xcb -> "¸", 0xcd -> "˝", 0xce -> "˛",
      0xcf -> "ˇ", 0xd0 -> "—", 0xe1 -> "Æ", 0xe3 -> "ª", 0xe8 -> "Ł",
      0xe9 -> "Ø", 0xea -> "Œ", 0xeb -> "º", 0xf1 -> "æ", 0xf5 -> "ı",
      0xf8 -> "ł", 0xf9 -> "ø", 0xfa -> "œ", 0xfb -> "ß")

  def base(name: String): Map[Int, String] = name match {
    case "WinAnsiEncoding" => winAnsi
    case "MacRomanEncoding" => macRoman
    case "StandardEncoding" => standard
    case _ => Map.empty
  }

  /** AGL subset: the names core Latin documents actually use; `uniXXXX` and
    * `uXXXX[XX]` parse positionally. Unknown names → U+FFFD (honest failure,
    * not a silent drop).
    */
  private val glyphs: Map[String, String] = Map(
    "space" -> " ", "exclam" -> "!", "quotedbl" -> "\"", "numbersign" -> "#",
    "dollar" -> "$", "percent" -> "%", "ampersand" -> "&", "quotesingle" -> "'",
    "parenleft" -> "(", "parenright" -> ")", "asterisk" -> "*", "plus" -> "+",
    "comma" -> ",", "hyphen" -> "-", "period" -> ".", "slash" -> "/",
    "zero" -> "0", "one" -> "1", "two" -> "2", "three" -> "3", "four" -> "4",
    "five" -> "5", "six" -> "6", "seven" -> "7", "eight" -> "8", "nine" -> "9",
    "colon" -> ":", "semicolon" -> ";", "less" -> "<", "equal" -> "=",
    "greater" -> ">", "question" -> "?", "at" -> "@", "bracketleft" -> "[",
    "backslash" -> "\\", "bracketright" -> "]", "asciicircum" -> "^",
    "underscore" -> "_", "grave" -> "`", "braceleft" -> "{", "bar" -> "|",
    "braceright" -> "}", "asciitilde" -> "~",
    "quoteleft" -> "‘", "quoteright" -> "’", "quotedblleft" -> "“",
    "quotedblright" -> "”", "quotesinglbase" -> "‚", "quotedblbase" -> "„",
    "endash" -> "–", "emdash" -> "—", "bullet" -> "•", "ellipsis" -> "…",
    "dagger" -> "†", "daggerdbl" -> "‡", "trademark" -> "™", "copyright" -> "©",
    "registered" -> "®", "degree" -> "°", "plusminus" -> "±", "multiply" -> "×",
    "divide" -> "÷", "minus" -> "−", "fraction" -> "⁄", "florin" -> "ƒ",
    "cent" -> "¢", "sterling" -> "£", "yen" -> "¥", "Euro" -> "€",
    "currency" -> "¤", "section" -> "§", "paragraph" -> "¶",
    "periodcentered" -> "·", "middot" -> "·", "guillemotleft" -> "«",
    "guillemotright" -> "»", "guilsinglleft" -> "‹", "guilsinglright" -> "›",
    "exclamdown" -> "¡", "questiondown" -> "¿", "fi" -> "ﬁ", "fl" -> "ﬂ",
    "germandbls" -> "ß", "ae" -> "æ", "AE" -> "Æ", "oe" -> "œ", "OE" -> "Œ",
    "oslash" -> "ø", "Oslash" -> "Ø", "aring" -> "å", "Aring" -> "Å",
    "agrave" -> "à", "aacute" -> "á", "acircumflex" -> "â", "atilde" -> "ã",
    "adieresis" -> "ä", "egrave" -> "è", "eacute" -> "é", "ecircumflex" -> "ê",
    "edieresis" -> "ë", "igrave" -> "ì", "iacute" -> "í", "icircumflex" -> "î",
    "idieresis" -> "ï", "ograve" -> "ò", "oacute" -> "ó", "ocircumflex" -> "ô",
    "otilde" -> "õ", "odieresis" -> "ö", "ugrave" -> "ù", "uacute" -> "ú",
    "ucircumflex" -> "û", "udieresis" -> "ü", "ntilde" -> "ñ", "ccedilla" -> "ç",
    "yacute" -> "ý", "ydieresis" -> "ÿ", "Agrave" -> "À", "Aacute" -> "Á",
    "Acircumflex" -> "Â", "Atilde" -> "Ã", "Adieresis" -> "Ä", "Egrave" -> "È",
    "Eacute" -> "É", "Ecircumflex" -> "Ê", "Edieresis" -> "Ë", "Igrave" -> "Ì",
    "Iacute" -> "Í", "Icircumflex" -> "Î", "Idieresis" -> "Ï", "Ograve" -> "Ò",
    "Oacute" -> "Ó", "Ocircumflex" -> "Ô", "Otilde" -> "Õ", "Odieresis" -> "Ö",
    "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucircumflex" -> "Û", "Udieresis" -> "Ü",
    "Ntilde" -> "Ñ", "Ccedilla" -> "Ç", "Yacute" -> "Ý", "eth" -> "ð",
    "Eth" -> "Ð", "thorn" -> "þ", "Thorn" -> "Þ", "Lslash" -> "Ł",
    "lslash" -> "ł", "dotlessi" -> "ı", "circumflex" -> "ˆ", "caron" -> "ˇ",
    "breve" -> "˘", "dotaccent" -> "˙", "ring" -> "˚", "ogonek" -> "˛",
    "tilde" -> "˜", "hungarumlaut" -> "˝", "cedilla" -> "¸", "macron" -> "¯",
    "dieresis" -> "¨", "acute" -> "´", "brokenbar" -> "¦", "logicalnot" -> "¬",
    "mu" -> "µ", "onequarter" -> "¼", "onehalf" -> "½", "threequarters" -> "¾",
    "onesuperior" -> "¹", "twosuperior" -> "²", "threesuperior" -> "³",
    "ordfeminine" -> "ª", "ordmasculine" -> "º", "softhyphen" -> "­",
    "nbspace" -> " ")

  def glyphChar(name: String): String =
    glyphs.get(name) match {
      case Some(s) => s
      case None =>
        if (name.startsWith("uni") && name.length >= 7)
          try {
            // uniXXXX (or several XXXX groups concatenated)
            name.drop(3).grouped(4)
              .map(h => Integer.parseInt(h, 16).toChar).mkString
          } catch { case _: NumberFormatException => "�" }
        else if (name.startsWith("u") && name.length >= 5 && name.length <= 7)
          try new String(Character.toChars(Integer.parseInt(name.drop(1), 16)))
          catch { case _: Exception => "�" }
        else if (name.length == 1) name // single-letter names map to themselves
        else "�"
    }
}
