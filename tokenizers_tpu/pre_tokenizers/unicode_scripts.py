"""UnicodeScripts pre-tokenizer: split on Unicode script changes (SPM-style).

Reference `tokenizers/src/pre_tokenizers/unicode_scripts/`: the 2,095-line
generated script table is replaced here by probing the `regex` module's
Script property with per-codepoint caching (same Unicode partition), with the
reference's `fixed_script` adjustments: 0x30FC and Hiragana/Katakana fold into
Han, space is Any, unassigned chars are Any.
"""

from __future__ import annotations

from functools import lru_cache

import regex as _re

from ..pretokenized import PreTokenizedString
from . import PreTokenizer

# Ordered by rough frequency to keep probing cheap.
_SCRIPT_NAMES = [
    "Latin", "Common", "Han", "Cyrillic", "Arabic", "Devanagari", "Hiragana",
    "Katakana", "Hangul", "Thai", "Greek", "Hebrew", "Inherited", "Bengali",
    "Tamil", "Telugu", "Kannada", "Malayalam", "Gujarati", "Gurmukhi", "Oriya",
    "Sinhala", "Myanmar", "Khmer", "Lao", "Tibetan", "Georgian", "Armenian",
    "Ethiopic", "Mongolian", "Thaana", "Syriac", "Cherokee", "Canadian_Aboriginal",
    "Ogham", "Runic", "Tagalog", "Hanunoo", "Buhid", "Tagbanwa", "Limbu",
    "Tai_Le", "Braille", "Bopomofo", "Yi", "Adlam", "Ahom", "Anatolian_Hieroglyphs",
    "Avestan", "Balinese", "Bamum", "Bassa_Vah", "Batak", "Bhaiksuki", "Brahmi",
    "Buginese", "Carian", "Caucasian_Albanian", "Chakma", "Cham", "Coptic",
    "Cuneiform", "Cypriot", "Deseret", "Dogra", "Duployan", "Egyptian_Hieroglyphs",
    "Elbasan", "Elymaic", "Glagolitic", "Gothic", "Grantha", "Gunjala_Gondi",
    "Hanifi_Rohingya", "Hatran", "Imperial_Aramaic", "Inscriptional_Pahlavi",
    "Inscriptional_Parthian", "Javanese", "Kaithi", "Kayah_Li", "Kharoshthi",
    "Khojki", "Khudawadi", "Lepcha", "Linear_A", "Linear_B", "Lisu", "Lycian",
    "Lydian", "Mahajani", "Makasar", "Mandaic", "Manichaean", "Marchen",
    "Masaram_Gondi", "Medefaidrin", "Meetei_Mayek", "Mende_Kikakui", "Meroitic_Cursive",
    "Meroitic_Hieroglyphs", "Miao", "Modi", "Mro", "Multani", "Nabataean",
    "Nandinagari", "New_Tai_Lue", "Newa", "Nko", "Nushu", "Nyiakeng_Puachue_Hmong",
    "Ol_Chiki", "Old_Hungarian", "Old_Italic", "Old_North_Arabian", "Old_Permic",
    "Old_Persian", "Old_Sogdian", "Old_South_Arabian", "Old_Turkic", "Osage",
    "Osmanya", "Pahawh_Hmong", "Palmyrene", "Pau_Cin_Hau", "Phags_Pa", "Phoenician",
    "Psalter_Pahlavi", "Rejang", "Samaritan", "Saurashtra", "Sharada", "Shavian",
    "Siddham", "SignWriting", "Sogdian", "Sora_Sompeng", "Soyombo", "Sundanese",
    "Syloti_Nagri", "Tai_Tham", "Tai_Viet", "Takri", "Tangut", "Tifinagh",
    "Tirhuta", "Ugaritic", "Vai", "Wancho", "Warang_Citi", "Zanabazar_Square",
]

_SCRIPT_RES = None


def _script_res():
    global _SCRIPT_RES
    if _SCRIPT_RES is None:
        _SCRIPT_RES = [
            (name, _re.compile(rf"\p{{Script={name}}}")) for name in _SCRIPT_NAMES
        ]
    return _SCRIPT_RES


@lru_cache(maxsize=None)
def get_script(c: str) -> str:
    for name, rx in _script_res():
        if rx.match(c):
            return name
    return "Any"


@lru_cache(maxsize=None)
def fixed_script(c: str) -> str:
    """Reference `unicode_scripts/pre_tokenizer.rs:25-38`."""
    if ord(c) == 0x30FC:
        return "Han"
    if c == " ":
        return "Any"
    raw = get_script(c)
    if raw in ("Hiragana", "Katakana"):
        return "Han"
    return raw


class UnicodeScripts(PreTokenizer):
    def pre_tokenize(self, pretokenized: PreTokenizedString) -> None:
        def split_fn(i, normalized):
            last_script = None
            offset = 0
            ranges = []
            for c in normalized.get():
                script = fixed_script(c)
                if (
                    script != "Any"
                    and last_script != "Any"
                    and last_script != script
                ):
                    ranges.append(offset)
                offset += len(c.encode("utf-8"))
                if script != "Any":
                    last_script = script
            ranges.append(len(normalized))
            out = []
            for a, b in zip(ranges, ranges[1:]):
                sliced = normalized.slice(a, b, "normalized")
                if sliced is None:
                    raise RuntimeError("NormalizedString bad split")
                out.append(sliced)
            return out

        pretokenized.split(split_fn)
