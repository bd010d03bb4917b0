"""Romaji→katakana prefix expansion — the RK half of the reference's
``prefix_rk_search`` [G: lib/proc.c · func prefix_rk_search; grn_pat rk
cursor], used for type-ahead completion: a romaji prefix like "niho"
matches katakana lexicon terms reading ニホ….

A standard Hepburn syllable table (public knowledge) drives a small
recursive expansion: the romaji prefix is segmented greedily over the
table; a trailing partial syllable expands to every kana whose reading
starts with it; doubled consonants emit the sokuon ッ. The result is a
SET OF KANA PREFIXES, each resolved against the lexicon with the same
range scan as QL ``word*`` — so the lexicon side is one pruned pyarrow
scan per kana prefix, no Spark job.
"""

from __future__ import annotations

# Hepburn romanization, base syllabary + youon digraphs (katakana).
RK_TABLE: dict[str, str] = {
    "a": "ア", "i": "イ", "u": "ウ", "e": "エ", "o": "オ",
    "ka": "カ", "ki": "キ", "ku": "ク", "ke": "ケ", "ko": "コ",
    "ga": "ガ", "gi": "ギ", "gu": "グ", "ge": "ゲ", "go": "ゴ",
    "sa": "サ", "shi": "シ", "su": "ス", "se": "セ", "so": "ソ",
    "za": "ザ", "ji": "ジ", "zu": "ズ", "ze": "ゼ", "zo": "ゾ",
    "ta": "タ", "chi": "チ", "tsu": "ツ", "te": "テ", "to": "ト",
    "da": "ダ", "de": "デ", "do": "ド",
    "na": "ナ", "ni": "ニ", "nu": "ヌ", "ne": "ネ", "no": "ノ",
    "ha": "ハ", "hi": "ヒ", "fu": "フ", "he": "ヘ", "ho": "ホ",
    "ba": "バ", "bi": "ビ", "bu": "ブ", "be": "ベ", "bo": "ボ",
    "pa": "パ", "pi": "ピ", "pu": "プ", "pe": "ペ", "po": "ポ",
    "ma": "マ", "mi": "ミ", "mu": "ム", "me": "メ", "mo": "モ",
    "ya": "ヤ", "yu": "ユ", "yo": "ヨ",
    "ra": "ラ", "ri": "リ", "ru": "ル", "re": "レ", "ro": "ロ",
    "wa": "ワ", "wo": "ヲ", "n": "ン",
    "hu": "フ",  # input alias (Hepburn writes fu)
    "kya": "キャ", "kyu": "キュ", "kyo": "キョ",
    "gya": "ギャ", "gyu": "ギュ", "gyo": "ギョ",
    "sha": "シャ", "shu": "シュ", "sho": "ショ",
    "ja": "ジャ", "ju": "ジュ", "jo": "ジョ",
    "cha": "チャ", "chu": "チュ", "cho": "チョ",
    "nya": "ニャ", "nyu": "ニュ", "nyo": "ニョ",
    "hya": "ヒャ", "hyu": "ヒュ", "hyo": "ヒョ",
    "bya": "ビャ", "byu": "ビュ", "byo": "ビョ",
    "pya": "ピャ", "pyu": "ピュ", "pyo": "ピョ",
    "mya": "ミャ", "myu": "ミュ", "myo": "ミョ",
    "rya": "リャ", "ryu": "リュ", "ryo": "リョ",
}

_CONSONANTS = "kgsztdnhbpmyrw"


def rk_expand(romaji: str) -> list[str]:
    """Romaji prefix → sorted minimal set of katakana prefixes covering
    every reading that starts with it. Empty input → [""] (everything)."""
    out: set[str] = set()

    def go(s: str, acc: str) -> None:
        if not s:
            out.add(acc)
            return
        # Hepburn n': explicit syllabic ン before a vowel/y (kon'nichiwa
        # → コンニチワ) — without the apostrophe "n"+vowel reads as the
        # ナ-row syllable
        if s.startswith("n'"):
            go(s[2:], acc + "ン")
            return
        # Hepburn writes the sokuon before ch as t (matcha → マッチャ)
        if s.startswith("tch"):
            go(s[1:], acc + "ッ")
            return
        if s == "tc":  # partial of tch…: every continuation is ッチ…
            out.add(acc + "ッチ")
            return
        # sokuon: doubled consonant (tta → ッタ); "n" before consonant is
        # the syllabic ン handled by the table entry "n"
        if (len(s) >= 2 and s[0] == s[1] and s[0] in _CONSONANTS
                and s[0] != "n"):
            go(s[1:], acc + "ッ")
            return
        matched = False
        for r, k in RK_TABLE.items():
            if s.startswith(r):
                # syllabic ン only before a consonant or at the end —
                # before a vowel/y Hepburn writes n' (the plain "n…"
                # reading is the ナ-row syllable instead)
                if r == "n" and len(s) > 1 and s[1] in "aiueoy":
                    continue
                go(s[len(r):], acc + k)
                matched = True
        # trailing partial syllable: every kana whose reading starts
        # with the remainder is a possible continuation
        partial = {k for r, k in RK_TABLE.items()
                   if r.startswith(s) and r != s}
        for k in partial:
            out.add(acc + k)
            matched = True
        if not matched and not partial:
            return  # dead branch (unpronounceable remainder)

    go(romaji.strip().lower(), "")
    # drop prefixes shadowed by a shorter one (ニ covers ニャ …)
    mins = [p for p in sorted(out)
            if not any(q != p and p.startswith(q) for q in out)]
    return mins
