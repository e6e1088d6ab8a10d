"""Frozen text-processing spec ("the reference tokenizer", decision D1).

This module is the *executable specification* of the tokenize pipeline.
It is pure Python (zero Spark imports) and is the single source of truth
used by BOTH the distributed Arrow/pandas UDFs (ir_spark/functions/) and
the single-process oracle (ir_spark/oracle.py).  Parity between engine
and oracle is therefore by construction.

Semantics are derived from the reference implementation at
/root/reference (SURVEY.md §2.2, quirk decisions D1/D9):

- T1 HTML tag strip + T2 edge-punctuation strip  -> ``extract_text``
  (reference: pyindex/tokenizer.py:7-8,16-20).  This is the
  byte-identical-extraction-per-url invariant from BASELINE.json.
- identity lemmatization + explicit lower()      (D1; the reference's
  spaCy/CoreNLP lemmatizers are unavailable and non-deterministic).
- T8 TokenFilter re-tokenization rules           (reference:
  invertedindex/.../preprocess/TokenFilter.java:15-80).
- T5-T7 post-processing: number-token drop, non-word split,
  length>1 filter (reference: pyindex/tokenizer.py:11,23-36).
- T9 optional Porter stemming (clean-room implementation of the
  public Porter 1980 algorithm; reference: preprocess/Stemmer.java).
- T11/D9 stopword list: the reference Java 54-entry list
  (index/SPIMI.java:12-17) with its trailing-space bugs fixed
  ("by ", "on ", "that " -> "by", "on", "that"); "to" deliberately
  absent, matching reference behaviour (stats.md:55).
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Iterator

# --- compiled regexes (reference: pyindex/tokenizer.py:7-11) -----------------

HTML_TAGS = re.compile(r"</*\w+>", re.IGNORECASE)
PUNCT_START_END = re.compile(r"^\W+|\W+$")
PUNCT_ANYWHERE = re.compile(r"\W")
ONLY_NUMBERS = re.compile(r"^(\d\W*)+$")

# --- TokenFilter regexes (reference: preprocess/TokenFilter.java:15-33) ------

# token consists entirely of non-alphabet characters (incl. empty)
NON_ALPHABETS = re.compile(r"^[^a-zA-Z]*$")
# token starts with a number
STARTS_WITH_NUMBER = re.compile(r"^\d+(?:\W*\w*)*")
# acronym like u.s.a. — single char followed by a dot, 2-5 times
ACRONYMS = re.compile(r".*(?<![a-zA-Z0-9])([a-zA-Z]\.){2,5}.*")
# meaningful dashes: word-digits anywhere, or 1-2 leading letters + dash
DASHES = re.compile(r".*(?:\w+-\d+).*|^[a-zA-Z]{1,2}-\w+")

# --- stopwords (D9; reference: index/SPIMI.java:12-17) -----------------------

STOPWORDS = frozenset({
    "a", "all", "an", "and", "any", "are", "as", "be", "been", "but", "by",
    "few", "for", "have", "he", "her", "here", "him", "his", "how", "i",
    "in", "is", "it", "its", "many", "me", "my", "none", "of", "on", "or",
    "our", "she", "some", "the", "their", "them", "there", "they", "that",
    "this", "us", "was", "what", "when", "where", "which", "who", "why",
    "will", "with", "you", "your",
})


@lru_cache(maxsize=1 << 17)
def _strip_edge(word: str) -> str:
    """Memoized per-word edge-punctuation strip (T10 applied to T2):
    word streams are Zipf-distributed, so almost every occurrence is a
    cache hit — the regex runs once per DISTINCT word."""
    return PUNCT_START_END.sub("", word)


def pre_process(line: str) -> str:
    """T1+T2: strip HTML tags, then strip edge punctuation per word.

    Byte-identical to reference pyindex/tokenizer.py:16-20 (``pre_process``).
    """
    words = HTML_TAGS.sub("", line).split(" ")
    return " ".join(_strip_edge(w) for w in words)


def extract_text(payload: bytes | str) -> str:
    """Extract clean text from an HTML payload, line-by-line.

    The per-row invariant from BASELINE.json input_hint:
    ``extract_text(html) == text`` byte-identically for every url.
    Mirrors the reference's readlines -> pre_process loop
    (pyindex/tokenizer.py:49-53) with the trailing newline consumed by
    the edge-punct strip, so lines are re-joined with '\\n'.
    """
    if isinstance(payload, (bytes, bytearray)):
        payload = payload.decode("utf-8")
    return "\n".join(pre_process(line) for line in payload.split("\n"))


def _filter_token(token: str) -> str:
    """TokenFilter.filterToken (TokenFilter.java:70-80)."""
    if NON_ALPHABETS.search(token):
        return ""
    if ACRONYMS.search(token):
        return token.replace(".", "")
    return token


def _split_token(token: str) -> list[str]:
    """TokenFilter.splitToken (TokenFilter.java:54-62)."""
    if STARTS_WITH_NUMBER.search(token) or not DASHES.search(token):
        return PUNCT_ANYWHERE.split(token)
    return [token]


def token_filter(token: str) -> list[str]:
    """Full TokenFilter pass (TokenFilter.java:37-46): filter, split,
    re-filter pieces, drop empties."""
    token = _filter_token(token)
    out = []
    for piece in _split_token(token):
        piece = _filter_token(piece)
        if piece:
            out.append(piece)
    return out


def post_process(token: str) -> Iterator[str]:
    """T2/T5/T6/T7 (reference pyindex/tokenizer.py:23-36): strip edge
    punctuation, drop pure-number tokens, split on non-word chars, keep
    pieces longer than one char."""
    token = PUNCT_START_END.sub("", token)
    token = ONLY_NUMBERS.sub("", token).strip()
    for piece in PUNCT_ANYWHERE.split(token):
        if len(piece) > 1 and piece != "PRON":
            yield piece


def tokenize(text: str, stem: bool = False) -> list[str]:
    """The canonical D1 tokenize pipeline.

    extract (T1/T2) -> split on single space -> lower() (identity lemma,
    D1) -> TokenFilter (T8) -> length/PRON filter (T7) -> optional
    Porter stem (T9).

    Ordering note (D1): TokenFilter is the *splitter* and its output is
    final, matching the Java pipeline (Indexer.java:104-111) — e.g.
    "mach-3" survives as one term per the dashes rule
    (TokenFilter.java:33).  The Python reference's post_process split on
    \\W (tokenizer.py:28) would undo that; of the two divergent
    reference pipelines the spec freezes the Java ordering, keeping
    post_process's length>1 / PRON / edge-punct filters.  Pure-number
    tokens (T5) are subsumed by TokenFilter's non-alphabets rule.

    Stopwords are NOT removed here: per decision D2 the doc_len
    statistic counts pre-stopword tokens (pyindex/inverted_index.py:
    30-36); stopword filtering happens at index-build time.
    """
    out: list[str] = []
    for line in text.split("\n"):
        line = pre_process(line)
        for word in line.split(" "):
            out.extend(_word_pieces(word.lower(), stem))
    return out


@lru_cache(maxsize=1 << 17)
def _word_pieces(lemma: str, stem: bool) -> tuple[str, ...]:
    """Memoized per-word tail of the tokenize pipeline (TokenFilter ->
    edge strip -> length/PRON -> optional stem) — a pure function of
    the lowercased word, so caching cannot change output, and Zipf
    word frequencies make nearly every occurrence a cache hit (the
    same T10 rationale as the reference's per-term memo)."""
    out = []
    for piece in token_filter(lemma):
        piece = PUNCT_START_END.sub("", piece)
        if len(piece) > 1 and piece != "PRON":
            out.append(porter_stem(piece) if stem else piece)
    return tuple(out)


def tokenize_simple(text: str) -> list[str]:
    """The SQL-expressible tokenizer used for the DuckDB oracle gates:
    lower -> split on runs of non-[a-z0-9] -> keep len>1.

    On clean lowercase prose (the driver's ``documents`` table) this is
    provably identical to :func:`tokenize` (see tests); on messy web
    text the full pipeline differs and is covered by pytest goldens.
    """
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if len(t) > 1]


# --- Porter stemmer (T9) ------------------------------------------------------
# Clean-room implementation of the public Porter (1980) algorithm, matching
# the behaviour of the reference's canonical Java port
# (preprocess/Stemmer.java:17-590).  Written from the published algorithm
# description (https://tartarus.org/martin/PorterStemmer/def.txt).

_VOWELS = "aeiou"


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences (the Porter 'm' measure)."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_consonant(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    """Ends consonant-vowel-consonant where final consonant != w,x,y."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace(word: str, suffix: str, repl: str, min_m: int) -> str | None:
    if not word.endswith(suffix):
        return None
    stem = word[: len(word) - len(suffix)]
    if _measure(stem) > min_m:
        return stem + repl
    return word


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
    ("izer", "ize"), ("bli", "ble"), ("alli", "al"), ("entli", "ent"),
    ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
    ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
    ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ("logi", "log"),
]

_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]

_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


@lru_cache(maxsize=1 << 16)
def porter_stem(word: str) -> str:
    """Porter (1980) stemming algorithm; memoized per process (T10,
    reference Indexer.java:26-39 uses a HashMap cache)."""
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    for suffix, repl in _STEP2:
        if w.endswith(suffix):
            r = _replace(w, suffix, repl, 0)
            if r is not None:
                w = r
            break

    # Step 3
    for suffix, repl in _STEP3:
        if w.endswith(suffix):
            r = _replace(w, suffix, repl, 0)
            if r is not None:
                w = r
            break

    # Step 4
    for suffix in _STEP4:
        if w.endswith(suffix):
            stem = w[: len(w) - len(suffix)]
            if _measure(stem) > 1:
                if suffix == "ion" and not stem.endswith(("s", "t")):
                    break
                w = stem
            break

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem

    # Step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]

    return w
