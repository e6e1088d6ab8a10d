"""Unit tests for the frozen tokenizer spec (SURVEY §5.2.1, T1-T12)."""

import re

import pytest

from ir_spark.text import (
    STOPWORDS,
    extract_text,
    porter_stem,
    post_process,
    pre_process,
    token_filter,
    tokenize,
    tokenize_simple,
)


class TestPreProcess:
    def test_html_strip(self):
        # reference pyindex/tokenizer.py:7,19 — strips <tag> and </tag>
        assert pre_process("<html><title>hello world</title>") == "hello world"
        assert pre_process("<p>the flow</p>") == "the flow"

    def test_edge_punct_strip_per_word(self):
        assert pre_process("hello, world.") == "hello world"
        assert pre_process("(flow)") == "flow"

    def test_inner_punct_kept(self):
        # pre_process only strips edges; inner dots/hyphens survive to T8
        assert pre_process("u.s.a. mach-3") == "u.s.a mach-3"

    def test_tag_regex_scope(self):
        # regex is </*\w+> — \w includes digits, so <5> IS stripped;
        # "< 5" (space after <) is not a tag and the < survives only as
        # edge punctuation, which PUNCT_START_END then removes
        assert pre_process("x <5> y") == "x  y"
        assert pre_process("a < 5") == "a  5"


class TestExtractText:
    def test_multiline(self):
        html = b"<html><title>a b</title>\n<body>\n<p>c d</p>\n</body></html>"
        assert extract_text(html) == "a b\n\nc d\n"

    def test_byte_identity_invariant(self):
        # the BASELINE.json input_hint invariant on the fixture corpus
        from ir_spark.fixtures import generate_pages

        for page in generate_pages(200, seed=7):
            assert extract_text(page.html) == page.text


class TestTokenFilter:
    # reference TokenFilter.java:15-80
    def test_non_alpha_dropped(self):
        assert token_filter("1234") == []
        assert token_filter("??") == []
        assert token_filter("") == []

    def test_acronym_dots_removed(self):
        assert token_filter("u.s.a") == ["usa"]
        assert token_filter("i.b.m") == ["ibm"]

    def test_phd_not_acronym(self):
        # ph.d. has a 2-char prefix before the dot — lookbehind rejects it
        assert token_filter("ph.d") == ["ph", "d"]

    def test_meaningful_dash_kept(self):
        assert token_filter("mach-3") == ["mach-3"]
        assert token_filter("x-15") == ["x-15"]
        assert token_filter("re-entry") == ["re-entry"]

    def test_long_word_dash_split(self):
        # dashes pattern requires word-digit or <=2 letter prefix
        assert token_filter("sub-sonic") == ["sub", "sonic"]

    def test_starts_with_number_split(self):
        assert token_filter("10degree") == ["10degree".split("-")[0]] or True
        # ^\d+... matches, split on \W: no \W present -> stays whole
        assert token_filter("10degree") == ["10degree"]
        assert token_filter("1,000m") == ["000m"]  # "1" piece is non-alpha -> dropped


class TestPostProcess:
    def test_len_filter(self):
        assert list(post_process("a")) == []
        assert list(post_process("ab")) == ["ab"]

    def test_pure_number_dropped(self):
        assert list(post_process("1960")) == []
        assert list(post_process("12.5")) == []

    def test_split_non_word(self):
        assert list(post_process("a/c")) == []  # pieces length 1
        assert list(post_process("slip/flow")) == ["slip", "flow"]

    def test_pron_dropped(self):
        assert list(post_process("PRON")) == []


class TestTokenize:
    def test_simple_sentence(self):
        assert tokenize("The Flow of heat") == ["the", "flow", "of", "heat"]

    def test_html_input(self):
        assert tokenize("<p>Heat transfer!</p>") == ["heat", "transfer"]

    def test_edge_cases_roundtrip(self):
        toks = tokenize("u.s.a. and MACH-3 at 1960 re-entry ph.d.")
        assert toks == ["usa", "and", "mach-3", "at", "re-entry", "ph"]

    def test_stopwords_not_removed_here(self):
        # D2: tokenize keeps stopwords; the build stage filters them
        assert "the" in tokenize("the flow")

    def test_stem_variant(self):
        assert tokenize("flows flowing", stem=True) == ["flow", "flow"]

    def test_simple_equals_full_on_clean_prose(self):
        # the oracle-gate precondition: on lowercase [a-z ]+ text the
        # simple SQL tokenizer == the full pipeline minus len-1 tokens
        text = "the quick brown fox jumps over lazy dogs near rivers"
        assert tokenize_simple(text) == [t for t in tokenize(text) if len(t) > 1]


class TestStopwords:
    def test_size_and_fixes(self):
        # D9: 54 entries, trailing-space bugs fixed, "to" absent
        assert len(STOPWORDS) == 54
        assert "by" in STOPWORDS and "on" in STOPWORDS and "that" in STOPWORDS
        assert "to" not in STOPWORDS


class TestPorterStemmer:
    # classic published Porter examples
    CASES = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
        "conformabli": "conform", "radicalli": "radic",
        "differentli": "differ", "vileli": "vile", "analogousli": "analog",
        "vietnamization": "vietnam", "predication": "predic",
        "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope",
        "callousness": "callous", "formaliti": "formal",
        "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler",
        "probate": "probat", "rate": "rate", "cease": "ceas",
        "controll": "control", "roll": "roll",
    }

    @pytest.mark.parametrize("word,expected", sorted(CASES.items()))
    def test_known_stems(self, word, expected):
        assert porter_stem(word) == expected

    def test_short_words_untouched(self):
        assert porter_stem("as") == "as"
        assert porter_stem("is") == "is"


class TestCJKBigrams:
    """CJK segmentation fallback (textstats.py::cjk_bigrams)."""

    def test_runs_bigrams_unigrams_counts(self, spark):
        from ir_spark.operators.textstats import cjk_bigrams

        df = spark.createDataFrame(
            [(1, "abc 中文分词 xy 中 test 文文文"), (2, "no cjk here")],
            "doc_id long, text string")
        got = sorted((r.doc_id, r.term, r.tf)
                     for r in cjk_bigrams(df).collect())
        assert got == [
            (1, "中", 1),          # isolated char -> unigram
            (1, "中文", 1), (1, "分词", 1), (1, "文分", 1),
            (1, "文文", 2),        # overlapping repeat counted
        ]

    def test_latin_never_leaks_into_terms(self, spark):
        from ir_spark.operators.textstats import cjk_bigrams

        df = spark.createDataFrame([(1, "latin中文mixed中run")],
                                   "doc_id long, text string")
        terms = {r.term for r in cjk_bigrams(df).collect()}
        assert terms == {"中文", "中"}
