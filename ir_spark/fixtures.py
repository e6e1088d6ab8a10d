"""Deterministic synthetic ``pages`` fixture (FIXTURES.md §1).

Generates Common-Crawl-style web pages with the authoritative shape from
BASELINE.json input_hint: (url:string, warc_ts:timestamp, html:binary,
text:string, lang:string).  Pure-Python generation (seeded, no external
data) so the oracle and Spark read the exact same rows; a helper
materializes the table as parquet for Spark jobs.

The body vocabulary is Zipf-distributed and salted with tokens that
exercise every TokenFilter rule (acronyms, dashes, number-prefixed,
pure-number — reference TokenFilter.java:15-33, stats.md:57-65).
"""

from __future__ import annotations

import datetime as _dt
import random
from dataclasses import dataclass

from .text import extract_text

# tokens chosen to exercise T5-T8 edge cases
EDGE_TOKENS = [
    "u.s.a.", "i.b.m.", "mach-3", "re-entry", "ph.d.", "10degree",
    "1960s", "m=2", "x-15", "37th", "1,000,000", "a/c", "b47's",
    "90deg", "f-104", "sub-sonic", "12.5", "---", "n.a.c.a.",
]

_BASE_VOCAB = [
    "flow", "pressure", "boundary", "layer", "heat", "transfer", "shock",
    "wave", "supersonic", "hypersonic", "wing", "body", "velocity",
    "temperature", "mach", "number", "theory", "experimental", "result",
    "aircraft", "aeroelastic", "model", "speed", "solution", "equation",
    "surface", "effect", "problem", "method", "analysis", "gas",
    "turbulent", "laminar", "cylinder", "plate", "jet", "nozzle", "drag",
    "lift", "angle", "attack", "reynolds", "transonic", "buckling",
    "stress", "structure", "thermal", "conduction", "slab", "composite",
    "the", "of", "and", "to", "in", "for", "on", "with", "by", "at",
]


def make_vocab(n_terms: int = 2000, seed: int = 42) -> list[str]:
    rng = random.Random(seed)
    vocab = list(_BASE_VOCAB)
    letters = "abcdefghijklmnopqrstuvwxyz"
    while len(vocab) < n_terms:
        w = "".join(rng.choice(letters) for _ in range(rng.randint(3, 10)))
        vocab.append(w)
    return vocab


@dataclass
class Page:
    url: str
    warc_ts: _dt.datetime
    html: bytes
    text: str
    lang: str


def generate_pages(n_docs: int, seed: int = 42, vocab_size: int = 2000,
                   mean_len: int = 120) -> list[Page]:
    """Deterministic page corpus. ``text`` is derived from ``html`` via
    the frozen extraction spec so the per-url byte-identity invariant
    holds by construction and is asserted in tests."""
    rng = random.Random(seed)
    vocab = make_vocab(vocab_size, seed)
    # Zipf weights (alpha ~= 1.1)
    weights = [1.0 / (rank + 1) ** 1.1 for rank in range(len(vocab))]
    epoch = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

    pages: list[Page] = []
    for i in range(n_docs):
        n_tokens = max(5, int(rng.lognormvariate(0, 0.6) * mean_len))
        words = rng.choices(vocab, weights=weights, k=n_tokens)
        # salt ~5% of docs with edge-case tokens
        if rng.random() < 0.05:
            for _ in range(rng.randint(1, 4)):
                words.insert(rng.randrange(len(words) + 1), rng.choice(EDGE_TOKENS))
        title = " ".join(words[: min(6, len(words))])
        # multi-line body to exercise the per-line extraction path
        body_lines = []
        pos = 0
        while pos < len(words):
            take = rng.randint(8, 16)
            body_lines.append(" ".join(words[pos: pos + take]))
            pos += take
        body = "\n".join(f"<p>{ln}</p>" for ln in body_lines)
        html = (
            f"<html><title>{title}</title>\n<body>\n{body}\n</body></html>"
        ).encode("utf-8")
        lang = "en" if rng.random() < 0.95 else rng.choice(["es", "zh"])
        pages.append(
            Page(
                url=f"https://site{i % 1000}.example/page/{i:08d}",
                warc_ts=epoch + _dt.timedelta(seconds=i),
                html=html,
                text=extract_text(html),
                lang=lang,
            )
        )
    return pages


def pages_to_parquet(pages: list[Page], path: str) -> str:
    """Materialize the fixture as a single parquet file (Arrow writer —
    no Spark needed, keeps tests fast)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "url": pa.array([p.url for p in pages], pa.string()),
            "warc_ts": pa.array([p.warc_ts for p in pages], pa.timestamp("us", tz="UTC")),
            "html": pa.array([p.html for p in pages], pa.binary()),
            "text": pa.array([p.text for p in pages], pa.string()),
            "lang": pa.array([p.lang for p in pages], pa.string()),
        }
    )
    pq.write_table(table, path)
    return path


REFERENCE_QUERIES = [
    # the 20 reference queries verbatim (hw.queries.formatted:1-20)
    "what similarity laws must be obeyed when constructing aeroelastic models of heated high speed aircraft",
    "what are the structural and aeroelastic problems associated with flight of high speed aircraft",
    "what problems of heat conduction in composite slabs have been solved so far",
    "can a criterion be developed to show empirically the validity of flow solutions for chemically reacting gas mixtures based on the simplifying assumption of instantaneous local chemical equilibrium",
    "what chemical kinetic system is applicable to hypersonic aerodynamic problems",
    "what theoretical and experimental guides do we have as to turbulent couette flow behaviour",
    "is it possible to relate the available pressure distributions for an ogive forebody at zero angle of attack to the lower surface pressures of an equivalent ogive forebody at angle of attack",
    "what methods -dash exact or approximate -dash are presently available for predicting body pressures at angle of attack",
    "papers on internal /slip flow/ heat transfer studies",
    "are real-gas transport properties for air available over a wide range of enthalpies and densities",
    "is it possible to find an analytical,  similar solution of the strong blast wave problem in the newtonian approximation",
    "how can the aerodynamic performance of channel flow ground effect machines be calculated",
    "what is the basic mechanism of the transonic aileron buzz",
    "papers on shock-sound wave interaction",
    "material properties of photoelastic materials",
    "can the transverse potential flow about a body of revolution be calculated efficiently by an electronic computer",
    "can the three-dimensional problem of a transverse potential flow about a body of revolution be reduced to a two-dimensional problem",
    "are experimental pressure distributions on bodies of revolution at angle of attack available",
    "does there exist a good basic treatment of the dynamics of re-entry combining consideration of realistic effects with relative simplicity of results",
    "has anyone formally determined the influence of joule heating, produced by the induced current, in magnetohydrodynamic free convection flows under general conditions",
]

EDGE_QUERIES = [
    "the of and in",                      # all-stopword
    "zzqqxx unseen flibbertigibbet",      # unseen terms (skip path)
    "flow",                               # single term
    "u.s.a. mach-3 10degree re-entry",    # TokenFilter edge cases
]
