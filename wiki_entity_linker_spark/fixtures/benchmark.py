"""Deterministic synthetic linking benchmark (the wiki-fair analogue).

Articles are seeded sentences with entity surface forms planted at known
char offsets; gold labels record (article_id, span, entity_id) exactly like
the reference's ``labels`` arrays (benchmarks/*.benchmark.jsonl). The alias
dictionary includes ambiguous aliases (shared surface, different freq) and
an unlinkable distractor so precision is exercised.
"""

from __future__ import annotations

import random

import pandas as pd

_FILLER = ["the", "system", "reads", "data", "from", "storage", "and",
           "writes", "results", "into", "tables", "quickly"]

_ENTITIES = [
    # (entity_id, canonical surface, aliases)
    ("Q1", "alpha engine", ["alpha engine", "alphaengine"]),
    ("Q2", "beta store", ["beta store", "the beta store"]),
    ("Q3", "gamma index", ["gamma index"]),
    ("Q4", "delta cache", ["delta cache", "delta"]),
    ("Q5", "epsilon queue", ["epsilon queue"]),
    # ambiguous: "delta" also maps to Q6 with lower freq
    ("Q6", "delta river", ["delta river", "delta"]),
]


def generate_benchmark(n_articles: int = 60, seed: int = 42):
    rng = random.Random(f"{seed}-linkbench")
    articles, labels = [], []
    for aid in range(n_articles):
        parts: list[str] = []
        pos = 0
        spans: list[tuple[int, int, str]] = []
        for _ in range(rng.randint(3, 7)):
            n_fill = rng.randint(2, 6)
            for _ in range(n_fill):
                w = rng.choice(_FILLER)
                parts.append(w)
                pos += len(w) + 1
            eid, surface, _aliases = _ENTITIES[rng.randrange(len(_ENTITIES))]
            parts.append(surface)
            spans.append((pos, pos + len(surface), eid))
            pos += len(surface) + 1
        text = " ".join(parts)
        articles.append((aid, text))
        for s, e, eid in spans:
            assert text[s:e].lower() in [a for E in _ENTITIES for a in E[2]] + [
                E[1] for E in _ENTITIES
            ]
            labels.append((aid, s, e, eid))

    alias_rows = []
    for i, (eid, _surface, aliases) in enumerate(_ENTITIES):
        freq = 100 - i * 10  # Q4 ("delta") outranks Q6's "delta" alias
        for a in aliases:
            alias_rows.append((a, eid, freq))
    alias_rows.append(("storage", "Q99", 1))  # distractor: in text, not gold

    return {
        "articles": pd.DataFrame(articles, columns=["id", "text"]),
        "gold_labels": pd.DataFrame(
            labels, columns=["article_id", "start", "end", "entity_id"]
        ),
        "alias_dict": pd.DataFrame(
            alias_rows, columns=["alias", "entity_id", "freq"]
        ),
    }
